"""Pipeline-parallel continuous batching.

`pp_serving_fns(mesh)` is a drop-in device-fn namespace for
``ContinuousBatcher(fns=...)`` (serving/scheduler.py): the same host
scheduler drives a model whose layers are sharded over a ('pp', 'tp') mesh
(parallel/pipeline.py).  Decode runs the B slots as pp microbatches through
the GPipe tick schedule — in the steady state every stage decodes a
microbatch per tick, so pipeline decode throughput approaches the dense
single-stage rate while the model is P times bigger than one stage's
memory.  Prefill programs run a single sequence (one microbatch) straight
through the stages — correct, utilization 1/P; chunked prefill still bounds
head-of-line latency.

Intended placement (BASELINE config 5): 'tp' inside a host over ICI, 'pp'
across hosts over DCN — each inter-host transfer is one microbatch
activation per tick.  No reference counterpart (single GPU, SURVEY §2.3).

Usage:
    mesh = make_pp_mesh(pp=2, tp=2)
    eng_pp = pp_shard_engine_params(eng, mesh)
    b = ContinuousBatcher(ecfg, eng_pp, fns=pp_serving_fns(mesh), ...)

The FULL scheduler feature set is pipelined: chunked and batched prefill,
multi-step decode, prefix caching, speculative decoding in both modes
(host-loop verify, and the on-device speculation scan — drafting,
verification and acceptance inside one shard_map program, with only the
(B, K+1) greedy tokens psum-broadcast from the last stage per step).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgq_tpu.models.engine import EngineConfig, _block
from dgq_tpu.models.llama import rms_norm, rope_cos_sin
from dgq_tpu.parallel.pipeline import (
    pp_engine_param_specs,
    pp_layer_pipeline,
    pp_layer_pipeline_shared,
)
from dgq_tpu.serving import batch_engine as be
from dgq_tpu.serving.batch_engine import (
    BatchedKVCache,
    _decode_block_batched,
    _verify_block_batched,
)

R = P()


def pp_batched_cache_specs() -> BatchedKVCache:
    # (L, B, Hkv, ...): layers over 'pp', kv heads over 'tp'
    return BatchedKVCache(
        k=P("pp", None, "tp", None, None),
        v=P("pp", None, "tp", None, None),
        lengths=R,
    )


def pp_serving_fns(mesh: Mesh) -> SimpleNamespace:
    pp = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    cs = pp_batched_cache_specs()

    def _local_ecfg(ecfg: EngineConfig) -> EngineConfig:
        return dataclasses.replace(ecfg, tp_axis="tp" if tp > 1 else None)

    def _shmap(local, in_specs, out_specs):
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    def init_batched_cache(cfg, batch: int, max_len: int, kv_bits: int = 8) -> BatchedKVCache:
        c = be.init_batched_cache(cfg, batch, max_len, kv_bits=kv_bits)
        return BatchedKVCache(
            k=jax.device_put(c.k, NamedSharding(mesh, cs.k)),
            v=jax.device_put(c.v, NamedSharding(mesh, cs.v)),
            lengths=jax.device_put(c.lengths, NamedSharding(mesh, cs.lengths)),
        )

    # -- prefill (single sequence: one microbatch through the stages) -------

    def _prefill_local(ecfg, params_l, slot_idx, chunk_ids, start, valid,
                       k_c, v_c, lengths):
        """Shared body for whole-prompt and chunked prefill: run one
        (1, C, D) activation through the local stages and write slot
        ``slot_idx``'s K/V starting at cache position ``start``."""
        cfg = ecfg.cfg
        el = _local_ecfg(ecfg)
        c = chunk_ids.shape[0]
        x = params_l.embed_tokens[chunk_ids[None, :]].astype(jnp.float32)

        positions = start + jnp.arange(c)
        pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, jnp.float32)
        smax = k_c.shape[4]
        i = positions[:, None]
        j = jnp.arange(smax)[None, :]
        mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

        k_slot = lax.dynamic_slice_in_dim(k_c, slot_idx, 1, axis=1)
        v_slot = lax.dynamic_slice_in_dim(v_c, slot_idx, 1, axis=1)

        def layer_body(xc, layer, k_l, v_l, _ex):
            return _block(el, layer, xc, k_l, v_l, start, pos_cos, pos_sin,
                          mask, ecfg.bm_prefill)

        final, k_slot, v_slot = pp_layer_pipeline(
            pp, 1, layer_body, params_l.layers, x, k_slot, v_slot
        )
        k_c = lax.dynamic_update_slice_in_dim(k_c, k_slot, slot_idx, axis=1)
        v_c = lax.dynamic_update_slice_in_dim(v_c, v_slot, slot_idx, axis=1)
        lengths = lengths.at[slot_idx].set(start + valid)

        x = rms_norm(final, params_l.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
        last = x[0, valid - 1]
        logits = params_l.lm_head.astype(x.dtype) @ last
        return logits[None], k_c, v_c, lengths

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_slot(ecfg, params, slot_idx, input_ids, prompt_len, cache):
        f = _shmap(
            lambda p, si, ids, pl, kc, vc, ln: _prefill_local(
                ecfg, p, si, ids, jnp.int32(0), pl, kc, vc, ln
            ),
            (pp_engine_param_specs(params), R, R, R, cs.k, cs.v, R),
            (P("pp", None), cs.k, cs.v, R),
        )
        logits_all, k, v, lengths = f(
            params, slot_idx, input_ids, prompt_len, cache.k, cache.v, cache.lengths
        )
        return logits_all[-1], BatchedKVCache(k=k, v=v, lengths=lengths)

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_chunk(ecfg, params, slot_idx, chunk_ids, start, valid, cache):
        f = _shmap(
            lambda p, si, ids, st, va, kc, vc, ln: _prefill_local(
                ecfg, p, si, ids, st, va, kc, vc, ln
            ),
            (pp_engine_param_specs(params), R, R, R, R, cs.k, cs.v, R),
            (P("pp", None), cs.k, cs.v, R),
        )
        logits_all, k, v, lengths = f(
            params, slot_idx, chunk_ids, start, valid, cache.k, cache.v, cache.lengths
        )
        return logits_all[-1], BatchedKVCache(k=k, v=v, lengths=lengths)

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_batched(ecfg, params, slot_idx, input_ids, prompt_lens, cache):
        """A prompts into A distinct slots in one pipelined program; the A
        admission rows microbatch through the stages when A % pp == 0,
        else they travel as one microbatch."""
        cfg = ecfg.cfg
        el = _local_ecfg(ecfg)

        def local(p, si, ids, pl, kc, vc, ln):
            a, s = ids.shape
            M = pp if a % pp == 0 else 1
            x = p.embed_tokens[ids].astype(jnp.float32)  # (A, S, D)
            pos_cos, pos_sin = rope_cos_sin(
                jnp.arange(s), cfg.head_dim, cfg.rope_theta, jnp.float32
            )
            smax = kc.shape[4]
            i = jnp.arange(s)[:, None]
            j = jnp.arange(smax)[None, :]
            mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

            k_slots = jnp.take(kc, si, axis=1)  # (Ll, A, Hkv, Dh, Smax)
            v_slots = jnp.take(vc, si, axis=1)

            def layer_body(xc, layer, k_l, v_l, _ex):
                return _block(el, layer, xc, k_l, v_l, jnp.int32(0),
                              pos_cos, pos_sin, mask, ecfg.bm_prefill)

            final, k_slots, v_slots = pp_layer_pipeline(
                pp, M, layer_body, p.layers, x, k_slots, v_slots
            )
            kc = kc.at[:, si].set(k_slots)
            vc = vc.at[:, si].set(v_slots)
            ln = ln.at[si].set(pl)

            xo = rms_norm(final, p.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
            last = jnp.take_along_axis(xo, (pl - 1)[:, None, None], axis=1)[:, 0]
            logits = jnp.einsum("ad,vd->av", last, p.lm_head.astype(xo.dtype))
            return logits[None], kc, vc, ln

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, R, R, cs.k, cs.v, R),
            (P("pp", None, None), cs.k, cs.v, R),
        )
        logits_all, k, v, lengths = f(
            params, slot_idx, input_ids, prompt_lens, cache.k, cache.v, cache.lengths
        )
        return logits_all[-1], BatchedKVCache(k=k, v=v, lengths=lengths)

    # -- decode (B slots as microbatches through the pipeline) ---------------

    def _decode_core(ecfg, params_l, tokens, k_c, v_c, lengths):
        """One decode step inside shard_map -> (logits (B, V) [last rank],
        updated local caches).  Lengths are NOT advanced here."""
        cfg = ecfg.cfg
        el = _local_ecfg(ecfg)
        b = tokens.shape[0]
        M = pp if b % pp == 0 else 1
        x = params_l.embed_tokens[tokens[:, None]].astype(jnp.float32)  # (B, 1, D)

        pos_cos, pos_sin = jax.vmap(
            lambda p_: rope_cos_sin(p_[None], cfg.head_dim, cfg.rope_theta, jnp.float32)
        )(lengths)

        def layer_body(xc, layer, k_l, v_l, ex):
            ln_mb, cos_mb, sin_mb = ex
            return _decode_block_batched(el, layer, xc, k_l, v_l, ln_mb, cos_mb, sin_mb)

        final, k_c, v_c = pp_layer_pipeline(
            pp, M, layer_body, params_l.layers, x, k_c, v_c,
            extras=(lengths, pos_cos, pos_sin),
        )
        x = rms_norm(final, params_l.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
        logits = jnp.einsum("bd,vd->bv", x[:, 0], params_l.lm_head.astype(x.dtype))
        return logits, k_c, v_c

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_decode_batched(ecfg, params, tokens, cache, active=None):
        def local(p, t, kc, vc, ln, act):
            logits, kc, vc = _decode_core(ecfg, p, t, kc, vc, ln)
            return logits[None], kc, vc

        if active is None:
            active = jnp.ones_like(cache.lengths, bool)
        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, cs.k, cs.v, R, R),
            (P("pp", None, None), cs.k, cs.v),
        )
        logits_all, k, v = f(params, tokens, cache.k, cache.v, cache.lengths, active)
        lengths = cache.lengths + active.astype(jnp.int32)
        return logits_all[-1], BatchedKVCache(k=k, v=v, lengths=lengths)

    @partial(jax.jit, static_argnames=("ecfg", "steps"))
    def engine_decode_multi(ecfg, params, tokens, cache, active, steps: int):
        """``steps`` greedy decode steps in ONE device program.  The next
        token exists only on the last stage, so it is psum-broadcast along
        'pp' between steps (a (B,)-int32 all-reduce — negligible next to
        the activation ppermutes)."""

        def local(p, t0, kc, vc, ln0, act):
            rank = lax.axis_index("pp")
            is_last = (rank == pp - 1).astype(jnp.int32)

            def step(carry, _):
                t, kc, vc, ln = carry
                logits, kc, vc = _decode_core(ecfg, p, t, kc, vc, ln)
                nt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nt = lax.psum(nt * is_last, "pp")  # broadcast from last stage
                nt = jnp.where(act, nt, t)
                ln = ln + act.astype(jnp.int32)
                return (nt, kc, vc, ln), nt

            (_, kc, vc, ln), toks = lax.scan(
                step, (t0, kc, vc, ln0), None, length=steps
            )
            return toks, kc, vc, ln

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, cs.k, cs.v, R, R),
            (R, cs.k, cs.v, R),
        )
        toks, k, v, lengths = f(
            params, tokens, cache.k, cache.v, cache.lengths, active
        )
        return toks, BatchedKVCache(k=k, v=v, lengths=lengths)

    def _verify_core(ecfg, p, toks, kc, vc, ln):
        """Pipelined K+1-window verification inside shard_map ->
        (logits (B, K1, V) [meaningful on the last rank], caches).
        Lengths are not advanced (batch_engine contract)."""
        cfg = ecfg.cfg
        el = _local_ecfg(ecfg)
        b, k1 = toks.shape
        M = pp if b % pp == 0 else 1
        x = p.embed_tokens[toks].astype(jnp.float32)  # (B, K1, D)
        pos_cos, pos_sin = jax.vmap(
            lambda l0: rope_cos_sin(l0 + jnp.arange(k1), cfg.head_dim,
                                    cfg.rope_theta, jnp.float32)
        )(ln)

        def layer_body(xc, layer, k_l, v_l, ex):
            ln_mb, cos_mb, sin_mb = ex
            return _verify_block_batched(el, layer, xc, k_l, v_l,
                                         ln_mb, cos_mb, sin_mb)

        final, kc, vc = pp_layer_pipeline(
            pp, M, layer_body, p.layers, x, kc, vc,
            extras=(ln, pos_cos, pos_sin),
        )
        xo = rms_norm(final, p.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
        logits = jnp.einsum("bkd,vd->bkv", xo, p.lm_head.astype(xo.dtype))
        return logits, kc, vc

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_verify_batched(ecfg, params, tokens, cache):
        """Speculative verification through the pipeline: each slot's
        [pending, K drafts] window rides the same microbatch schedule as a
        decode step (verification is decode with K+1 query rows — the
        serving/batch_engine.py contract, lengths unchanged)."""

        def local(p, toks, kc, vc, ln):
            logits, kc, vc = _verify_core(ecfg, p, toks, kc, vc, ln)
            return logits[None], kc, vc

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, cs.k, cs.v, R),
            (P("pp", None, None, None), cs.k, cs.v),
        )
        logits_all, k, v = f(params, tokens, cache.k, cache.v, cache.lengths)
        return logits_all[-1], BatchedKVCache(k=k, v=v, lengths=cache.lengths)

    @partial(jax.jit, static_argnames=("ecfg", "steps", "spec_k", "max_ngram"))
    def engine_spec_decode_multi(ecfg, params, bufs, buf_lens, tokens, cache,
                                 active, steps: int, spec_k: int = 4,
                                 max_ngram: int = 3):
        """``steps`` on-device speculative steps through the pipeline —
        drafting, verification and acceptance all inside one shard_map
        program.  Only the (B, K+1) greedy argmaxes are psum-broadcast from
        the last stage between steps (never the (B, K+1, V) logits)."""
        from dgq_tpu.serving.speculative import device_ngram_propose

        def local(p, bufs0, lens0, toks0, kc0, vc0, cln0, act):
            rank = lax.axis_index("pp")
            is_last = (rank == pp - 1).astype(jnp.int32)

            def body(carry, _):
                bufs_c, lens_c, toks_c, kc, vc, cln = carry
                drafts = jax.vmap(
                    lambda bf, ln: device_ngram_propose(bf, ln, spec_k, max_ngram)
                )(bufs_c, lens_c)  # (B, K) — replicated compute
                ids = jnp.concatenate([toks_c[:, None], drafts], axis=1)
                logits, kc, vc = _verify_core(ecfg, p, ids, kc, vc, cln)
                greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                greedy = lax.psum(greedy * is_last, "pp")  # from last stage
                # acceptance (identical to serving/batch_engine.py)
                match = (drafts == greedy[:, :-1]).astype(jnp.int32)
                n_acc = jnp.cumprod(match, axis=1).sum(axis=1)
                corr = jnp.take_along_axis(greedy, n_acc[:, None], axis=1)[:, 0]
                pos = jnp.arange(spec_k + 1)[None, :]
                drafts_pad = jnp.concatenate(
                    [drafts, jnp.zeros((drafts.shape[0], 1), jnp.int32)], axis=1)
                out = jnp.where(pos < n_acc[:, None], drafts_pad,
                                jnp.where(pos == n_acc[:, None], corr[:, None], 0))
                n_out = jnp.where(act, n_acc + 1, 0)
                bufs_new = jax.vmap(
                    lambda bf, row, ln: lax.dynamic_update_slice(bf, row, (ln,))
                )(bufs_c, out, lens_c)
                bufs_next = jnp.where(act[:, None], bufs_new, bufs_c)
                lens_next = lens_c + n_out
                toks_next = jnp.where(act, corr, toks_c)
                cln = cln + jnp.where(act, 1 + n_acc, 0)
                return (bufs_next, lens_next, toks_next, kc, vc, cln), (out, n_out)

            (bufs_f, lens_f, toks_f, kc, vc, cln), (outs, n_outs) = lax.scan(
                body, (bufs0, lens0, toks0, kc0, vc0, cln0), None, length=steps
            )
            return bufs_f, lens_f, toks_f, kc, vc, cln, outs, n_outs

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, R, R, cs.k, cs.v, R, R),
            (R, R, R, cs.k, cs.v, R, R, R),
        )
        bufs, buf_lens, tokens, k, v, clens, outs, n_outs = f(
            params, bufs, buf_lens, tokens, cache.k, cache.v,
            cache.lengths, active,
        )
        return (bufs, buf_lens, tokens,
                BatchedKVCache(k=k, v=v, lengths=clens), outs, n_outs)

    # -- prefix caching ------------------------------------------------------

    # -- prefix caching ------------------------------------------------------

    @jax.jit
    def copy_prefix_into_slot(cache, slot_idx, k_template, v_template, prefix_len):
        # pure sharded-array surgery: GSPMD handles the pp/tp shardings
        return be.copy_prefix_into_slot(
            cache, slot_idx, k_template, v_template, prefix_len
        )

    return SimpleNamespace(
        init_batched_cache=init_batched_cache,
        engine_prefill_slot=engine_prefill_slot,
        engine_prefill_chunk=engine_prefill_chunk,
        engine_decode_batched=engine_decode_batched,
        engine_decode_multi=engine_decode_multi,
        engine_verify_batched=engine_verify_batched,
        engine_prefill_batched=engine_prefill_batched,
        engine_spec_decode_multi=engine_spec_decode_multi,
        copy_prefix_into_slot=copy_prefix_into_slot,
    )


def pp_paged_cache_specs():
    from dgq_tpu.serving.paged import PagedKVCache

    # kt (L, P, Hkv, Dh, ps) / v (L, P, Hkv, ps, Dh): layers over 'pp',
    # kv heads over 'tp'; the page axis is replicated (memory concept)
    return PagedKVCache(
        kt=P("pp", None, "tp", None, None),
        v=P("pp", None, "tp", None, None),
        lengths=R,
    )


def pp_paged_serving_fns(mesh: Mesh) -> SimpleNamespace:
    """Pipeline-parallel paged serving (PagedBatcher(fns=...)): the page
    POOL is layer-sharded over 'pp' — each stage holds its layers' pages —
    while the page table and allocator stay host-side exactly as in the
    dense PagedBatcher.  Decode microbatches the slots through the stages
    (pp_layer_pipeline_shared: the pool passes through every tick whole,
    bubble ticks neutralized by pinning their writes to the null page);
    prefill runs one sequence straight through the stages and scatters each
    stage's local scratch into its local pages.

    Usage:
        mesh = make_pp_mesh(pp=2, tp=2)
        b = PagedBatcher(ecfg, pp_shard_engine_params(eng, mesh),
                         fns=pp_paged_serving_fns(mesh), ...)
    """
    from dgq_tpu.serving import paged as pg
    from dgq_tpu.serving.paged import _paged_decode_block

    pp = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    cs = pp_paged_cache_specs()

    def _local_ecfg(ecfg: EngineConfig) -> EngineConfig:
        return dataclasses.replace(ecfg, tp_axis="tp" if tp > 1 else None)

    def _shmap(local, in_specs, out_specs):
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    def init_paged_cache(cfg, batch, num_pages, page_size=128, kv_bits=8):
        c = pg.init_paged_cache(cfg, batch, num_pages, page_size, kv_bits=kv_bits)
        return pg.PagedKVCache(
            kt=jax.device_put(c.kt, NamedSharding(mesh, cs.kt)),
            v=jax.device_put(c.v, NamedSharding(mesh, cs.v)),
            lengths=jax.device_put(c.lengths, NamedSharding(mesh, cs.lengths)),
        )

    def _pageify(k_scr, v_scr, npg, ps):
        # (Ll, 1, hk, dh, npg*ps) -> (Ll, npg, hk, dh, ps) and v analog
        ll, _, hk, dh, s = k_scr.shape
        pk = k_scr[:, 0].reshape(ll, hk, dh, npg, ps).transpose(0, 3, 1, 2, 4)
        pv = v_scr[:, 0].reshape(ll, hk, npg, ps, dh).transpose(0, 2, 1, 3, 4)
        return pk, pv

    @partial(jax.jit, static_argnames=("ecfg", "write_slot"))
    def paged_prefill(ecfg, params, slot_idx, input_ids, prompt_len, pages,
                      cache, write_slot=True):
        cfg = ecfg.cfg
        el = _local_ecfg(ecfg)

        def local(p, si, ids, plen, pgs, kt, v, ln):
            ll = p.layers.ln1_weight.shape[0]
            hk, dh, ps = kt.shape[2], kt.shape[3], kt.shape[4]
            s = ids.shape[0]
            npg = s // ps
            x = p.embed_tokens[ids[None, :]].astype(jnp.float32)
            pos_cos, pos_sin = rope_cos_sin(
                jnp.arange(s), cfg.head_dim, cfg.rope_theta, jnp.float32
            )
            i = jnp.arange(s)[:, None]
            j = jnp.arange(s)[None, :]
            mask = jnp.where((j <= i) & (j < plen), 0.0,
                             jnp.finfo(jnp.float32).min)
            k_scr = jnp.zeros((ll, 1, hk, dh, s), jnp.int8)
            v_scr = jnp.zeros((ll, 1, hk, s, dh), jnp.int8)

            def layer_body(xc, layer, k_l, v_l, _ex):
                return _block(el, layer, xc, k_l, v_l, jnp.int32(0),
                              pos_cos, pos_sin, mask, ecfg.bm_prefill)

            final, k_scr, v_scr = pp_layer_pipeline(
                pp, 1, layer_body, p.layers, x, k_scr, v_scr
            )
            pk, pv = _pageify(k_scr, v_scr, npg, ps)
            kt = kt.at[:, pgs].set(pk)
            v = v.at[:, pgs].set(pv)
            if write_slot:
                ln = ln.at[si].set(plen)
            xo = rms_norm(final, p.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
            logits = p.lm_head.astype(xo.dtype) @ xo[0, plen - 1]
            return logits[None], kt, v, ln

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, R, R, R, cs.kt, cs.v, R),
            (P("pp", None), cs.kt, cs.v, R),
        )
        logits_all, kt, v, lengths = f(
            params, slot_idx, input_ids, prompt_len, pages,
            cache.kt, cache.v, cache.lengths,
        )
        return logits_all[-1], pg.PagedKVCache(kt=kt, v=v, lengths=lengths)

    @partial(jax.jit, static_argnames=("ecfg",))
    def paged_prefill_chunk(ecfg, params, slot_idx, chunk_ids, start, valid,
                            table_row, cache):
        cfg = ecfg.cfg
        el = _local_ecfg(ecfg)

        def local(p, si, ids, st, va, tbr, kt, v, ln):
            ll = p.layers.ln1_weight.shape[0]
            hk, dh, ps = kt.shape[2], kt.shape[3], kt.shape[4]
            c = ids.shape[0]
            npg = tbr.shape[0]
            smax = npg * ps
            x = p.embed_tokens[ids[None, :]].astype(jnp.float32)
            positions = st + jnp.arange(c)
            pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim,
                                            cfg.rope_theta, jnp.float32)
            i = positions[:, None]
            j = jnp.arange(smax)[None, :]
            mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)
            k_dense = jnp.take(kt, tbr, axis=1).transpose(0, 2, 3, 1, 4).reshape(
                ll, 1, hk, dh, smax
            )
            v_dense = jnp.take(v, tbr, axis=1).transpose(0, 2, 1, 3, 4).reshape(
                ll, 1, hk, smax, dh
            )

            def layer_body(xc, layer, k_l, v_l, _ex):
                return _block(el, layer, xc, k_l, v_l, st, pos_cos, pos_sin,
                              mask, ecfg.bm_prefill)

            final, k_dense, v_dense = pp_layer_pipeline(
                pp, 1, layer_body, p.layers, x, k_dense, v_dense
            )
            pk, pv = _pageify(k_dense, v_dense, npg, ps)
            kt = kt.at[:, tbr].set(pk)
            v = v.at[:, tbr].set(pv)
            ln = ln.at[si].set(st + va)
            xo = rms_norm(final, p.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
            logits = p.lm_head.astype(xo.dtype) @ xo[0, va - 1]
            return logits[None], kt, v, ln

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, R, R, R, R, cs.kt, cs.v, R),
            (P("pp", None), cs.kt, cs.v, R),
        )
        logits_all, kt, v, lengths = f(
            params, slot_idx, chunk_ids, start, valid, table_row,
            cache.kt, cache.v, cache.lengths,
        )
        return logits_all[-1], pg.PagedKVCache(kt=kt, v=v, lengths=lengths)

    def _paged_decode_core(ecfg, p, toks, kt, v, ln, tb, act):
        """One paged decode step inside shard_map -> (logits [last rank],
        pool).  Lengths not advanced."""
        cfg = ecfg.cfg
        el = _local_ecfg(ecfg)
        b = toks.shape[0]
        M = pp if b % pp == 0 else 1
        x = p.embed_tokens[toks[:, None]].astype(jnp.float32)
        pos_cos, pos_sin = jax.vmap(
            lambda p_: rope_cos_sin(p_[None], cfg.head_dim, cfg.rope_theta,
                                    jnp.float32)
        )(ln)

        def layer_body(xc, layer, kt_l, v_l, ex, tick_valid):
            tb_mb, ln_mb, act_mb, cos_mb, sin_mb = ex
            return _paged_decode_block(
                el, layer, xc, kt_l, v_l, tb_mb, ln_mb,
                act_mb & tick_valid, cos_mb, sin_mb,
            )

        final, kt, v = pp_layer_pipeline_shared(
            pp, M, layer_body, p.layers, x, kt, v,
            extras=(tb, ln, act, pos_cos, pos_sin),
        )
        xo = rms_norm(final, p.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
        logits = jnp.einsum("bd,vd->bv", xo[:, 0], p.lm_head.astype(xo.dtype))
        return logits, kt, v

    @partial(jax.jit, static_argnames=("ecfg",))
    def paged_decode_batched(ecfg, params, tokens, cache, table, active):
        def local(p, t, kt, v, ln, tb, act):
            logits, kt, v = _paged_decode_core(ecfg, p, t, kt, v, ln, tb, act)
            return logits[None], kt, v

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, cs.kt, cs.v, R, R, R),
            (P("pp", None, None), cs.kt, cs.v),
        )
        logits_all, kt, v = f(params, tokens, cache.kt, cache.v,
                              cache.lengths, table, active)
        lengths = cache.lengths + active.astype(jnp.int32)
        return logits_all[-1], pg.PagedKVCache(kt=kt, v=v, lengths=lengths)

    @partial(jax.jit, static_argnames=("ecfg", "steps"))
    def paged_decode_multi(ecfg, params, tokens, cache, table, active, steps):
        def local(p, t0, kt0, v0, ln0, tb, act):
            rank = lax.axis_index("pp")
            is_last = (rank == pp - 1).astype(jnp.int32)

            def step(carry, _):
                t, kt, v, ln = carry
                logits, kt, v = _paged_decode_core(ecfg, p, t, kt, v, ln, tb, act)
                nt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nt = lax.psum(nt * is_last, "pp")
                nt = jnp.where(act, nt, t)
                ln = ln + act.astype(jnp.int32)
                return (nt, kt, v, ln), nt

            (_, kt, v, ln), toks = lax.scan(step, (t0, kt0, v0, ln0), None,
                                            length=steps)
            return toks, kt, v, ln

        f = _shmap(
            local,
            (pp_engine_param_specs(params), R, cs.kt, cs.v, R, R, R),
            (R, cs.kt, cs.v, R),
        )
        toks, kt, v, lengths = f(params, tokens, cache.kt, cache.v,
                                 cache.lengths, table, active)
        return toks, pg.PagedKVCache(kt=kt, v=v, lengths=lengths)

    @jax.jit
    def copy_page(cache, src, dst):
        # pure sharded-array surgery; GSPMD handles the pp/tp shardings
        return pg.copy_page(cache, src, dst)

    return SimpleNamespace(
        init_paged_cache=init_paged_cache,
        paged_prefill=paged_prefill,
        paged_prefill_chunk=paged_prefill_chunk,
        paged_decode_batched=paged_decode_batched,
        paged_decode_multi=paged_decode_multi,
        copy_page=copy_page,
    )
