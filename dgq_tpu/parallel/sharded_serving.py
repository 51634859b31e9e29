"""Tensor-parallel continuous batching (BASELINE config 4: "tensor-sharded
W4A8, continuous batching on one host").

The serving entry points (serving/batch_engine.py) run unchanged inside
``shard_map`` over a ``(dp=1, tp)`` mesh: packed weights/scales shard
exactly as in parallel/sharded_engine.py (column-parallel qkv/gate-up,
row-parallel o/down with post-epilogue fp32 psum), the slot-based INT8 KV
cache shards over its kv-head axis, and every host-visible array (tokens,
lengths, logits, page-less slot bookkeeping) stays replicated — so
ContinuousBatcher's host logic is oblivious to the sharding: pass
``mesh=`` and the same scheduler drives a tensor-sharded engine.

Slots are NOT dp-sharded here: the scheduler addresses slots globally
(dynamic updates at a global slot index don't decompose over a sharded
batch axis).  Scale-out across hosts composes differently — run one
batcher per dp replica group behind a router; in-replica TP is this file.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from types import SimpleNamespace

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgq_tpu.models.engine import EngineConfig
from dgq_tpu.parallel.sharded_engine import engine_param_specs
from dgq_tpu.serving import batch_engine as be
from dgq_tpu.serving.batch_engine import BatchedKVCache

R = P()  # replicated


def batched_cache_specs() -> BatchedKVCache:
    # k (L, B, Hkv, Dh, Smax) / v (L, B, Hkv, Smax, Dh): kv heads over tp
    return BatchedKVCache(
        k=P(None, None, "tp", None, None),
        v=P(None, None, "tp", None, None),
        lengths=R,
    )


def shard_batched_cache(cache: BatchedKVCache, mesh: Mesh) -> BatchedKVCache:
    specs = batched_cache_specs()
    return BatchedKVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, specs.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, specs.v)),
        lengths=jax.device_put(cache.lengths, NamedSharding(mesh, specs.lengths)),
    )


def serving_fns(mesh: Mesh) -> SimpleNamespace:
    """shard_map-wrapped serving entry points, call-compatible with
    serving/batch_engine.py — ContinuousBatcher(mesh=...) swaps these in.

    Each wrapper is jitted (static ecfg) so the shard_map program is built
    once per (ecfg, shapes); inside, the engine runs with tp_axis='tp' and
    the o/down psums lower to ICI collectives."""
    if mesh.shape.get("dp", 1) != 1:
        raise ValueError(
            "serving_fns shards tensor-parallel only; build the mesh with "
            "dp=1 (scale batch by running one batcher per dp replica)"
        )
    cs = batched_cache_specs()

    def _local_ecfg(ecfg: EngineConfig) -> EngineConfig:
        return dataclasses.replace(ecfg, tp_axis="tp")

    def _shmap(local, in_specs, out_specs):
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_slot(ecfg, params, slot_idx, input_ids, prompt_len, cache):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, a, b, c, cc: be.engine_prefill_slot(el, p, a, b, c, cc),
            (engine_param_specs(params), R, R, R, cs), (R, cs),
        )
        return f(params, slot_idx, input_ids, prompt_len, cache)

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_chunk(ecfg, params, slot_idx, chunk_ids, start, valid, cache):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, a, b, c, d, cc: be.engine_prefill_chunk(el, p, a, b, c, d, cc),
            (engine_param_specs(params), R, R, R, R, cs), (R, cs),
        )
        return f(params, slot_idx, chunk_ids, start, valid, cache)

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_batched(ecfg, params, slot_idx, input_ids, prompt_lens, cache):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, a, b, c, cc: be.engine_prefill_batched(el, p, a, b, c, cc),
            (engine_param_specs(params), R, R, R, cs), (R, cs),
        )
        return f(params, slot_idx, input_ids, prompt_lens, cache)

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_decode_batched(ecfg, params, tokens, cache, active=None):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, t, cc, a: be.engine_decode_batched(el, p, t, cc, a),
            (engine_param_specs(params), R, cs, R), (R, cs),
        )
        if active is None:
            import jax.numpy as jnp

            active = jnp.ones(tokens.shape, bool)
        return f(params, tokens, cache, active)

    @partial(jax.jit, static_argnames=("ecfg", "steps"))
    def engine_decode_multi(ecfg, params, tokens, cache, active, steps):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, t, cc, a: be.engine_decode_multi(el, p, t, cc, a, steps),
            (engine_param_specs(params), R, cs, R), (R, cs),
        )
        return f(params, tokens, cache, active)

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_verify_batched(ecfg, params, tokens, cache):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, t, cc: be.engine_verify_batched(el, p, t, cc),
            (engine_param_specs(params), R, cs), (R, cs),
        )
        return f(params, tokens, cache)

    @partial(jax.jit, static_argnames=("ecfg", "steps", "spec_k", "max_ngram"))
    def engine_spec_decode_multi(ecfg, params, bufs, buf_lens, tokens, cache,
                                 active, steps, spec_k=4, max_ngram=3):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, bf, bl, t, cc, a: be.engine_spec_decode_multi(
                el, p, bf, bl, t, cc, a, steps, spec_k=spec_k, max_ngram=max_ngram
            ),
            (engine_param_specs(params), R, R, R, cs, R),
            (R, R, R, cs, R, R),
        )
        return f(params, bufs, buf_lens, tokens, cache, active)

    @jax.jit
    def copy_prefix_into_slot(cache, slot_idx, k_template, v_template, prefix_len):
        # templates were produced by the sharded prefill, so they carry the
        # same tp sharding as the cache: the copy is a local memcpy per shard
        f = _shmap(
            be.copy_prefix_into_slot,
            (cs, R, P(None, None, "tp", None, None), P(None, None, "tp", None, None), R),
            cs,
        )
        return f(cache, slot_idx, k_template, v_template, prefix_len)

    def init_batched_cache(cfg, batch, max_len, kv_bits=8):
        return shard_batched_cache(
            be.init_batched_cache(cfg, batch, max_len, kv_bits=kv_bits), mesh)

    return SimpleNamespace(
        engine_prefill_slot=engine_prefill_slot,
        engine_prefill_chunk=engine_prefill_chunk,
        engine_prefill_batched=engine_prefill_batched,
        engine_decode_batched=engine_decode_batched,
        engine_decode_multi=engine_decode_multi,
        engine_verify_batched=engine_verify_batched,
        engine_spec_decode_multi=engine_spec_decode_multi,
        copy_prefix_into_slot=copy_prefix_into_slot,
        init_batched_cache=init_batched_cache,
    )


def dense_serving_fns() -> SimpleNamespace:
    """The unsharded entry points under the same names (scheduler default)."""
    return SimpleNamespace(
        engine_prefill_slot=be.engine_prefill_slot,
        engine_prefill_chunk=be.engine_prefill_chunk,
        engine_prefill_batched=be.engine_prefill_batched,
        engine_decode_batched=be.engine_decode_batched,
        engine_decode_multi=be.engine_decode_multi,
        engine_verify_batched=be.engine_verify_batched,
        engine_spec_decode_multi=be.engine_spec_decode_multi,
        copy_prefix_into_slot=be.copy_prefix_into_slot,
        init_batched_cache=be.init_batched_cache,
    )


# -- paged pool under TP -------------------------------------------------------


def paged_cache_specs():
    from dgq_tpu.serving.paged import PagedKVCache

    # kt (L, P, Hkv, Dh, ps) / v (L, P, Hkv, ps, Dh): kv heads over tp;
    # the pool's page axis is replicated (pages are a memory concept, not a
    # compute one — every shard holds its heads of every page)
    return PagedKVCache(
        kt=P(None, None, "tp", None, None),
        v=P(None, None, "tp", None, None),
        lengths=R,
    )


def shard_paged_cache(cache, mesh: Mesh):
    from dgq_tpu.serving.paged import PagedKVCache

    specs = paged_cache_specs()
    return PagedKVCache(
        kt=jax.device_put(cache.kt, NamedSharding(mesh, specs.kt)),
        v=jax.device_put(cache.v, NamedSharding(mesh, specs.v)),
        lengths=jax.device_put(cache.lengths, NamedSharding(mesh, specs.lengths)),
    )


def paged_serving_fns(mesh: Mesh) -> SimpleNamespace:
    """shard_map-wrapped paged serving entry points (PagedBatcher(mesh=...)):
    the page-pool kernel runs on each shard's local kv heads; the page
    table/allocator stay host-side and replicated."""
    if mesh.shape.get("dp", 1) != 1:
        raise ValueError("paged_serving_fns is tensor-parallel only (dp=1)")
    from dgq_tpu.serving import paged as pg

    cs = paged_cache_specs()

    def _local_ecfg(ecfg: EngineConfig) -> EngineConfig:
        return dataclasses.replace(ecfg, tp_axis="tp")

    def _shmap(local, in_specs, out_specs):
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    @partial(jax.jit, static_argnames=("ecfg", "write_slot"))
    def paged_prefill(ecfg, params, slot_idx, input_ids, prompt_len, pages,
                      cache, write_slot=True):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, a, b, c, d, cc: pg.paged_prefill(
                el, p, a, b, c, d, cc, write_slot=write_slot),
            (engine_param_specs(params), R, R, R, R, cs), (R, cs),
        )
        return f(params, slot_idx, input_ids, prompt_len, pages, cache)

    @partial(jax.jit, static_argnames=("ecfg",))
    def paged_prefill_chunk(ecfg, params, slot_idx, chunk_ids, start, valid,
                            table_row, cache):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, a, b, c, d, e, cc: pg.paged_prefill_chunk(
                el, p, a, b, c, d, e, cc),
            (engine_param_specs(params), R, R, R, R, R, cs), (R, cs),
        )
        return f(params, slot_idx, chunk_ids, start, valid, table_row, cache)

    @partial(jax.jit, static_argnames=("ecfg",))
    def paged_decode_batched(ecfg, params, tokens, cache, table, active):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, t, cc, tb, a: pg.paged_decode_batched(el, p, t, cc, tb, a),
            (engine_param_specs(params), R, cs, R, R), (R, cs),
        )
        return f(params, tokens, cache, table, active)

    @partial(jax.jit, static_argnames=("ecfg", "steps"))
    def paged_decode_multi(ecfg, params, tokens, cache, table, active, steps):
        el = _local_ecfg(ecfg)
        f = _shmap(
            lambda p, t, cc, tb, a: pg.paged_decode_multi(el, p, t, cc, tb, a, steps),
            (engine_param_specs(params), R, cs, R, R), (R, cs),
        )
        return f(params, tokens, cache, table, active)

    @jax.jit
    def copy_page(cache, src, dst):
        f = _shmap(pg.copy_page, (cs, R, R), cs)
        return f(cache, src, dst)

    def init_paged_cache(cfg, batch, num_pages, page_size=128, kv_bits=8):
        return shard_paged_cache(
            pg.init_paged_cache(cfg, batch, num_pages, page_size, kv_bits=kv_bits),
            mesh,
        )

    return SimpleNamespace(
        paged_prefill=paged_prefill,
        paged_prefill_chunk=paged_prefill_chunk,
        paged_decode_batched=paged_decode_batched,
        paged_decode_multi=paged_decode_multi,
        copy_page=copy_page,
        init_paged_cache=init_paged_cache,
    )
