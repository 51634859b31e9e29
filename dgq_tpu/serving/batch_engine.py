"""Slot-based batched engine execution for continuous batching.

The reference has no serving layer at all (SURVEY §2.3) — this is new,
TPU-first capability (BASELINE config 4: "continuous batching on one host").

Design: the INT8 KV cache holds B independent *slots*, each with its own
length.  Two jitted entry points with static shapes:

  * ``engine_prefill_slot``  — run one prompt through the stacked layers and
    write its INT8 K/V into slot ``slot_idx`` (a traced scalar — one compiled
    program serves every slot),
  * ``engine_decode_batched`` — one decode step for ALL active slots at
    their own positions (per-slot RoPE, per-slot masking, per-slot cache
    append), the Pallas decode-attention kernel handling per-slot lengths
    natively.

Inactive slots simply decode garbage that the scheduler ignores — branchless
static shapes, XLA-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import (
    EngineConfig,
    EngineParams,
    KVCache,
    _block,
    _requant,
)
from dgq_tpu.models.llama import rms_norm, rope_cos_sin, rotate_half


class BatchedKVCache(NamedTuple):
    k: jax.Array  # (L, B, Hkv, Dh, Smax) int8, K transposed
    v: jax.Array  # (L, B, Hkv, Smax, Dh) int8
    lengths: jax.Array  # (B,) int32 per-slot valid token counts


def init_batched_cache(cfg, batch: int, max_len: int, kv_bits: int = 8) -> BatchedKVCache:
    L = cfg.num_hidden_layers
    dh = cfg.head_dim if kv_bits == 8 else cfg.head_dim // 2  # int4: packed
    return BatchedKVCache(
        k=jnp.zeros((L, batch, cfg.num_key_value_heads, dh, max_len), jnp.int8),
        v=jnp.zeros((L, batch, cfg.num_key_value_heads, max_len, dh), jnp.int8),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


@partial(jax.jit, static_argnames=("ecfg",))
def engine_prefill_slot(
    ecfg: EngineConfig,
    params: EngineParams,
    slot_idx: jax.Array,  # () int32
    input_ids: jax.Array,  # (S,) int32 — padded prompt
    prompt_len: jax.Array,  # () int32 — true length (<= S)
    cache: BatchedKVCache,
) -> Tuple[jax.Array, BatchedKVCache]:
    """Prefill one slot from position 0; returns (last-token logits (V,),
    updated cache)."""
    cfg = ecfg.cfg
    s = input_ids.shape[0]
    x = params.embed_tokens[input_ids[None, :]].astype(jnp.float32)  # (1, S, D)

    pos_cos, pos_sin = rope_cos_sin(jnp.arange(s), cfg.head_dim, cfg.rope_theta, jnp.float32)
    smax = cache.k.shape[4]
    i = jnp.arange(s)[:, None]
    j = jnp.arange(smax)[None, :]
    # causal within the prompt; everything beyond the (fresh) slot is masked
    mask = jnp.where((j <= i) & (j < prompt_len), 0.0, jnp.finfo(jnp.float32).min)

    # slice this slot's cache out: (L, 1, Hkv, ...) and run the normal blocks
    k_slot = jax.lax.dynamic_slice_in_dim(cache.k, slot_idx, 1, axis=1)
    v_slot = jax.lax.dynamic_slice_in_dim(cache.v, slot_idx, 1, axis=1)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _block(
            ecfg, layer, xc, k_c, v_c, jnp.int32(0), pos_cos, pos_sin, mask,
            ecfg.bm_prefill,
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_slot, v_slot))

    new_cache = BatchedKVCache(
        k=jax.lax.dynamic_update_slice_in_dim(cache.k, new_k, slot_idx, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(cache.v, new_v, slot_idx, axis=1),
        lengths=cache.lengths.at[slot_idx].set(prompt_len),
    )

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    last = x[0, prompt_len - 1]
    logits = params.lm_head.astype(x.dtype) @ last
    return logits, new_cache


def _decode_block_batched(ecfg: EngineConfig, layer, x, k_cache, v_cache, lengths, pos_cos, pos_sin):
    """One decoder block for a single decode token per slot.

    x: (B, 1, D); caches (B, Hkv, ...); lengths (B,) — each slot's token
    appends at its own offset; attention masks per slot.
    """
    cfg = ecfg.cfg
    b = x.shape[0]
    dh = cfg.head_dim

    # launch fusion + projections shared with models/engine._block so the
    # serving path can never numerically diverge from the engine path
    from dgq_tpu.models.engine import _block_tail, _qkv_rows, _use_fused_rows

    fused = _use_fused_rows(ecfg, layer, b, 1)
    qkv = _qkv_rows(ecfg, layer, x, ecfg.bm_decode, fused)
    rep = cfg.num_attention_heads // cfg.num_key_value_heads
    hk = qkv.shape[-1] // dh // (rep + 2)
    h = rep * hk
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)

    q = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)  # (B, H, 1, Dh)
    k = k.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)

    # per-slot RoPE: cos/sin (B, 1, Dh) -> (B, 1, 1, Dh)
    cos = pos_cos[:, None, :, :]
    sin = pos_sin[:, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)

    # per-slot cache append (vmapped dynamic updates)
    def upd_k(kc, knew, ln):
        return jax.lax.dynamic_update_slice(kc, knew, (0, 0, ln))

    def upd_v(vc, vnew, ln):
        return jax.lax.dynamic_update_slice(vc, vnew, (0, ln, 0))

    if ecfg.kv_bits == 4:
        # INT4 KV (ops/kv4.py): packed append + unpacked XLA attention
        from dgq_tpu.ops.kv4 import KV4_RATIO, pack_nibbles, quantize_kv4, unpack_nibbles

        k4 = quantize_kv4(k, layer.k_scale)
        v4 = quantize_kv4(v, layer.v_scale)
        k_cache = jax.vmap(upd_k)(k_cache, pack_nibbles(k4, axis=-1).transpose(0, 1, 3, 2), lengths)
        v_cache = jax.vmap(upd_v)(v_cache, pack_nibbles(v4, axis=-1), lengths)
        from dgq_tpu.ops.attention import int8_decode_attention_xla

        ctx = int8_decode_attention_xla(
            q_s8[:, :, 0, :], unpack_nibbles(k_cache, axis=2),
            unpack_nibbles(v_cache, axis=-1), lengths + 1,
            layer.q_scale, layer.k_scale * KV4_RATIO,
            layer.v_scale * KV4_RATIO,
        ).reshape(b, 1, h * dh)
        x = _block_tail(ecfg, layer, x, ctx, ecfg.bm_decode, fused)
        return x, k_cache, v_cache

    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)

    k_cache = jax.vmap(upd_k)(k_cache, k_s8.transpose(0, 1, 3, 2), lengths)
    v_cache = jax.vmap(upd_v)(v_cache, v_s8, lengths)

    if ecfg.use_kernel:
        from dgq_tpu.ops.attention import auto_decode_chunk, int8_decode_attention

        smax = k_cache.shape[-1]
        chunk = ecfg.decode_attn_chunk
        if chunk < 0:  # AUTO (engine.py dispatch mirror)
            chunk = auto_decode_chunk(smax)
        if chunk and smax > chunk:
            from dgq_tpu.ops.attention import int8_decode_attention_chunked

            ctx = int8_decode_attention_chunked(
                q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
                layer.q_scale, layer.k_scale, layer.v_scale,
                chunk=chunk, interpret=ecfg.interpret, quant_pv=ecfg.quant_pv,
            ).reshape(b, 1, h * dh)
        else:
            ctx = int8_decode_attention(
                q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
                layer.q_scale, layer.k_scale, layer.v_scale,
                interpret=ecfg.interpret, quant_pv=ecfg.quant_pv,
            ).reshape(b, 1, h * dh)
    else:
        from dgq_tpu.ops.attention import int8_decode_attention_xla

        ctx = int8_decode_attention_xla(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            quant_pv=ecfg.quant_pv,
        ).reshape(b, 1, h * dh)

    x = _block_tail(ecfg, layer, x, ctx, ecfg.bm_decode, fused)
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg",))
def engine_decode_batched(
    ecfg: EngineConfig,
    params: EngineParams,
    tokens: jax.Array,  # (B,) int32 — current token per slot
    cache: BatchedKVCache,
    active: jax.Array = None,  # (B,) bool — only active slots advance
) -> Tuple[jax.Array, BatchedKVCache]:
    """One decode step for every slot -> (logits (B, V), updated cache).

    Inactive slots compute garbage at a fixed position (repeatedly
    overwritten, never advancing) — branchless static shapes.
    """
    cfg = ecfg.cfg
    b = tokens.shape[0]
    x = params.embed_tokens[tokens[:, None]].astype(jnp.float32)  # (B, 1, D)

    pos_cos, pos_sin = jax.vmap(
        lambda p: rope_cos_sin(p[None], cfg.head_dim, cfg.rope_theta, jnp.float32)
    )(cache.lengths)  # each (B, 1, Dh)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _decode_block_batched(
            ecfg, layer, xc, k_c, v_c, cache.lengths, pos_cos, pos_sin
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    logits = jnp.einsum("bd,vd->bv", x[:, 0], params.lm_head.astype(x.dtype))
    adv = jnp.ones_like(cache.lengths) if active is None else active.astype(jnp.int32)
    return logits, BatchedKVCache(k=new_k, v=new_v, lengths=cache.lengths + adv)


@partial(jax.jit, static_argnames=("ecfg", "steps"))
def engine_decode_multi(
    ecfg: EngineConfig,
    params: EngineParams,
    tokens: jax.Array,  # (B,) int32
    cache: BatchedKVCache,
    active: jax.Array,  # (B,) bool
    steps: int,
) -> Tuple[jax.Array, BatchedKVCache]:
    """``steps`` greedy decode steps for every active slot in ONE device
    program -> (tokens (steps, B), cache).

    Dispatch amortization for serving: a host->device round trip costs
    ~6.3 ms through the axon tunnel (per-launch probe) vs a ~14 ms 7B
    device step, so per-step dispatch taxes decode ~45%.  The scheduler
    calls this when every active request is greedy and has capacity;
    tokens emitted after a slot's EOS are discarded host-side (the slot's
    cache advances harmlessly — slot reuse re-prefills from position 0)."""

    def body(carry, _):
        t, c = carry
        logits, c = engine_decode_batched(ecfg, params, t, c, active)
        nt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nt = jnp.where(active, nt, t)
        return (nt, c), nt

    (_, cache), toks = jax.lax.scan(body, (tokens, cache), None, length=steps)
    return toks, cache


def _verify_block_batched(ecfg: EngineConfig, layer, x, k_cache, v_cache,
                          lengths, pos_cos, pos_sin):
    """One decoder block for a K+1-token speculative-verification window per
    slot.  x (B, K1, D); caches (B, Hkv, ...); lengths (B,) — each slot's
    window appends at its own offset; attention is causal within the window
    on top of the slot's full history.  Attention runs the XLA int8 path:
    the window is tiny (K1 ~ 5) and the step stays weight-feed-bound, which
    is exactly why verification is ~the price of one decode step."""
    cfg = ecfg.cfg
    b, k1, d = x.shape
    dh = cfg.head_dim

    # projections + tail shared with models/engine._block so verification
    # can never numerically diverge from the engine path (the exactness
    # contract in serving/speculative.py rests on this)
    from dgq_tpu.models.engine import _block_tail, _qkv_rows, _use_fused_rows

    fused = _use_fused_rows(ecfg, layer, b, k1)
    qkv = _qkv_rows(ecfg, layer, x, ecfg.bm_decode, fused)  # (B, K1, (h+2hk)*dh)
    rep = cfg.num_attention_heads // cfg.num_key_value_heads
    hk = qkv.shape[-1] // dh // (rep + 2)
    h = rep * hk
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
    q = q.reshape(b, k1, h, dh).transpose(0, 2, 1, 3)  # (B, H, K1, Dh)
    k = k.reshape(b, k1, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, k1, hk, dh).transpose(0, 2, 1, 3)

    cos = pos_cos[:, None, :, :]  # (B, 1, K1, Dh)
    sin = pos_sin[:, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)

    def upd_k(kc, knew, ln):
        return jax.lax.dynamic_update_slice(kc, knew, (0, 0, ln))

    def upd_v(vc, vnew, ln):
        return jax.lax.dynamic_update_slice(vc, vnew, (0, ln, 0))

    if ecfg.kv_bits == 4:  # INT4 KV: packed append, unpacked attention
        from dgq_tpu.ops.kv4 import KV4_RATIO, pack_nibbles, quantize_kv4, unpack_nibbles

        k4 = quantize_kv4(k, layer.k_scale)
        v4 = quantize_kv4(v, layer.v_scale)
        k_cache = jax.vmap(upd_k)(
            k_cache, pack_nibbles(k4, axis=-1).transpose(0, 1, 3, 2), lengths)
        v_cache = jax.vmap(upd_v)(v_cache, pack_nibbles(v4, axis=-1), lengths)
        kt_att = unpack_nibbles(k_cache, axis=2)
        v_att = unpack_nibbles(v_cache, axis=-1)
        k_eff = layer.k_scale * KV4_RATIO
        v_eff = layer.v_scale * KV4_RATIO
    else:
        k_s8 = _requant(k, layer.k_scale)
        v_s8 = _requant(v, layer.v_scale)
        k_cache = jax.vmap(upd_k)(k_cache, k_s8.transpose(0, 1, 3, 2), lengths)
        v_cache = jax.vmap(upd_v)(v_cache, v_s8, lengths)
        kt_att, v_att = k_cache, v_cache
        k_eff, v_eff = layer.k_scale, layer.v_scale

    smax = kt_att.shape[-1]
    qk = layer.q_scale * k_eff / (dh ** 0.5)
    qg = q_s8.reshape(b, hk, rep * k1, dh)
    s32 = jnp.einsum("bgrd,bgds->bgrs", qg, kt_att,
                     preferred_element_type=jnp.int32)
    scores = s32.astype(jnp.float32).reshape(b, hk, rep, k1, smax) * qk
    # query i of a slot attends its history plus window tokens 0..i
    kpos = jnp.arange(smax)[None, None, None, None, :]
    qpos = lengths[:, None, None, None, None] + jnp.arange(k1)[None, None, None, :, None]
    scores = jnp.where(kpos <= qpos, scores, jnp.finfo(jnp.float32).min)
    if ecfg.quant_pv and ecfg.kv_bits == 8:
        # verification is a DECODE-side window: mirror the decode paths'
        # INT8 p @ V (global-row-max codes, ops/attention._quantize_exp) so
        # accepted drafts reproduce the plain decode step's logits exactly
        # and speculation keeps its bitwise greedy-equality contract.
        # INT4 KV stays fp p @ V everywhere (quant_pv is kv8-scoped).
        from dgq_tpu.ops.attention import _quantize_exp

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        qe = _quantize_exp(e)
        acc = jnp.einsum("bgrqs,bgsd->bgrqd", qe, v_att,
                         preferred_element_type=jnp.int32)
        ctx = acc.astype(jnp.float32) * ((v_eff / 127.0) / denom)
    else:
        p = jax.nn.softmax(scores, axis=-1)
        vf = v_att.astype(jnp.float32) * v_eff
        ctx = jnp.einsum("bgrqs,bgsd->bgrqd", p, vf)  # (B, Hkv, rep, K1, Dh)
    ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(b, k1, h * dh)

    x = _block_tail(ecfg, layer, x, ctx, ecfg.bm_decode, fused)
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg", "steps", "spec_k", "max_ngram"))
def engine_spec_decode_multi(
    ecfg: EngineConfig,
    params: EngineParams,
    bufs: jax.Array,  # (B, L) int32 — per-slot prompt+emitted (incl. pending)
    buf_lens: jax.Array,  # (B,) int32
    tokens: jax.Array,  # (B,) int32 — pending token per slot (== bufs[b, len-1])
    cache: BatchedKVCache,
    active: jax.Array,  # (B,) bool
    steps: int,
    spec_k: int = 4,
    max_ngram: int = 3,
):
    """``steps`` speculative steps for every active slot in ONE device
    program: per-slot prompt-lookup drafting (vmapped device_ngram_propose),
    batched verification, in-graph acceptance and token-buffer append — the
    serving counterpart of speculative.spec_decode_scan.  One host round
    trip per ``steps`` instead of one per step.

    Returns (bufs, buf_lens, tokens, cache, outs (steps, B, K+1),
    n_outs (steps, B)).  Inactive slots never advance.  EOS/max-token
    overshoot is discarded host-side (like engine_decode_multi); the
    scheduler guarantees capacity for the worst case steps*(K+1)."""
    from dgq_tpu.serving.speculative import device_ngram_propose

    def body(carry, _):
        bufs_c, lens_c, toks_c, cache_c = carry
        drafts = jax.vmap(
            lambda bf, ln: device_ngram_propose(bf, ln, spec_k, max_ngram)
        )(bufs_c, lens_c)  # (B, K)
        ids = jnp.concatenate([toks_c[:, None], drafts], axis=1)  # (B, K+1)
        logits, cache2 = engine_verify_batched(ecfg, params, ids, cache_c)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, K+1)
        match = (drafts == greedy[:, :-1]).astype(jnp.int32)
        n_acc = jnp.cumprod(match, axis=1).sum(axis=1)  # (B,)
        corr = jnp.take_along_axis(greedy, n_acc[:, None], axis=1)[:, 0]  # (B,)
        pos = jnp.arange(spec_k + 1)[None, :]
        drafts_pad = jnp.concatenate(
            [drafts, jnp.zeros((drafts.shape[0], 1), jnp.int32)], axis=1)
        out = jnp.where(pos < n_acc[:, None], drafts_pad,
                        jnp.where(pos == n_acc[:, None], corr[:, None], 0))
        n_out = jnp.where(active, n_acc + 1, 0)

        bufs_new = jax.vmap(
            lambda bf, row, ln: jax.lax.dynamic_update_slice(bf, row, (ln,))
        )(bufs_c, out, lens_c)
        bufs_next = jnp.where(active[:, None], bufs_new, bufs_c)
        lens_next = lens_c + n_out
        toks_next = jnp.where(active, corr, toks_c)
        # cache: verification wrote the window K/V but left lengths alone;
        # advance active slots by the consumed prefix (pending + accepted)
        cache_next = cache2._replace(
            lengths=cache_c.lengths + jnp.where(active, 1 + n_acc, 0)
        )
        return (bufs_next, lens_next, toks_next, cache_next), (out, n_out)

    (bufs, buf_lens, tokens, cache), (outs, n_outs) = jax.lax.scan(
        body, (bufs, buf_lens, tokens, cache), None, length=steps
    )
    return bufs, buf_lens, tokens, cache, outs, n_outs


@jax.jit
def copy_prefix_into_slot(
    cache: BatchedKVCache,
    slot_idx: jax.Array,  # () int32
    k_template: jax.Array,  # (L, 1, Hkv, Dh, Smax) int8 — prefix K
    v_template: jax.Array,  # (L, 1, Hkv, Smax, Dh) int8
    prefix_len: jax.Array,  # () int32
) -> BatchedKVCache:
    """Prefix caching: install a precomputed shared-prefix KV (computed
    ONCE by ContinuousBatcher.register_prefix) into slot ``slot_idx`` and
    set its length, so admission only prefills the remainder tokens.  No
    reference counterpart (no serving layer, SURVEY §2.3); this is the
    standard shared-system-prompt optimization."""
    return BatchedKVCache(
        k=jax.lax.dynamic_update_slice_in_dim(cache.k, k_template, slot_idx, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(cache.v, v_template, slot_idx, axis=1),
        lengths=cache.lengths.at[slot_idx].set(prefix_len),
    )


@partial(jax.jit, static_argnames=("ecfg",))
def engine_verify_batched(
    ecfg: EngineConfig,
    params: EngineParams,
    tokens: jax.Array,  # (B, K1) int32 — [pending token, K drafts] per slot
    cache: BatchedKVCache,
) -> Tuple[jax.Array, BatchedKVCache]:
    """Speculative verification step for every slot -> (logits (B, K1, V),
    cache with the window's K/V written at each slot's offset but lengths
    UNCHANGED — the scheduler sets per-slot lengths after computing
    acceptance host-side; entries past a slot's length are masked by every
    attention path and overwritten by later appends, so rejected drafts
    leave no trace.  (serving counterpart of speculative.spec_verify_step;
    no reference counterpart — SURVEY §2.3.)"""
    cfg = ecfg.cfg
    b, k1 = tokens.shape
    x = params.embed_tokens[tokens].astype(jnp.float32)  # (B, K1, D)

    pos_cos, pos_sin = jax.vmap(
        lambda ln: rope_cos_sin(ln + jnp.arange(k1), cfg.head_dim,
                                cfg.rope_theta, jnp.float32)
    )(cache.lengths)  # each (B, K1, Dh)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _verify_block_batched(
            ecfg, layer, xc, k_c, v_c, cache.lengths, pos_cos, pos_sin
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    logits = jnp.einsum("bkd,vd->bkv", x, params.lm_head.astype(x.dtype))
    return logits, BatchedKVCache(k=new_k, v=new_v, lengths=cache.lengths)


@partial(jax.jit, static_argnames=("ecfg",))
def engine_prefill_chunk(
    ecfg: EngineConfig,
    params: EngineParams,
    slot_idx: jax.Array,  # () int32
    chunk_ids: jax.Array,  # (C,) int32 — one chunk of the (padded) prompt
    start: jax.Array,  # () int32 — cache position this chunk begins at
    valid: jax.Array,  # () int32 — real tokens in this chunk (<= C)
    cache: BatchedKVCache,
) -> Tuple[jax.Array, BatchedKVCache]:
    """Prefill ONE chunk of a prompt into slot ``slot_idx`` starting at
    cache position ``start`` (VERDICT r1 #8: chunked prefill bounds the
    head-of-line latency a long prompt imposes on active decode slots).

    Returns (last-valid-token logits (V,), cache with the slot's length set
    to start + valid).  Padding positions inside the chunk write garbage
    K/V beyond the slot length; subsequent chunks/decode overwrite them and
    attention masks them (keys j are visible only when j <= position)."""
    cfg = ecfg.cfg
    c = chunk_ids.shape[0]
    x = params.embed_tokens[chunk_ids[None, :]].astype(jnp.float32)  # (1, C, D)

    positions = start + jnp.arange(c)
    pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, jnp.float32)
    smax = cache.k.shape[4]
    i = positions[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)  # (C, Smax)

    k_slot = jax.lax.dynamic_slice_in_dim(cache.k, slot_idx, 1, axis=1)
    v_slot = jax.lax.dynamic_slice_in_dim(cache.v, slot_idx, 1, axis=1)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _block(
            ecfg, layer, xc, k_c, v_c, start, pos_cos, pos_sin, mask,
            ecfg.bm_prefill,
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_slot, v_slot))

    new_cache = BatchedKVCache(
        k=jax.lax.dynamic_update_slice_in_dim(cache.k, new_k, slot_idx, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(cache.v, new_v, slot_idx, axis=1),
        lengths=cache.lengths.at[slot_idx].set(start + valid),
    )

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    last = x[0, valid - 1]
    logits = params.lm_head.astype(x.dtype) @ last
    return logits, new_cache


@partial(jax.jit, static_argnames=("ecfg",))
def engine_prefill_batched(
    ecfg: EngineConfig,
    params: EngineParams,
    slot_idx: jax.Array,  # (A,) int32 — distinct free slots
    input_ids: jax.Array,  # (A, S) int32 — prompts padded to a common S
    prompt_lens: jax.Array,  # (A,) int32
    cache: BatchedKVCache,
) -> Tuple[jax.Array, BatchedKVCache]:
    """Prefill A prompts into A distinct slots in ONE device program
    (VERDICT r1 #8: batch>1 prefill).  The shared causal mask is exact for
    mixed lengths: real token i attends keys j <= i, all < its own
    prompt_len, so per-slot padding never leaks into real positions.

    Returns (per-slot last-token logits (A, V), updated cache)."""
    cfg = ecfg.cfg
    a, s = input_ids.shape
    x = params.embed_tokens[input_ids].astype(jnp.float32)  # (A, S, D)

    pos_cos, pos_sin = rope_cos_sin(jnp.arange(s), cfg.head_dim, cfg.rope_theta, jnp.float32)
    smax = cache.k.shape[4]
    i = jnp.arange(s)[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)  # (S, Smax)

    k_slots = jnp.take(cache.k, slot_idx, axis=1)  # (L, A, Hkv, Dh, Smax)
    v_slots = jnp.take(cache.v, slot_idx, axis=1)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _block(
            ecfg, layer, xc, k_c, v_c, jnp.int32(0), pos_cos, pos_sin, mask,
            ecfg.bm_prefill,
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_slots, v_slots))

    new_cache = BatchedKVCache(
        k=cache.k.at[:, slot_idx].set(new_k),
        v=cache.v.at[:, slot_idx].set(new_v),
        lengths=cache.lengths.at[slot_idx].set(prompt_lens),
    )

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    last = jnp.take_along_axis(x, (prompt_lens - 1)[:, None, None], axis=1)[:, 0]  # (A, D)
    logits = jnp.einsum("ad,vd->av", last, params.lm_head.astype(x.dtype))
    return logits, new_cache
