"""Slot-based batched execution for the OPT INT8 engine.

Family-generic continuous batching: ContinuousBatcher's scheduler is
model-agnostic — all model specifics live in the device-fn namespace it
resolves through ``_fn`` (serving/scheduler.py).  This module provides the
OPT namespace (``opt_serving_fns``): learned positional embeddings (+2
offset, reference: HF OPTLearnedPositionalEmbedding), LayerNormQ blocks,
no RoPE, MHA (no GQA), INT8-out fused qkv so q.k^T runs int8 x int8 with
the 1/sqrt(dh) absorbed into q's scale (reference: opt_a8w4.py:60-61).

Usage:
    from dgq_tpu.serving.opt_batch_engine import opt_batcher
    b = opt_batcher(ecfg, params, num_slots=8, max_len=512)
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.opt_engine import (
    OPTEngineConfig,
    OPTEngineParams,
    _layer_norm_q,
    _linear_s8,
    _linear_s8_int8out,
    _opt_block,
)


class OPTBatchedKVCache(NamedTuple):
    k: jax.Array  # (L, B, H, Dh, Smax) int8, K transposed
    v: jax.Array  # (L, B, H, Smax, Dh) int8
    lengths: jax.Array  # (B,) int32


def init_opt_batched_cache(cfg, batch: int, max_len: int,
                           kv_bits: int = 8) -> OPTBatchedKVCache:
    if kv_bits != 8:
        raise ValueError(
            f"kv_bits={kv_bits}: INT4 KV is implemented for the LLaMA engine "
            "only (serving/batch_engine.py); OPT serves the INT8 cache")
    L = cfg.num_hidden_layers
    return OPTBatchedKVCache(
        k=jnp.zeros((L, batch, cfg.num_attention_heads, cfg.head_dim, max_len), jnp.int8),
        v=jnp.zeros((L, batch, cfg.num_attention_heads, max_len, cfg.head_dim), jnp.int8),
        lengths=jnp.zeros((batch,), jnp.int32),
    )


def _final_ln(params: OPTEngineParams, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * params.final_ln_weight + params.final_ln_bias


@partial(jax.jit, static_argnames=("ecfg",))
def opt_prefill_slot(
    ecfg: OPTEngineConfig,
    params: OPTEngineParams,
    slot_idx: jax.Array,
    input_ids: jax.Array,  # (S,) padded prompt
    prompt_len: jax.Array,
    cache: OPTBatchedKVCache,
) -> Tuple[jax.Array, OPTBatchedKVCache]:
    cfg = ecfg.cfg
    s = input_ids.shape[0]
    tok = params.embed_tokens[input_ids[None, :]]
    pos = params.embed_positions[jnp.arange(s) + 2]
    x = (tok + pos[None, :, :]).astype(jnp.float32)

    smax = cache.k.shape[4]
    i = jnp.arange(s)[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where((j <= i) & (j < prompt_len), 0.0, jnp.finfo(jnp.float32).min)

    k_slot = jax.lax.dynamic_slice_in_dim(cache.k, slot_idx, 1, axis=1)
    v_slot = jax.lax.dynamic_slice_in_dim(cache.v, slot_idx, 1, axis=1)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _opt_block(
            ecfg, layer, xc, k_c, v_c, jnp.int32(0), mask, ecfg.bm_prefill
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_slot, v_slot))

    new_cache = OPTBatchedKVCache(
        k=jax.lax.dynamic_update_slice_in_dim(cache.k, new_k, slot_idx, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(cache.v, new_v, slot_idx, axis=1),
        lengths=cache.lengths.at[slot_idx].set(prompt_len),
    )
    x = _final_ln(params, x, cfg.layer_norm_eps)
    last = x[0, prompt_len - 1]
    logits = params.lm_head.astype(x.dtype) @ last
    return logits, new_cache


@partial(jax.jit, static_argnames=("ecfg",))
def opt_prefill_chunk(
    ecfg: OPTEngineConfig,
    params: OPTEngineParams,
    slot_idx: jax.Array,
    chunk_ids: jax.Array,  # (C,)
    start: jax.Array,
    valid: jax.Array,
    cache: OPTBatchedKVCache,
) -> Tuple[jax.Array, OPTBatchedKVCache]:
    """One chunk at cache position ``start`` (chunked prefill + prefix
    remainder admission for OPT)."""
    cfg = ecfg.cfg
    c = chunk_ids.shape[0]
    tok = params.embed_tokens[chunk_ids[None, :]]
    positions = start + jnp.arange(c)
    pos = params.embed_positions[positions + 2]
    x = (tok + pos[None, :, :]).astype(jnp.float32)

    smax = cache.k.shape[4]
    i = positions[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

    k_slot = jax.lax.dynamic_slice_in_dim(cache.k, slot_idx, 1, axis=1)
    v_slot = jax.lax.dynamic_slice_in_dim(cache.v, slot_idx, 1, axis=1)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _opt_block(
            ecfg, layer, xc, k_c, v_c, start, mask, ecfg.bm_prefill
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_slot, v_slot))

    new_cache = OPTBatchedKVCache(
        k=jax.lax.dynamic_update_slice_in_dim(cache.k, new_k, slot_idx, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(cache.v, new_v, slot_idx, axis=1),
        lengths=cache.lengths.at[slot_idx].set(start + valid),
    )
    x = _final_ln(params, x, cfg.layer_norm_eps)
    last = x[0, valid - 1]
    logits = params.lm_head.astype(x.dtype) @ last
    return logits, new_cache


def _opt_decode_block_batched(ecfg, layer, x, k_cache, v_cache, lengths):
    """One OPT block for one decode token per slot (per-slot append/mask)."""
    cfg = ecfg.cfg
    b = x.shape[0]
    dh = cfg.head_dim

    x_s8 = _layer_norm_q(x, layer.ln1_weight, layer.ln1_bias, cfg.layer_norm_eps)
    kw = dict(use_kernel=ecfg.use_kernel, bm=ecfg.bm_decode, interpret=ecfg.interpret)
    qkv_s8 = _linear_s8_int8out(layer.qkv_proj, x_s8, **kw)
    q_s8, k_s8, v_s8 = jnp.split(qkv_s8, 3, axis=-1)
    h = q_s8.shape[-1] // dh
    q_s8 = q_s8.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    k_s8 = k_s8.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    v_s8 = v_s8.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)

    def upd_k(kc, knew, ln):
        return jax.lax.dynamic_update_slice(kc, knew, (0, 0, ln))

    def upd_v(vc, vnew, ln):
        return jax.lax.dynamic_update_slice(vc, vnew, (0, ln, 0))

    k_cache = jax.vmap(upd_k)(k_cache, k_s8.transpose(0, 1, 3, 2), lengths)
    v_cache = jax.vmap(upd_v)(v_cache, v_s8, lengths)

    if ecfg.use_kernel:
        from dgq_tpu.ops.attention import int8_decode_attention

        ctx = int8_decode_attention(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            apply_sqrt_dh=False, interpret=ecfg.interpret,
        ).reshape(b, 1, h * dh)
    else:
        from dgq_tpu.ops.attention import int8_decode_attention_xla

        ctx = int8_decode_attention_xla(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            apply_sqrt_dh=False,
        ).reshape(b, 1, h * dh)

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.out_input_scale), -127, 127).astype(jnp.int8)
    attn_out = _linear_s8(layer.out_proj, ctx_s8, use_kernel=ecfg.use_kernel,
                          bm=ecfg.bm_decode, interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    x_s8 = _layer_norm_q(x, layer.ln2_weight, layer.ln2_bias, cfg.layer_norm_eps)
    h1 = _linear_s8(layer.fc1, x_s8, use_kernel=ecfg.use_kernel,
                    bm=ecfg.bm_decode, interpret=ecfg.interpret)
    h1 = jax.nn.relu(h1)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -128, 127).astype(jnp.int8)
    out = _linear_s8(layer.fc2, h_s8, use_kernel=ecfg.use_kernel,
                     bm=ecfg.bm_decode, interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        out = jax.lax.psum(out, ecfg.tp_axis)
    x = x + out.astype(x.dtype)
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg",))
def opt_decode_batched(
    ecfg: OPTEngineConfig,
    params: OPTEngineParams,
    tokens: jax.Array,  # (B,)
    cache: OPTBatchedKVCache,
    active: jax.Array = None,  # (B,) bool
) -> Tuple[jax.Array, OPTBatchedKVCache]:
    cfg = ecfg.cfg
    tok = params.embed_tokens[tokens[:, None]]
    pos = params.embed_positions[cache.lengths + 2]  # (B, D) per-slot position
    x = (tok + pos[:, None, :]).astype(jnp.float32)

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _opt_decode_block_batched(
            ecfg, layer, xc, k_c, v_c, cache.lengths
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    x = _final_ln(params, x, cfg.layer_norm_eps)
    logits = jnp.einsum("bd,vd->bv", x[:, 0], params.lm_head.astype(x.dtype))
    adv = jnp.ones_like(cache.lengths) if active is None else active.astype(jnp.int32)
    return logits, OPTBatchedKVCache(k=new_k, v=new_v, lengths=cache.lengths + adv)


@partial(jax.jit, static_argnames=("ecfg", "steps"))
def opt_decode_multi(ecfg, params, tokens, cache, active, steps):
    def body(carry, _):
        t, c = carry
        logits, c = opt_decode_batched(ecfg, params, t, c, active)
        nt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nt = jnp.where(active, nt, t)
        return (nt, c), nt

    (_, cache), toks = jax.lax.scan(body, (tokens, cache), None, length=steps)
    return toks, cache


@jax.jit
def opt_copy_prefix_into_slot(cache, slot_idx, k_template, v_template, prefix_len):
    return OPTBatchedKVCache(
        k=jax.lax.dynamic_update_slice_in_dim(cache.k, k_template, slot_idx, axis=1),
        v=jax.lax.dynamic_update_slice_in_dim(cache.v, v_template, slot_idx, axis=1),
        lengths=cache.lengths.at[slot_idx].set(prefix_len),
    )


def opt_serving_fns() -> SimpleNamespace:
    """OPT device-fn namespace for ContinuousBatcher(fns=...).  Batched
    prefill and speculative multi aren't provided — keep admit_batch=1 and
    spec_k=0 (the scheduler never calls absent fns under those defaults)."""
    return SimpleNamespace(
        engine_prefill_slot=opt_prefill_slot,
        engine_prefill_chunk=opt_prefill_chunk,
        engine_decode_batched=opt_decode_batched,
        engine_decode_multi=opt_decode_multi,
        copy_prefix_into_slot=opt_copy_prefix_into_slot,
        init_batched_cache=init_opt_batched_cache,
    )


def opt_batcher(ecfg: OPTEngineConfig, params: OPTEngineParams, **kw):
    """Continuous batching over the OPT INT8 engine."""
    from dgq_tpu.serving.scheduler import ContinuousBatcher

    if kw.get("admit_batch", 1) > 1 or kw.get("spec_k", 0) > 0:
        raise ValueError("OPT serving supports admit_batch=1, spec_k=0")
    return ContinuousBatcher(ecfg, params, fns=opt_serving_fns(), **kw)
