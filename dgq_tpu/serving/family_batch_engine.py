"""Continuous batching for the BLOOM, MPT, Falcon, and Mixtral INT8 engines.

Completes the family-generic serving story: with opt_batch_engine.py and
the native LLaMA path, ALL SIX engine families are served by the same
ContinuousBatcher scheduler (serving/scheduler.py resolves device fns
through the ``fns`` namespace; no reference counterpart — the reference
has no serving layer at all, SURVEY §2.3).

Family specifics live here:
  * BLOOM — embedding LayerNorm, ALiBi (interleaved (h, 3, dh) fused qkv),
    gelu(approximate=True), reference dataflow bloom_a8w4-equivalent
    (models/bloom_engine.py);
  * MPT — plain embedding, ALiBi (concatenated [q|k|v] fused qkv),
    gelu(approximate=False);
  * Falcon — RoPE + MQA/GQA, single pre-LN feeding parallel attn/MLP
    branches with distinct input scales, parallel residual.

Each family provides: slot prefill, chunk prefill (chunked long prompts +
prefix-remainder admission), batched decode with per-slot lengths/ALiBi/
RoPE, multi-step decode, and prefix-template copy.  The scheduler's
sampling, recovery, chunking, and prefix logic are inherited unchanged.
"""

from __future__ import annotations

import math
from functools import partial
from types import SimpleNamespace
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import rope_cos_sin, rotate_half
from dgq_tpu.models.engine import _requant
from dgq_tpu.models.opt_engine import _layer_norm_q, _linear_s8, _linear_s8_int8out
from dgq_tpu.models.bloom import alibi_slopes
from dgq_tpu.models.bloom_engine import _bloom_block
from dgq_tpu.models.mpt_engine import _mpt_block
from dgq_tpu.models.falcon_engine import _falcon_block, _ln_fp


class FamilyBatchedKVCache(NamedTuple):
    k: jax.Array  # (L, B, Hkv, Dh, Smax) int8, K transposed
    v: jax.Array  # (L, B, Hkv, Smax, Dh) int8
    lengths: jax.Array  # (B,) int32


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _alibi_decode_ctx(ecfg, q_s8, k_cache, v_cache, lengths, layer, slopes):
    """Per-slot decode attention with ALiBi; q_s8 (B, H, 1, Dh)."""
    b, h, _, dh = q_s8.shape
    if ecfg.use_kernel:
        from dgq_tpu.ops.attention import int8_decode_attention

        return int8_decode_attention(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            interpret=ecfg.interpret, alibi_slopes=slopes,
        ).reshape(b, 1, h * dh)
    from dgq_tpu.ops.attention import int8_decode_attention_xla

    return int8_decode_attention_xla(
        q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
        layer.q_scale, layer.k_scale, layer.v_scale,
        alibi_slopes=slopes,
    ).reshape(b, 1, h * dh)


def _vmap_append(k_cache, v_cache, k_s8, v_s8, lengths):
    """Per-slot K/V append at each slot's own offset."""

    def upd_k(kc, knew, ln):
        return jax.lax.dynamic_update_slice(kc, knew, (0, 0, ln))

    def upd_v(vc, vnew, ln):
        return jax.lax.dynamic_update_slice(vc, vnew, (0, ln, 0))

    k_cache = jax.vmap(upd_k)(k_cache, k_s8.transpose(0, 1, 3, 2), lengths)
    v_cache = jax.vmap(upd_v)(v_cache, v_s8, lengths)
    return k_cache, v_cache


# -- generic slot machinery -----------------------------------------------------
#
# adapter contract (a SimpleNamespace):
#   hk_dh(cfg) -> (Hkv, Dh) for the cache layout
#   embed_prefill(ecfg, params, ids (1, S), positions (S,)) -> x (1, S, D)
#   block_prefill(ecfg, layer, x, k, v, start, positions, mask, bm) -> (x, k, v)
#   embed_decode(ecfg, params, tokens (B, 1), lengths (B,)) -> x (B, 1, D)
#   block_decode(ecfg, layer, x, k, v, lengths) -> (x, k, v)
#   final(params, x, eps) -> normed x


def _make_family_fns(adapter) -> SimpleNamespace:
    def init_batched_cache(cfg, batch, max_len, kv_bits: int = 8):
        if kv_bits != 8:
            raise ValueError(
                f"kv_bits={kv_bits}: INT4 KV is implemented for the LLaMA "
                "engine only (serving/batch_engine.py); this family serves "
                "the INT8 cache")
        L = cfg.num_hidden_layers
        hk, dh = adapter.hk_dh(cfg)
        return FamilyBatchedKVCache(
            k=jnp.zeros((L, batch, hk, dh, max_len), jnp.int8),
            v=jnp.zeros((L, batch, hk, max_len, dh), jnp.int8),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    def _prefill_common(ecfg, params, slot_idx, ids, positions, mask, new_len, valid):
        cfg = ecfg.cfg

        def scan_body(xc, layer_and_cache):
            layer, k_c, v_c = layer_and_cache
            xc, k_c, v_c = adapter.block_prefill(
                ecfg, layer, xc, k_c, v_c, positions[0], positions, mask,
                ecfg.bm_prefill,
            )
            return xc, (k_c, v_c)

        return scan_body

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_slot(ecfg, params, slot_idx, input_ids, prompt_len, cache):
        cfg = ecfg.cfg
        s = input_ids.shape[0]
        positions = jnp.arange(s)
        x = adapter.embed_prefill(ecfg, params, input_ids[None, :], positions)
        smax = cache.k.shape[4]
        i = positions[:, None]
        j = jnp.arange(smax)[None, :]
        mask = jnp.where((j <= i) & (j < prompt_len), 0.0, jnp.finfo(jnp.float32).min)

        k_slot = jax.lax.dynamic_slice_in_dim(cache.k, slot_idx, 1, axis=1)
        v_slot = jax.lax.dynamic_slice_in_dim(cache.v, slot_idx, 1, axis=1)
        scan_body = _prefill_common(ecfg, params, slot_idx, input_ids, positions, mask, prompt_len, prompt_len)
        x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_slot, v_slot))

        new_cache = FamilyBatchedKVCache(
            k=jax.lax.dynamic_update_slice_in_dim(cache.k, new_k, slot_idx, axis=1),
            v=jax.lax.dynamic_update_slice_in_dim(cache.v, new_v, slot_idx, axis=1),
            lengths=cache.lengths.at[slot_idx].set(prompt_len),
        )
        x = adapter.final(params, x, cfg.layer_norm_eps)
        logits = params.lm_head.astype(x.dtype) @ x[0, prompt_len - 1]
        return logits, new_cache

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_prefill_chunk(ecfg, params, slot_idx, chunk_ids, start, valid, cache):
        cfg = ecfg.cfg
        c = chunk_ids.shape[0]
        positions = start + jnp.arange(c)
        x = adapter.embed_prefill(ecfg, params, chunk_ids[None, :], positions)
        smax = cache.k.shape[4]
        i = positions[:, None]
        j = jnp.arange(smax)[None, :]
        mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

        k_slot = jax.lax.dynamic_slice_in_dim(cache.k, slot_idx, 1, axis=1)
        v_slot = jax.lax.dynamic_slice_in_dim(cache.v, slot_idx, 1, axis=1)
        scan_body = _prefill_common(ecfg, params, slot_idx, chunk_ids, positions, mask, start + valid, valid)
        x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, k_slot, v_slot))

        new_cache = FamilyBatchedKVCache(
            k=jax.lax.dynamic_update_slice_in_dim(cache.k, new_k, slot_idx, axis=1),
            v=jax.lax.dynamic_update_slice_in_dim(cache.v, new_v, slot_idx, axis=1),
            lengths=cache.lengths.at[slot_idx].set(start + valid),
        )
        x = adapter.final(params, x, cfg.layer_norm_eps)
        logits = params.lm_head.astype(x.dtype) @ x[0, valid - 1]
        return logits, new_cache

    @partial(jax.jit, static_argnames=("ecfg",))
    def engine_decode_batched(ecfg, params, tokens, cache, active=None):
        cfg = ecfg.cfg
        x = adapter.embed_decode(ecfg, params, tokens[:, None], cache.lengths)

        def scan_body(xc, layer_and_cache):
            layer, k_c, v_c = layer_and_cache
            xc, k_c, v_c = adapter.block_decode(ecfg, layer, xc, k_c, v_c, cache.lengths)
            return xc, (k_c, v_c)

        x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))
        x = adapter.final(params, x, cfg.layer_norm_eps)
        logits = jnp.einsum("bd,vd->bv", x[:, 0], params.lm_head.astype(x.dtype))
        if active is None:
            active = jnp.ones(tokens.shape, bool)
        return logits, FamilyBatchedKVCache(
            k=new_k, v=new_v, lengths=cache.lengths + active.astype(jnp.int32)
        )

    @partial(jax.jit, static_argnames=("ecfg", "steps"))
    def engine_decode_multi(ecfg, params, tokens, cache, active, steps):
        def body(carry, _):
            t, c = carry
            logits, c = engine_decode_batched(ecfg, params, t, c, active)
            nt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nt = jnp.where(active, nt, t)
            return (nt, c), nt

        (_, cache), toks = jax.lax.scan(body, (tokens, cache), None, length=steps)
        return toks, cache

    @jax.jit
    def copy_prefix_into_slot(cache, slot_idx, k_template, v_template, prefix_len):
        return FamilyBatchedKVCache(
            k=jax.lax.dynamic_update_slice_in_dim(cache.k, k_template, slot_idx, axis=1),
            v=jax.lax.dynamic_update_slice_in_dim(cache.v, v_template, slot_idx, axis=1),
            lengths=cache.lengths.at[slot_idx].set(prefix_len),
        )

    return SimpleNamespace(
        engine_prefill_slot=engine_prefill_slot,
        engine_prefill_chunk=engine_prefill_chunk,
        engine_decode_batched=engine_decode_batched,
        engine_decode_multi=engine_decode_multi,
        copy_prefix_into_slot=copy_prefix_into_slot,
        init_batched_cache=init_batched_cache,
    )


# -- BLOOM ----------------------------------------------------------------------


def _bloom_decode_block_batched(ecfg, layer, x, k_cache, v_cache, lengths):
    """_bloom_block at s=1 with per-slot append/mask (bloom_engine.py:199)."""
    cfg = ecfg.cfg
    b = x.shape[0]
    h, dh = cfg.num_attention_heads, cfg.head_dim

    x_s8 = _layer_norm_q(x, layer.ln1_weight, layer.ln1_bias, cfg.layer_norm_eps)
    qkv_s8 = _linear_s8_int8out(
        layer.qkv_proj, x_s8, use_kernel=ecfg.use_kernel, bm=ecfg.bm_decode,
        interpret=ecfg.interpret,
    ).reshape(b, 1, h, 3, dh)
    q_s8 = qkv_s8[:, :, :, 0].transpose(0, 2, 1, 3)  # (B, H, 1, Dh)
    k_s8 = qkv_s8[:, :, :, 1].transpose(0, 2, 1, 3)
    v_s8 = qkv_s8[:, :, :, 2].transpose(0, 2, 1, 3)
    k_cache, v_cache = _vmap_append(k_cache, v_cache, k_s8, v_s8, lengths)

    ctx = _alibi_decode_ctx(ecfg, q_s8, k_cache, v_cache, lengths, layer,
                            alibi_slopes(h))

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.dense_input_scale), -127, 127).astype(jnp.int8)
    kw = dict(use_kernel=ecfg.use_kernel, bm=ecfg.bm_decode, interpret=ecfg.interpret)
    attn_out = _linear_s8(layer.dense, ctx_s8, **kw)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    x_s8 = _layer_norm_q(x, layer.ln2_weight, layer.ln2_bias, cfg.layer_norm_eps)
    h1 = jax.nn.gelu(_linear_s8(layer.fc1, x_s8, **kw), approximate=True)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -128, 127).astype(jnp.int8)
    out = _linear_s8(layer.fc2, h_s8, **kw)
    if ecfg.tp_axis is not None:
        out = jax.lax.psum(out, ecfg.tp_axis)
    return x + out.astype(x.dtype), k_cache, v_cache


def bloom_serving_fns() -> SimpleNamespace:
    def embed_prefill(ecfg, params, ids, positions):
        # embedding LayerNorm (bloom_engine_forward:253-256)
        tok = params.embed_tokens[ids].astype(jnp.float32)
        return _ln(tok, params.emb_ln_weight, params.emb_ln_bias,
                   ecfg.cfg.layer_norm_eps)

    def block_prefill(ecfg, layer, x, k_c, v_c, start, positions, mask, bm):
        smax = k_c.shape[-1]
        slopes = alibi_slopes(ecfg.cfg.num_attention_heads)
        alibi = slopes[:, None, None] * jnp.arange(smax, dtype=jnp.float32)[None, None, :]
        return _bloom_block(ecfg, layer, x, k_c, v_c, start, mask, alibi, bm)

    def embed_decode(ecfg, params, tokens, lengths):
        tok = params.embed_tokens[tokens].astype(jnp.float32)
        return _ln(tok, params.emb_ln_weight, params.emb_ln_bias,
                   ecfg.cfg.layer_norm_eps)

    def final(params, x, eps):
        return _ln(x.astype(jnp.float32), params.ln_f_weight, params.ln_f_bias, eps)

    return _make_family_fns(SimpleNamespace(
        hk_dh=lambda cfg: (cfg.num_attention_heads, cfg.head_dim),
        embed_prefill=embed_prefill,
        block_prefill=block_prefill,
        embed_decode=embed_decode,
        block_decode=_bloom_decode_block_batched,
        final=final,
    ))



# -- MPT ------------------------------------------------------------------------


def _mpt_decode_block_batched(ecfg, layer, x, k_cache, v_cache, lengths):
    """_mpt_block at s=1 with per-slot append/mask (mpt_engine.py:158)."""
    cfg = ecfg.cfg
    b = x.shape[0]
    h, dh = cfg.n_heads, cfg.head_dim

    x_s8 = _layer_norm_q(x, layer.ln1_weight, layer.ln1_bias, cfg.layer_norm_eps)
    qkv_s8 = _linear_s8_int8out(
        layer.qkv_proj, x_s8, use_kernel=ecfg.use_kernel, bm=ecfg.bm_decode,
        interpret=ecfg.interpret,
    )
    q_s8, k_s8, v_s8 = jnp.split(qkv_s8, 3, axis=-1)
    q_s8 = q_s8.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    k_s8 = k_s8.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    v_s8 = v_s8.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    k_cache, v_cache = _vmap_append(k_cache, v_cache, k_s8, v_s8, lengths)

    ctx = _alibi_decode_ctx(ecfg, q_s8, k_cache, v_cache, lengths, layer,
                            alibi_slopes(h))

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.out_input_scale), -127, 127).astype(jnp.int8)
    kw = dict(use_kernel=ecfg.use_kernel, bm=ecfg.bm_decode, interpret=ecfg.interpret)
    attn_out = _linear_s8(layer.out_proj, ctx_s8, **kw)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    x_s8 = _layer_norm_q(x, layer.ln2_weight, layer.ln2_bias, cfg.layer_norm_eps)
    h1 = jax.nn.gelu(_linear_s8(layer.up_proj, x_s8, **kw), approximate=False)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -127, 127).astype(jnp.int8)
    out = _linear_s8(layer.down_proj, h_s8, **kw)
    if ecfg.tp_axis is not None:
        out = jax.lax.psum(out, ecfg.tp_axis)
    return x + out.astype(x.dtype), k_cache, v_cache


def mpt_serving_fns() -> SimpleNamespace:
    def block_prefill(ecfg, layer, x, k_c, v_c, start, positions, mask, bm):
        smax = k_c.shape[-1]
        slopes = alibi_slopes(ecfg.cfg.n_heads)
        alibi = slopes[:, None, None] * jnp.arange(smax, dtype=jnp.float32)[None, None, :]
        return _mpt_block(ecfg, layer, x, k_c, v_c, start, mask, alibi, bm)

    def final(params, x, eps):
        return _ln(x.astype(jnp.float32), params.norm_f_weight, params.norm_f_bias, eps)

    return _make_family_fns(SimpleNamespace(
        hk_dh=lambda cfg: (cfg.n_heads, cfg.head_dim),
        embed_prefill=lambda ecfg, params, ids, pos: params.embed_tokens[ids].astype(jnp.float32),
        block_prefill=block_prefill,
        embed_decode=lambda ecfg, params, toks, lens: params.embed_tokens[toks].astype(jnp.float32),
        block_decode=_mpt_decode_block_batched,
        final=final,
    ))


# -- Falcon ---------------------------------------------------------------------


def _falcon_decode_block_batched(ecfg, layer, x, k_cache, v_cache, lengths):
    """_falcon_block at s=1 with per-slot RoPE/append/mask
    (falcon_engine.py:135)."""
    cfg = ecfg.cfg
    b = x.shape[0]
    h, hk, dh = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
    kw = dict(use_kernel=ecfg.use_kernel, bm=ecfg.bm_decode, interpret=ecfg.interpret)

    ln = _ln_fp(x, layer.ln_weight, layer.ln_bias, cfg.layer_norm_eps)
    x_attn_s8 = jnp.clip(jnp.round(ln / layer.attn_input_scale), -127, 127).astype(jnp.int8)
    x_fc1_s8 = jnp.clip(jnp.round(ln / layer.fc1_input_scale), -127, 127).astype(jnp.int8)

    qkv = _linear_s8(layer.qkv_proj, x_attn_s8, **kw)
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
    q = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)

    pos_cos, pos_sin = jax.vmap(
        lambda p: rope_cos_sin(p[None], dh, cfg.rope_theta, jnp.float32)
    )(lengths)  # (B, 1, Dh) each
    cos = pos_cos[:, None, :, :]
    sin = pos_sin[:, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)
    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)
    k_cache, v_cache = _vmap_append(k_cache, v_cache, k_s8, v_s8, lengths)

    if ecfg.use_kernel:
        from dgq_tpu.ops.attention import int8_decode_attention

        ctx = int8_decode_attention(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            interpret=ecfg.interpret,
        ).reshape(b, 1, h * dh)
    else:
        from dgq_tpu.ops.attention import int8_decode_attention_xla

        ctx = int8_decode_attention_xla(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
        ).reshape(b, 1, h * dh)

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.dense_input_scale), -127, 127).astype(jnp.int8)
    attn_out = _linear_s8(layer.dense, ctx_s8, **kw)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)

    h1 = jax.nn.gelu(_linear_s8(layer.fc1, x_fc1_s8, **kw), approximate=False)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -127, 127).astype(jnp.int8)
    mlp_out = _linear_s8(layer.fc2, h_s8, **kw)
    if ecfg.tp_axis is not None:
        mlp_out = jax.lax.psum(mlp_out, ecfg.tp_axis)

    return x + attn_out.astype(x.dtype) + mlp_out.astype(x.dtype), k_cache, v_cache


def falcon_serving_fns() -> SimpleNamespace:
    def block_prefill(ecfg, layer, x, k_c, v_c, start, positions, mask, bm):
        pos_cos, pos_sin = rope_cos_sin(positions, ecfg.cfg.head_dim,
                                        ecfg.cfg.rope_theta, jnp.float32)
        return _falcon_block(ecfg, layer, x, k_c, v_c, start, mask,
                             pos_cos, pos_sin, bm)

    def final(params, x, eps):
        return _ln(x.astype(jnp.float32), params.ln_f_weight, params.ln_f_bias, eps)

    return _make_family_fns(SimpleNamespace(
        hk_dh=lambda cfg: (cfg.num_kv_heads, cfg.head_dim),
        embed_prefill=lambda ecfg, params, ids, pos: params.embed_tokens[ids].astype(jnp.float32),
        block_prefill=block_prefill,
        embed_decode=lambda ecfg, params, toks, lens: params.embed_tokens[toks].astype(jnp.float32),
        block_decode=_falcon_decode_block_batched,
        final=final,
    ))


# -- Mixtral (sparse MoE) --------------------------------------------------------


def _mixtral_decode_block_batched(ecfg, layer, x, k_cache, v_cache, lengths):
    """_mixtral_block at s=1 with per-slot RoPE/append (mixtral_engine.py:236).

    The attention half is the LLaMA dataflow (RMSNormQ, fused qkv, GQA);
    the MoE tail is position-independent so the engine's ``_moe_tail``
    (one requant point, fp router, dense-over-local-experts) is reused
    unchanged — including its ep_axis psum under expert parallelism."""
    from dgq_tpu.models.engine import _rms_norm_q
    from dgq_tpu.models.mixtral_engine import _moe_tail

    cfg = ecfg.cfg
    b = x.shape[0]
    dh = cfg.head_dim
    kw = dict(use_kernel=ecfg.use_kernel, bm=ecfg.bm_decode,
              interpret=ecfg.interpret, fp_scales=ecfg.fp_scales)

    x_s8 = _rms_norm_q(x, layer.ln1_weight, cfg.rms_norm_eps, layer.ln1_bias)
    qkv = _linear_s8(layer.qkv_proj, x_s8, **kw)
    rep = cfg.num_attention_heads // cfg.num_key_value_heads
    hk = qkv.shape[-1] // dh // (rep + 2)
    h = rep * hk
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
    q = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)

    pos_cos, pos_sin = jax.vmap(
        lambda p: rope_cos_sin(p[None], dh, cfg.rope_theta, jnp.float32)
    )(lengths)
    cos = pos_cos[:, None, :, :]
    sin = pos_sin[:, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)
    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)
    k_cache, v_cache = _vmap_append(k_cache, v_cache, k_s8, v_s8, lengths)

    if ecfg.use_kernel:
        from dgq_tpu.ops.attention import int8_decode_attention

        ctx = int8_decode_attention(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
            interpret=ecfg.interpret,
        ).reshape(b, 1, h * dh)
    else:
        from dgq_tpu.ops.attention import int8_decode_attention_xla

        ctx = int8_decode_attention_xla(
            q_s8[:, :, 0, :], k_cache, v_cache, lengths + 1,
            layer.q_scale, layer.k_scale, layer.v_scale,
        ).reshape(b, 1, h * dh)

    ctx_s8 = _requant(ctx, layer.out_input_scale, qmin=-127.0)
    attn_out = _linear_s8(layer.o_proj, ctx_s8, **kw)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    return _moe_tail(ecfg, layer, x, ecfg.bm_decode), k_cache, v_cache


def mixtral_serving_fns() -> SimpleNamespace:
    from dgq_tpu.models.llama import rms_norm
    from dgq_tpu.models.mixtral_engine import _mixtral_block

    def block_prefill(ecfg, layer, x, k_c, v_c, start, positions, mask, bm):
        pos_cos, pos_sin = rope_cos_sin(positions, ecfg.cfg.head_dim,
                                        ecfg.cfg.rope_theta, jnp.float32)
        return _mixtral_block(ecfg, layer, x, k_c, v_c, start,
                              pos_cos, pos_sin, mask, bm)

    def final(params, x, eps):
        return rms_norm(x.astype(jnp.float32), params.norm_weight, eps)

    return _make_family_fns(SimpleNamespace(
        hk_dh=lambda cfg: (cfg.num_key_value_heads, cfg.head_dim),
        embed_prefill=lambda ecfg, params, ids, pos: params.embed_tokens[ids].astype(jnp.float32),
        block_prefill=block_prefill,
        embed_decode=lambda ecfg, params, toks, lens: params.embed_tokens[toks].astype(jnp.float32),
        block_decode=_mixtral_decode_block_batched,
        final=final,
    ))


_FAMILY_FNS = {
    "bloom": bloom_serving_fns,
    "mpt": mpt_serving_fns,
    "falcon": falcon_serving_fns,
    "mixtral": mixtral_serving_fns,
}


def family_batcher(arch: str, ecfg, params, **kw):
    """Continuous batching for any non-LLaMA engine family.

    llama -> native path (ContinuousBatcher without fns);
    opt -> serving/opt_batch_engine.opt_batcher."""
    from dgq_tpu.serving.scheduler import ContinuousBatcher

    if arch == "opt":
        from dgq_tpu.serving.opt_batch_engine import opt_batcher

        return opt_batcher(ecfg, params, **kw)
    if arch == "llama":
        return ContinuousBatcher(ecfg, params, **kw)
    if arch not in _FAMILY_FNS:
        raise ValueError(f"unknown engine family {arch!r}")
    if kw.get("admit_batch", 1) > 1 or kw.get("spec_k", 0) > 0:
        raise ValueError(f"{arch} serving supports admit_batch=1, spec_k=0")
    return ContinuousBatcher(ecfg, params, fns=_FAMILY_FNS[arch](), **kw)


def batcher_from_checkpoint(path: str, *, use_kernel=None, **kw):
    """Serving startup from ANY family's save_engine checkpoint: the engine
    family comes from the manifest's ``arch`` and the right batcher is
    constructed (llama gets the native ContinuousBatcher with its full
    feature set; other families the fns-based scheduler)."""
    import json as _json

    from dgq_tpu.utils.checkpoint import load_engine_any

    eng, cfg = load_engine_any(path)
    with open(path + ".json") as f:
        arch = _json.load(f).get("arch", "llama")
    if use_kernel is None:
        use_kernel = jax.default_backend() not in ("cpu",)

    if arch == "llama":
        from dgq_tpu.models.engine import EngineConfig

        ecfg = EngineConfig(cfg=cfg, use_kernel=use_kernel)
    elif arch == "opt":
        from dgq_tpu.models.opt_engine import OPTEngineConfig

        ecfg = OPTEngineConfig(cfg=cfg, use_kernel=use_kernel)
    elif arch == "bloom":
        from dgq_tpu.models.bloom_engine import BloomEngineConfig

        ecfg = BloomEngineConfig(cfg=cfg, use_kernel=use_kernel)
    elif arch == "mpt":
        from dgq_tpu.models.mpt_engine import MPTEngineConfig

        ecfg = MPTEngineConfig(cfg=cfg, use_kernel=use_kernel)
    elif arch == "falcon":
        from dgq_tpu.models.falcon_engine import FalconEngineConfig

        ecfg = FalconEngineConfig(cfg=cfg, use_kernel=use_kernel)
    elif arch == "mixtral":
        from dgq_tpu.models.mixtral_engine import MixtralEngineConfig

        ecfg = MixtralEngineConfig(cfg=cfg, use_kernel=use_kernel)
    else:
        raise ValueError(f"unknown engine family {arch!r} in {path}.json")
    return arch, family_batcher(arch, ecfg, eng, **kw)
