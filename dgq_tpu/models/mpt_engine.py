"""Real-quant INT8-dataflow MPT engine.

The reference has only block-dispatch plumbing for MPT (modelutils.py:39-52
— no QuantLinear conversion recipe, no engine); dgq_tpu already calibrates
and fake-quants MPT (models/mpt.py), and this module completes the family
with a real INT8 engine, mirroring the BLOOM engine's structure with MPT's
architecture:

  LayerNormQ -> fused Wqkv INT8-out GEMM (concatenated [q|k|v] per-component
  alpha) -> INT8 KV cache (K transposed) -> INT8 q.k^T + ALiBi -> fp32
  softmax -> probs @ dequantized V -> requant -> out_proj -> LayerNormQ ->
  up_proj -> GELU(exact) -> requant -> down_proj.  Requant clips mirror the
  fake-quant static quantizer (symmetric +-127).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.bloom import alibi_slopes
from dgq_tpu.models.engine import EngineLinear, _linear_s8, f32_out_linear
from dgq_tpu.models.mpt import MPTConfig
from dgq_tpu.models.opt_engine import _layer_norm_q, _linear_s8_int8out
from dgq_tpu.quant.packing import PackedLinear


class MPTEngineLayer(NamedTuple):
    ln1_weight: jax.Array
    ln1_bias: jax.Array
    qkv_proj: EngineLinear  # int8 out; concatenated [q | k | v] channels
    out_proj: EngineLinear  # f32 out
    ln2_weight: jax.Array
    ln2_bias: jax.Array
    up_proj: EngineLinear  # f32 out
    down_proj: EngineLinear  # f32 out
    q_scale: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    out_input_scale: jax.Array
    fc2_input_scale: jax.Array


class MPTEngineParams(NamedTuple):
    embed_tokens: jax.Array
    layers: MPTEngineLayer
    norm_f_weight: jax.Array
    norm_f_bias: jax.Array
    lm_head: jax.Array


class MPTKVCache(NamedTuple):
    k: jax.Array  # (L, B, H, Dh, Smax) int8, K transposed
    v: jax.Array  # (L, B, H, Smax, Dh) int8
    length: jax.Array


def init_mpt_kv_cache(cfg: MPTConfig, batch: int, max_len: int) -> MPTKVCache:
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.head_dim
    return MPTKVCache(
        k=jnp.zeros((L, batch, H, Dh, max_len), jnp.int8),
        v=jnp.zeros((L, batch, H, max_len, Dh), jnp.int8),
        length=jnp.zeros((), jnp.int32),
    )


def _qkv_int8_out_concat(pl_: PackedLinear, input_scale, q_s, k_s, v_s, d: int) -> EngineLinear:
    """Fused Wqkv with per-component output scales for the CONCATENATED
    [q(d) | k(d) | v(d)] layout (MPT; BLOOM interleaves instead)."""
    assert pl_.w4w8 and pl_.span == 2 * pl_.groupsize, (
        "engine conversion needs w4w8 span-packed linears "
        "(quantize with --w4w8 and a groupsize, e.g. 128)"
    )
    per_channel_out = jnp.concatenate([
        jnp.full((d,), 1.0) * q_s, jnp.full((d,), 1.0) * k_s, jnp.full((d,), 1.0) * v_s,
    ]).astype(jnp.float32)
    alpha = input_scale.astype(jnp.float32) * pl_.wscales8.astype(jnp.float32) / per_channel_out
    bias = None
    if pl_.bias is not None:
        bias = pl_.bias.astype(jnp.float32) / per_channel_out
    return EngineLinear(
        qweight=pl_.qweight,
        wscales=jnp.repeat(pl_.wscales, 8, axis=0),
        wzeros=jnp.repeat(pl_.wzeros, 8, axis=0),
        alpha=alpha,
        bias=bias,
    )


def _ln_fold(p, scale):
    w = p["weight"].astype(jnp.float32) / scale
    b = p.get("bias")
    b = jnp.zeros_like(w) if b is None else b.astype(jnp.float32) / scale
    return w, b


def from_ptq_mpt(params, kv_scales, cfg: MPTConfig) -> MPTEngineParams:
    per_layer = []
    for li, layer in enumerate(params["layers"]):
        at = layer["attn"]
        kv = kv_scales[li]
        attn_input_scale = at["Wqkv"].amax.astype(jnp.float32) / 127.0
        out_input_scale = at["out_proj"].amax.astype(jnp.float32) / 127.0
        fc1_input_scale = layer["ffn"]["up_proj"].amax.astype(jnp.float32) / 127.0
        fc2_input_scale = layer["ffn"]["down_proj"].amax.astype(jnp.float32) / 127.0
        ln1_w, ln1_b = _ln_fold(layer["norm_1"], attn_input_scale)
        ln2_w, ln2_b = _ln_fold(layer["norm_2"], fc1_input_scale)
        per_layer.append(
            MPTEngineLayer(
                ln1_weight=ln1_w, ln1_bias=ln1_b,
                qkv_proj=_qkv_int8_out_concat(
                    at["Wqkv"], attn_input_scale,
                    kv.q_scale, kv.k_scale, kv.v_scale, cfg.d_model,
                ),
                out_proj=f32_out_linear(at["out_proj"], out_input_scale),
                ln2_weight=ln2_w, ln2_bias=ln2_b,
                up_proj=f32_out_linear(layer["ffn"]["up_proj"], fc1_input_scale),
                down_proj=f32_out_linear(layer["ffn"]["down_proj"], fc2_input_scale),
                q_scale=kv.q_scale.astype(jnp.float32),
                k_scale=kv.k_scale.astype(jnp.float32),
                v_scale=kv.v_scale.astype(jnp.float32),
                out_input_scale=out_input_scale,
                fc2_input_scale=fc2_input_scale,
            )
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    nf = params["norm_f"]
    nf_b = nf.get("bias")
    return MPTEngineParams(
        embed_tokens=params["embed_tokens"],
        layers=stacked,
        norm_f_weight=nf["weight"].astype(jnp.float32),
        norm_f_bias=(jnp.zeros((cfg.d_model,), jnp.float32)
                     if nf_b is None else nf_b.astype(jnp.float32)),
        lm_head=params["lm_head"]["weight"],
    )


@dataclasses.dataclass(frozen=True)
class MPTEngineConfig:
    cfg: MPTConfig
    use_kernel: bool = True
    interpret: bool = False
    bm_prefill: int = 256
    bm_decode: int = 128
    tp_axis: Optional[str] = None
    # KV-cache precision; only 8 is implemented for MPT (INT4 packed KV is
    # the LLaMA engine's knob, models.engine.EngineConfig.kv_bits)
    kv_bits: int = 8

    def __hash__(self):
        return hash((self.cfg, self.use_kernel, self.interpret, self.bm_prefill,
                     self.bm_decode, self.tp_axis, self.kv_bits))


def _mpt_block(ecfg: MPTEngineConfig, layer: MPTEngineLayer, x, k_cache, v_cache,
               cache_len, mask, alibi, bm):
    cfg = ecfg.cfg
    b, s, d = x.shape
    h, dh = cfg.n_heads, cfg.head_dim

    x_s8 = _layer_norm_q(x, layer.ln1_weight, layer.ln1_bias, cfg.layer_norm_eps)
    qkv_s8 = _linear_s8_int8out(
        layer.qkv_proj, x_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret
    )  # (B, S, 3D) concatenated [q | k | v]
    q_s8, k_s8, v_s8 = jnp.split(qkv_s8, 3, axis=-1)
    q_s8 = q_s8.reshape(b, s, h, dh).transpose(0, 2, 1, 3)  # (B, H, S, Dh)
    k_s8 = k_s8.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    v_s8 = v_s8.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_s8.transpose(0, 1, 3, 2), (0, 0, 0, cache_len)
    )
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_s8, (0, 0, cache_len, 0))

    from dgq_tpu.models.bloom_engine import alibi_int8_attention

    ctx = alibi_int8_attention(
        ecfg, q_s8, k_cache, v_cache, cache_len, s,
        layer.q_scale, layer.k_scale, layer.v_scale,
        alibi_slopes(cfg.n_heads), alibi, mask,
    )

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.out_input_scale), -127, 127).astype(jnp.int8)
    attn_out = _linear_s8(layer.out_proj, ctx_s8, use_kernel=ecfg.use_kernel, bm=bm,
                          interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    x_s8 = _layer_norm_q(x, layer.ln2_weight, layer.ln2_bias, cfg.layer_norm_eps)
    h1 = _linear_s8(layer.up_proj, x_s8, use_kernel=ecfg.use_kernel, bm=bm,
                    interpret=ecfg.interpret)
    h1 = jax.nn.gelu(h1, approximate=False)  # fake-quant parity (mpt.py:178)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -127, 127).astype(jnp.int8)
    out = _linear_s8(layer.down_proj, h_s8, use_kernel=ecfg.use_kernel, bm=bm,
                     interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        out = jax.lax.psum(out, ecfg.tp_axis)
    x = x + out.astype(x.dtype)
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg", "window"))
def mpt_engine_forward(
    ecfg: MPTEngineConfig,
    params: MPTEngineParams,
    input_ids: jax.Array,
    cache: MPTKVCache,
    *,
    window: str = "auto",  # forward-contract parity with engine_forward:
    # declares S > 1 windows prefill vs decode/verify.  This family applies
    # fp p @ V everywhere (quant_pv is LLaMA-engine kv8-scoped), so the
    # flag is accepted for the family-generic speculative contract
    # (serving/speculative.py) and does not alter numerics here.
) -> Tuple[jax.Array, MPTKVCache]:
    cfg = ecfg.cfg
    b, s = input_ids.shape
    smax = cache.k.shape[4]
    x = params.embed_tokens[input_ids].astype(jnp.float32)

    i = (cache.length + jnp.arange(s))[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

    slopes = alibi_slopes(cfg.n_heads)
    alibi = slopes[:, None, None] * jnp.arange(smax, dtype=jnp.float32)[None, None, :]

    bm = ecfg.bm_prefill if s > 8 else ecfg.bm_decode

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _mpt_block(ecfg, layer, xc, k_c, v_c, cache.length, mask, alibi, bm)
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps) * params.norm_f_weight + params.norm_f_bias
    logits = jnp.einsum("bsd,vd->bsv", x, params.lm_head.astype(x.dtype))
    return logits, MPTKVCache(k=new_k, v=new_v, length=cache.length + s)
