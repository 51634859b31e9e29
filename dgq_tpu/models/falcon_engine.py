"""Real-quant INT8-dataflow Falcon engine.

The reference has only block-dispatch plumbing for Falcon
(modelutils.py:39-52); dgq_tpu calibrates and fake-quants it
(models/falcon.py) and this module completes the family with the engine.

Falcon-7B architecture notes honored here:
  * PARALLEL block: one input LayerNorm feeds BOTH attention and the MLP,
    and the residual adds both branch outputs at once (falcon.py:160).
    The two branches have DIFFERENT calibrated input scales, so the LN
    runs once in fp and is requantized per branch (a scale fold into the
    LN weight would have to pick one).
  * RoPE runs in fp on the qkv output (llama engine convention,
    reference llama_a8w4.py:110-111), so query_key_value is an f32-out
    GEMM followed by post-RoPE requant into the INT8 KV cache.
  * Multi-query / grouped attention (num_kv_heads < heads) uses the same
    rep-folding the LLaMA engine uses.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import EngineLinear, _linear_s8, _requant, f32_out_linear
from dgq_tpu.models.falcon import FalconConfig
from dgq_tpu.models.llama import rope_cos_sin, rotate_half
from dgq_tpu.quant.packing import PackedLinear


class FalconEngineLayer(NamedTuple):
    ln_weight: jax.Array  # NOT scale-folded: shared by two branch scales
    ln_bias: jax.Array
    qkv_proj: EngineLinear  # f32 out
    dense: EngineLinear  # f32 out
    fc1: EngineLinear  # f32 out
    fc2: EngineLinear  # f32 out
    attn_input_scale: jax.Array
    fc1_input_scale: jax.Array
    q_scale: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    dense_input_scale: jax.Array
    fc2_input_scale: jax.Array


class FalconEngineParams(NamedTuple):
    embed_tokens: jax.Array
    layers: FalconEngineLayer
    ln_f_weight: jax.Array
    ln_f_bias: jax.Array
    lm_head: jax.Array


class FalconKVCache(NamedTuple):
    k: jax.Array  # (L, B, Hkv, Dh, Smax) int8, transposed
    v: jax.Array  # (L, B, Hkv, Smax, Dh) int8
    length: jax.Array


def init_falcon_kv_cache(cfg: FalconConfig, batch: int, max_len: int) -> FalconKVCache:
    L, Hk, Dh = cfg.num_hidden_layers, cfg.num_kv_heads, cfg.head_dim
    return FalconKVCache(
        k=jnp.zeros((L, batch, Hk, Dh, max_len), jnp.int8),
        v=jnp.zeros((L, batch, Hk, max_len, Dh), jnp.int8),
        length=jnp.zeros((), jnp.int32),
    )


def from_ptq_falcon(params, kv_scales, cfg: FalconConfig) -> FalconEngineParams:
    per_layer = []
    for li, layer in enumerate(params["layers"]):
        at = layer["self_attention"]
        kv = kv_scales[li]
        attn_input_scale = at["query_key_value"].amax.astype(jnp.float32) / 127.0
        fc1_input_scale = layer["mlp"]["dense_h_to_4h"].amax.astype(jnp.float32) / 127.0
        dense_input_scale = at["dense"].amax.astype(jnp.float32) / 127.0
        fc2_input_scale = layer["mlp"]["dense_4h_to_h"].amax.astype(jnp.float32) / 127.0
        ln = layer["input_layernorm"]
        ln_b = ln.get("bias")
        per_layer.append(
            FalconEngineLayer(
                ln_weight=ln["weight"].astype(jnp.float32),
                ln_bias=(jnp.zeros((cfg.hidden_size,), jnp.float32)
                         if ln_b is None else ln_b.astype(jnp.float32)),
                qkv_proj=f32_out_linear(at["query_key_value"], attn_input_scale),
                dense=f32_out_linear(at["dense"], dense_input_scale),
                fc1=f32_out_linear(layer["mlp"]["dense_h_to_4h"], fc1_input_scale),
                fc2=f32_out_linear(layer["mlp"]["dense_4h_to_h"], fc2_input_scale),
                attn_input_scale=attn_input_scale,
                fc1_input_scale=fc1_input_scale,
                q_scale=kv.q_scale.astype(jnp.float32),
                k_scale=kv.k_scale.astype(jnp.float32),
                v_scale=kv.v_scale.astype(jnp.float32),
                dense_input_scale=dense_input_scale,
                fc2_input_scale=fc2_input_scale,
            )
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    return FalconEngineParams(
        embed_tokens=params["embed_tokens"],
        layers=stacked,
        ln_f_weight=params["ln_f"]["weight"].astype(jnp.float32),
        ln_f_bias=params["ln_f"]["bias"].astype(jnp.float32),
        lm_head=params["lm_head"]["weight"],
    )


@dataclasses.dataclass(frozen=True)
class FalconEngineConfig:
    cfg: FalconConfig
    use_kernel: bool = True
    interpret: bool = False
    bm_prefill: int = 256
    bm_decode: int = 128
    tp_axis: Optional[str] = None
    # KV-cache precision; only 8 is implemented for Falcon (INT4 packed KV
    # is the LLaMA engine's knob, models.engine.EngineConfig.kv_bits)
    kv_bits: int = 8

    def __hash__(self):
        return hash((self.cfg, self.use_kernel, self.interpret, self.bm_prefill,
                     self.bm_decode, self.tp_axis, self.kv_bits))


def _ln_fp(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * w + b


def _falcon_block(ecfg: FalconEngineConfig, layer: FalconEngineLayer, x,
                  k_cache, v_cache, cache_len, mask, pos_cos, pos_sin, bm):
    cfg = ecfg.cfg
    b, s, d = x.shape
    h, hk, dh = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
    rep = h // hk
    kwl = dict(use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)

    ln = _ln_fp(x, layer.ln_weight, layer.ln_bias, cfg.layer_norm_eps)
    # parallel branches share the LN output but have distinct input scales
    x_attn_s8 = jnp.clip(jnp.round(ln / layer.attn_input_scale), -127, 127).astype(jnp.int8)
    x_fc1_s8 = jnp.clip(jnp.round(ln / layer.fc1_input_scale), -127, 127).astype(jnp.int8)

    qkv = _linear_s8(layer.qkv_proj, x_attn_s8, **kwl)  # (B, S, (h+2hk)*dh) f32
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
    q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)

    cos = pos_cos[None, None, :, :]
    sin = pos_sin[None, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)
    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)

    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_s8.transpose(0, 1, 3, 2), (0, 0, 0, cache_len)
    )
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_s8, (0, 0, cache_len, 0))

    qg = q_s8.reshape(b, hk, rep * s, dh)
    s32 = jnp.einsum("bgrd,bgdk->bgrk", qg, k_cache, preferred_element_type=jnp.int32)
    scores = s32.astype(jnp.float32).reshape(b, hk, rep, s, -1) * (
        layer.q_scale * layer.k_scale / math.sqrt(dh)
    )
    scores = scores + mask[None, None, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    vf = v_cache.astype(jnp.float32) * layer.v_scale
    ctx = jnp.einsum("bgrqk,bgkd->bgrqd", probs, vf)
    ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(b, s, h * dh)

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.dense_input_scale), -127, 127).astype(jnp.int8)
    attn_out = _linear_s8(layer.dense, ctx_s8, **kwl)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)

    h1 = _linear_s8(layer.fc1, x_fc1_s8, **kwl)
    h1 = jax.nn.gelu(h1, approximate=False)  # fake-quant parity (falcon.py:155)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -127, 127).astype(jnp.int8)
    mlp_out = _linear_s8(layer.fc2, h_s8, **kwl)
    if ecfg.tp_axis is not None:
        mlp_out = jax.lax.psum(mlp_out, ecfg.tp_axis)

    # parallel residual (falcon.py:160)
    x = x + attn_out.astype(x.dtype) + mlp_out.astype(x.dtype)
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg", "window"))
def falcon_engine_forward(
    ecfg: FalconEngineConfig,
    params: FalconEngineParams,
    input_ids: jax.Array,
    cache: FalconKVCache,
    *,
    window: str = "auto",  # forward-contract parity with engine_forward:
    # declares S > 1 windows prefill vs decode/verify.  This family applies
    # fp p @ V everywhere (quant_pv is LLaMA-engine kv8-scoped), so the
    # flag is accepted for the family-generic speculative contract
    # (serving/speculative.py) and does not alter numerics here.
) -> Tuple[jax.Array, FalconKVCache]:
    cfg = ecfg.cfg
    b, s = input_ids.shape
    smax = cache.k.shape[4]
    x = params.embed_tokens[input_ids].astype(jnp.float32)

    pos = cache.length + jnp.arange(s)
    pos_cos, pos_sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta, jnp.float32)

    i = pos[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

    bm = ecfg.bm_prefill if s > 8 else ecfg.bm_decode

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _falcon_block(
            ecfg, layer, xc, k_c, v_c, cache.length, mask, pos_cos, pos_sin, bm
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps) * params.ln_f_weight + params.ln_f_bias
    logits = jnp.einsum("bsd,vd->bsv", x, params.lm_head.astype(x.dtype))
    return logits, FalconKVCache(k=new_k, v=new_v, length=cache.length + s)
