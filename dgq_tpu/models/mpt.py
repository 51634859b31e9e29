"""Functional MPT in JAX (calibration + fake-quant eval).

The reference only lists MPT in its block-dispatch table
(reference: dgq/utils/modelutils.py:39-52) — no quantized attention class,
no smoothing wiring, so MPT cannot actually be calibrated there.  Here MPT
is a first-class family: fused Wqkv, ALiBi attention, GELU MLP, LayerNorm
without biases (the mpt-7b no_bias configuration).

Layer params:
  layers[i] = {
    'norm_1': {'weight'[, 'bias']},
    'attn': {'Wqkv': {'weight'}, 'out_proj': {'weight'}},
    'norm_2': {'weight'[, 'bias']},
    'ffn': {'up_proj': {'weight'}, 'down_proj': {'weight'}},
  }
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import KVQuantState, QuantState, linear_apply, _kv_fake_quant
from dgq_tpu.quant import smooth as smooth_mod
from dgq_tpu.quant.smooth import mean_ln_fcs


@dataclasses.dataclass(frozen=True)
class MPTConfig:
    vocab_size: int = 50368
    d_model: int = 4096
    n_heads: int = 32
    n_layers: int = 32
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    layer_norm_eps: float = 1e-5
    no_bias: bool = True

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def ffn_dim(self) -> int:
        return self.expansion_ratio * self.d_model

    # aliases so the generic PTQ driver can treat configs uniformly
    @property
    def hidden_size(self) -> int:
        return self.d_model

    @property
    def num_hidden_layers(self) -> int:
        return self.n_layers


def tiny_mpt_config(**overrides) -> MPTConfig:
    base = dict(vocab_size=256, d_model=64, n_heads=4, n_layers=2, max_seq_len=256)
    base.update(overrides)
    return MPTConfig(**base)


def init_mpt_params(cfg: MPTConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 2 + 4 * cfg.n_layers))
    d, f = cfg.d_model, cfg.ffn_dim

    def lin(k, n_out, n_in):
        w = jax.random.normal(k, (n_out, n_in), dtype) * (0.8 / math.sqrt(n_in))
        return {"weight": w}

    def ln(dim):
        p = {"weight": jnp.ones((dim,), dtype)}
        if not cfg.no_bias:
            p["bias"] = jnp.zeros((dim,), dtype)
        return p

    layers = []
    for _ in range(cfg.n_layers):
        layers.append(
            {
                "norm_1": ln(d),
                "attn": {
                    "Wqkv": lin(next(keys), 3 * d, d),
                    "out_proj": lin(next(keys), d, d),
                },
                "norm_2": ln(d),
                "ffn": {
                    "up_proj": lin(next(keys), f, d),
                    "down_proj": lin(next(keys), d, f),
                },
            }
        )
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "layers": layers,
        "norm_f": ln(d),
        "lm_head": {"weight": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02},
    }


def _ln(x: jax.Array, p: Dict[str, jax.Array], eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * p["weight"].astype(jnp.float32)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def mpt_alibi(cfg: MPTConfig, seqlen: int):
    """MPT ALiBi bias: slope_h * key position (equivalent per causal row to
    HF's slope * (j - i) by softmax shift-invariance)."""
    from dgq_tpu.models.bloom import alibi_slopes

    slopes = alibi_slopes(cfg.n_heads)
    pos = jnp.arange(seqlen, dtype=jnp.float32)
    return slopes[:, None, None] * pos[None, None, :]  # (H, 1, S)


def mpt_aux(cfg: MPTConfig, seqlen: int, dtype):
    from dgq_tpu.models.llama import causal_mask

    return (causal_mask(seqlen, seqlen, jnp.float32), mpt_alibi(cfg, seqlen))


def mpt_embed(params, input_ids: jax.Array, cfg: MPTConfig) -> jax.Array:
    return params["embed_tokens"][input_ids]


def mpt_attention(attn_params, x, mask, alibi, cfg, qs, kv_scales, collect):
    b, s, d = x.shape
    h, dh = cfg.n_heads, cfg.head_dim

    qkv = linear_apply(attn_params["Wqkv"], x, qs)  # (B, S, 3D): [q | k | v]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

    if collect is not None:
        collect["q_states"] = q
        collect["k_states"] = k
        collect["v_states"] = v
    if qs.kv and kv_scales is not None:
        q = _kv_fake_quant(q, kv_scales.q_scale)
        k = _kv_fake_quant(k, kv_scales.k_scale)
        v = _kv_fake_quant(v, kv_scales.v_scale)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(dh)
    scores = scores + alibi[None, :, :, :] + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
    if collect is not None:
        collect["out_proj_inp"] = ctx
    return linear_apply(attn_params["out_proj"], ctx, qs)


def mpt_block(layer_params, x, aux, cfg, qs=QuantState(), kv_scales=None, collect_stats=False):
    mask, alibi = aux
    collect: Optional[dict] = {} if collect_stats else None
    ln1 = _ln(x, layer_params["norm_1"], cfg.layer_norm_eps)
    if collect is not None:
        collect["attn_ln_out"] = ln1
        collect["qkv_inp"] = ln1
    x = x + mpt_attention(layer_params["attn"], ln1, mask, alibi, cfg, qs, kv_scales, collect)

    ln2 = _ln(x, layer_params["norm_2"], cfg.layer_norm_eps)
    if collect is not None:
        collect["ffn_ln_out"] = ln2
        collect["fc1_inp"] = ln2
    hmid = linear_apply(layer_params["ffn"]["up_proj"], ln2, qs)
    hmid = jax.nn.gelu(hmid, approximate=False)
    if collect is not None:
        collect["fc2_inp"] = hmid
    x = x + linear_apply(layer_params["ffn"]["down_proj"], hmid, qs)
    if collect is not None:
        return x, collect
    return x


def mpt_head(params, x, cfg: MPTConfig):
    x = _ln(x, params["norm_f"], cfg.layer_norm_eps)
    return jnp.einsum("...k,nk->...n", x, params["lm_head"]["weight"].astype(x.dtype))


def mpt_apply(params, input_ids, cfg, qs=QuantState(), kv_scales_per_layer=None):
    x = mpt_embed(params, input_ids, cfg)
    aux = mpt_aux(cfg, input_ids.shape[1], x.dtype)
    for i, layer in enumerate(params["layers"]):
        kv = None if kv_scales_per_layer is None else kv_scales_per_layer[i]
        x = mpt_block(layer, x, aux, cfg, qs, kv)
    return mpt_head(params, x, cfg)


# ---------------------------------------------------------------------------
# smoothing / meanact wiring (no reference counterpart — follows the BLOOM
# fused-qkv recipe, smooth.py:280-293)
# ---------------------------------------------------------------------------


def smooth_mpt_layer(layer_params: Dict, stats: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    ln1 = p["norm_1"]
    new_w, new_b, (new_qkv,) = smooth_mod.smooth_ln_fcs(
        ln1["weight"], ln1.get("bias"), [p["attn"]["Wqkv"]["weight"]], stats["attn_ln_out"]
    )
    p["norm_1"] = {"weight": new_w, **({"bias": new_b} if new_b is not None else {})}
    p["attn"]["Wqkv"] = {**p["attn"]["Wqkv"], "weight": new_qkv}

    ln2 = p["norm_2"]
    new_w2, new_b2, (new_up,) = smooth_mod.smooth_ln_fcs(
        ln2["weight"], ln2.get("bias"), [p["ffn"]["up_proj"]["weight"]], stats["ffn_ln_out"]
    )
    p["norm_2"] = {"weight": new_w2, **({"bias": new_b2} if new_b2 is not None else {})}
    p["ffn"]["up_proj"] = {**p["ffn"]["up_proj"], "weight": new_up}
    return p


def meanact_mpt_layer(layer_params: Dict, stats_max: Dict, stats_min: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    med1 = (stats_max["attn_ln_out"] + stats_min["attn_ln_out"]) / 2.0
    qkv = p["attn"]["Wqkv"]
    ln_b, (qkv_b,) = mean_ln_fcs(
        p["norm_1"]["weight"], p["norm_1"].get("bias"), [qkv["weight"]], [qkv.get("bias")], med1
    )
    p["norm_1"] = {**p["norm_1"], "bias": ln_b}
    p["attn"]["Wqkv"] = {**qkv, "bias": qkv_b}
    med2 = (stats_max["ffn_ln_out"] + stats_min["ffn_ln_out"]) / 2.0
    up = p["ffn"]["up_proj"]
    ln_b2, (up_b,) = mean_ln_fcs(
        p["norm_2"]["weight"], p["norm_2"].get("bias"), [up["weight"]], [up.get("bias")], med2
    )
    p["norm_2"] = {**p["norm_2"], "bias": ln_b2}
    p["ffn"]["up_proj"] = {**up, "bias": up_b}
    return p
