"""Functional OPT in JAX (calibration + fake-quant eval path).

Mirrors HF OPTModel numerics and the reference's patched attention
(reference: dgq/quant/kvquanter.py:17-141): the query projection is scaled by
1/sqrt(head_dim) *before* the per-tensor q quantizer sees it, k/v are the raw
projections; LayerNorms carry biases; the MLP is fc1 -> ReLU -> fc2; learned
positional embeddings with the OPT +2 offset.

Layer params:
  layers[i] = {
    'self_attn_layer_norm': {'weight','bias'},
    'self_attn': {'q_proj'|'k_proj'|'v_proj'|'out_proj': {'weight','bias'}},
    'final_layer_norm': {'weight','bias'},
    'fc1': {'weight','bias'}, 'fc2': {'weight','bias'},
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
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 4096
    ffn_dim: int = 16384
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def tiny_opt_config(**overrides) -> OPTConfig:
    base = dict(
        vocab_size=256,
        hidden_size=64,
        ffn_dim=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=512,
    )
    base.update(overrides)
    return OPTConfig(**base)


def init_opt_params(cfg: OPTConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 4 + 6 * cfg.num_hidden_layers))
    d, f = cfg.hidden_size, cfg.ffn_dim

    def lin(k, n_out, n_in):
        w = jax.random.normal(k, (n_out, n_in), dtype) * (0.8 / math.sqrt(n_in))
        return {"weight": w, "bias": jnp.zeros((n_out,), dtype)}

    def ln(dim):
        return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "self_attn_layer_norm": ln(d),
                "self_attn": {
                    "q_proj": lin(next(keys), d, d),
                    "k_proj": lin(next(keys), d, d),
                    "v_proj": lin(next(keys), d, d),
                    "out_proj": lin(next(keys), d, d),
                },
                "final_layer_norm": ln(d),
                "fc1": lin(next(keys), f, d),
                "fc2": lin(next(keys), d, f),
            }
        )
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "embed_positions": jax.random.normal(
            next(keys), (cfg.max_position_embeddings + 2, d), dtype
        )
        * 0.02,
        "layers": layers,
        "final_layer_norm": ln(d),
        "lm_head": {"weight": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02},
    }


def layer_norm(x: jax.Array, p: Dict[str, jax.Array], eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def opt_embed(params, input_ids: jax.Array, cfg: OPTConfig) -> jax.Array:
    """Token + learned positional embeddings with OPT's +2 offset
    (HF OPTLearnedPositionalEmbedding)."""
    b, s = input_ids.shape
    tok = params["embed_tokens"][input_ids]
    pos = params["embed_positions"][jnp.arange(s) + 2]
    return tok + pos[None, :, :]


def opt_attention(
    attn_params,
    x: jax.Array,
    mask: jax.Array,
    cfg: OPTConfig,
    qs: QuantState,
    kv_scales: Optional[KVQuantState],
    collect: Optional[dict],
):
    b, s, d = x.shape
    h, dh = cfg.num_attention_heads, cfg.head_dim
    scaling = dh**-0.5

    q = linear_apply(attn_params["q_proj"], x, qs) * scaling  # scaled pre-quant
    k = linear_apply(attn_params["k_proj"], x, qs)
    v = linear_apply(attn_params["v_proj"], x, qs)

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

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, d)
    if collect is not None:
        collect["out_proj_inp"] = ctx
    return linear_apply(attn_params["out_proj"], ctx, qs)


def opt_block(
    layer_params,
    x: jax.Array,
    mask: jax.Array,
    cfg: OPTConfig,
    qs: QuantState = QuantState(),
    kv_scales: Optional[KVQuantState] = None,
    collect_stats: bool = False,
):
    collect: Optional[dict] = {} if collect_stats else None
    residual = x
    if cfg.do_layer_norm_before:
        x = layer_norm(x, layer_params["self_attn_layer_norm"], cfg.layer_norm_eps)
    if collect is not None:
        collect["attn_ln_out"] = x
        collect["qkv_inp"] = x
    attn_out = opt_attention(layer_params["self_attn"], x, mask, cfg, qs, kv_scales, collect)
    x = residual + attn_out
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, layer_params["self_attn_layer_norm"], cfg.layer_norm_eps)

    residual = x
    if cfg.do_layer_norm_before:
        x = layer_norm(x, layer_params["final_layer_norm"], cfg.layer_norm_eps)
    if collect is not None:
        collect["final_ln_out"] = x
        collect["fc1_inp"] = x
    h = linear_apply(layer_params["fc1"], x, qs)
    h = jax.nn.relu(h)
    if collect is not None:
        collect["fc2_inp"] = h
    out = linear_apply(layer_params["fc2"], h, qs)
    x = residual + out
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, layer_params["final_layer_norm"], cfg.layer_norm_eps)
    if collect is not None:
        return x, collect
    return x


def opt_head(params, x: jax.Array, cfg: OPTConfig) -> jax.Array:
    x = layer_norm(x, params["final_layer_norm"], cfg.layer_norm_eps)
    return jnp.einsum("...k,nk->...n", x, params["lm_head"]["weight"].astype(x.dtype))


def opt_apply(
    params,
    input_ids: jax.Array,
    cfg: OPTConfig,
    qs: QuantState = QuantState(),
    kv_scales_per_layer=None,
) -> jax.Array:
    from dgq_tpu.models.llama import causal_mask

    b, s = input_ids.shape
    x = opt_embed(params, input_ids, cfg)
    mask = causal_mask(s, s, x.dtype)
    for i, layer in enumerate(params["layers"]):
        kv = None if kv_scales_per_layer is None else kv_scales_per_layer[i]
        x = opt_block(layer, x, mask, cfg, qs, kv)
    return opt_head(params, x, cfg)


# ---------------------------------------------------------------------------
# smoothing / meanact wiring (reference: smooth.py:265-279, 319-329)
# ---------------------------------------------------------------------------


def smooth_opt_layer(layer_params: Dict, stats: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    ln1 = p["self_attn_layer_norm"]
    qkv_ws = [p["self_attn"][k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    new_w, new_b, new_qkv = smooth_mod.smooth_ln_fcs(
        ln1["weight"], ln1["bias"], qkv_ws, stats["attn_ln_out"]
    )
    p["self_attn_layer_norm"] = {"weight": new_w, "bias": new_b}
    for name, w in zip(("q_proj", "k_proj", "v_proj"), new_qkv):
        p["self_attn"][name] = {**p["self_attn"][name], "weight": w}

    ln2 = p["final_layer_norm"]
    new_w2, new_b2, (new_fc1,) = smooth_mod.smooth_ln_fcs(
        ln2["weight"], ln2["bias"], [p["fc1"]["weight"]], stats["final_ln_out"]
    )
    p["final_layer_norm"] = {"weight": new_w2, "bias": new_b2}
    p["fc1"] = {**p["fc1"], "weight": new_fc1}
    return p


def meanact_opt_layer(layer_params: Dict, stats_max: Dict, stats_min: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    med1 = (stats_max["attn_ln_out"] + stats_min["attn_ln_out"]) / 2.0
    qkv_ws = [p["self_attn"][k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    qkv_bs = [p["self_attn"][k].get("bias") for k in ("q_proj", "k_proj", "v_proj")]
    ln_b, new_bs = mean_ln_fcs(
        p["self_attn_layer_norm"]["weight"], p["self_attn_layer_norm"]["bias"], qkv_ws, qkv_bs, med1
    )
    p["self_attn_layer_norm"] = {**p["self_attn_layer_norm"], "bias": ln_b}
    for name, b in zip(("q_proj", "k_proj", "v_proj"), new_bs):
        p["self_attn"][name] = {**p["self_attn"][name], "bias": b}
    med2 = (stats_max["final_ln_out"] + stats_min["final_ln_out"]) / 2.0
    ln_b2, (fc1_b,) = mean_ln_fcs(
        p["final_layer_norm"]["weight"], p["final_layer_norm"]["bias"], [p["fc1"]["weight"]], [p["fc1"].get("bias")], med2
    )
    p["final_layer_norm"] = {**p["final_layer_norm"], "bias": ln_b2}
    p["fc1"] = {**p["fc1"], "bias": fc1_b}
    return p
