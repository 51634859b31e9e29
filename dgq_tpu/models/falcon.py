"""Functional Falcon in JAX (calibration + fake-quant eval).

The reference only lists Falcon in its block-dispatch table
(reference: dgq/utils/modelutils.py:39-52) with no quantization classes —
here it is a full family: the falcon-7b architecture (parallel
attention+MLP off a single LayerNorm, fused multi-query query_key_value
[H q heads | 1 k | 1 v], rotary embeddings, GELU MLP).

Layer params:
  layers[i] = {
    'input_layernorm': {'weight','bias'},
    'self_attention': {'query_key_value': {'weight'}, 'dense': {'weight'}},
    'mlp': {'dense_h_to_4h': {'weight'}, 'dense_4h_to_h': {'weight'}},
  }
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import (
    KVQuantState,
    QuantState,
    _kv_fake_quant,
    apply_rope,
    linear_apply,
    rope_cos_sin,
)
from dgq_tpu.models.opt import layer_norm
from dgq_tpu.quant import smooth as smooth_mod
from dgq_tpu.quant.smooth import mean_ln_fcs


@dataclasses.dataclass(frozen=True)
class FalconConfig:
    vocab_size: int = 65024
    hidden_size: int = 4544
    num_hidden_layers: int = 32
    num_attention_heads: int = 71
    num_kv_heads: int = 1  # multi-query
    layer_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    parallel_attn: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def tiny_falcon_config(**overrides) -> FalconConfig:
    base = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_kv_heads=1)
    base.update(overrides)
    return FalconConfig(**base)


def init_falcon_params(cfg: FalconConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 2 + 4 * cfg.num_hidden_layers))
    d = cfg.hidden_size
    dh = cfg.head_dim
    qkv_out = d + 2 * cfg.num_kv_heads * dh

    def lin(k, n_out, n_in):
        w = jax.random.normal(k, (n_out, n_in), dtype) * (0.8 / math.sqrt(n_in))
        return {"weight": w}

    def ln(dim):
        return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": ln(d),
                "self_attention": {
                    "query_key_value": lin(next(keys), qkv_out, d),
                    "dense": lin(next(keys), d, d),
                },
                "mlp": {
                    "dense_h_to_4h": lin(next(keys), 4 * d, d),
                    "dense_4h_to_h": lin(next(keys), d, 4 * d),
                },
            }
        )
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "layers": layers,
        "ln_f": ln(d),
        "lm_head": {"weight": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02},
    }


def falcon_aux(cfg: FalconConfig, seqlen: int, dtype):
    from dgq_tpu.models.llama import causal_mask

    cos, sin = rope_cos_sin(jnp.arange(seqlen), cfg.head_dim, cfg.rope_theta, dtype)
    return (causal_mask(seqlen, seqlen, jnp.float32), cos, sin)


def falcon_embed(params, input_ids: jax.Array, cfg: FalconConfig) -> jax.Array:
    return params["embed_tokens"][input_ids]


def falcon_attention(attn_params, x, mask, cos, sin, cfg, qs, kv_scales, collect):
    b, s, d = x.shape
    h, hk, dh = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

    qkv = linear_apply(attn_params["query_key_value"], x, qs)
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
    q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)

    q, k = apply_rope(q, k, cos, sin)
    if hk < h:
        k = jnp.repeat(k, h // hk, axis=1)
        v = jnp.repeat(v, h // hk, axis=1)

    if collect is not None:
        collect["q_states"] = q
        collect["k_states"] = k
        collect["v_states"] = v
    if qs.kv and kv_scales is not None:
        q = _kv_fake_quant(q, kv_scales.q_scale)
        k = _kv_fake_quant(k, kv_scales.k_scale)
        v = _kv_fake_quant(v, kv_scales.v_scale)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(dh)
    scores = scores + mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    if collect is not None:
        collect["dense_inp"] = ctx
    return linear_apply(attn_params["dense"], ctx, qs)


def falcon_block(layer_params, x, aux, cfg, qs=QuantState(), kv_scales=None, collect_stats=False):
    mask, cos, sin = aux
    collect: Optional[dict] = {} if collect_stats else None
    ln_out = layer_norm(x, layer_params["input_layernorm"], cfg.layer_norm_eps)
    if collect is not None:
        collect["attn_ln_out"] = ln_out
        collect["qkv_inp"] = ln_out
        collect["fc1_inp"] = ln_out  # parallel branches share the LN output
    attn_out = falcon_attention(
        layer_params["self_attention"], ln_out, mask, cos, sin, cfg, qs, kv_scales, collect
    )
    hmid = linear_apply(layer_params["mlp"]["dense_h_to_4h"], ln_out, qs)
    hmid = jax.nn.gelu(hmid, approximate=False)
    if collect is not None:
        collect["fc2_inp"] = hmid
    mlp_out = linear_apply(layer_params["mlp"]["dense_4h_to_h"], hmid, qs)
    # parallel residual (falcon-7b parallel_attn)
    x = x + attn_out + mlp_out
    if collect is not None:
        return x, collect
    return x


def falcon_head(params, x, cfg: FalconConfig):
    x = layer_norm(x, params["ln_f"], cfg.layer_norm_eps)
    return jnp.einsum("...k,nk->...n", x, params["lm_head"]["weight"].astype(x.dtype))


def falcon_apply(params, input_ids, cfg, qs=QuantState(), kv_scales_per_layer=None):
    x = falcon_embed(params, input_ids, cfg)
    aux = falcon_aux(cfg, input_ids.shape[1], x.dtype)
    for i, layer in enumerate(params["layers"]):
        kv = None if kv_scales_per_layer is None else kv_scales_per_layer[i]
        x = falcon_block(layer, x, aux, cfg, qs, kv)
    return falcon_head(params, x, cfg)


# ---------------------------------------------------------------------------
# smoothing / meanact (no reference counterpart; the parallel design means
# one LN feeds BOTH qkv and fc1 — the multi-fc smooth_ln_fcs case)
# ---------------------------------------------------------------------------


def smooth_falcon_layer(layer_params: Dict, stats: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    ln = p["input_layernorm"]
    qkv_w = p["self_attention"]["query_key_value"]["weight"]
    fc1_w = p["mlp"]["dense_h_to_4h"]["weight"]
    new_w, new_b, (new_qkv, new_fc1) = smooth_mod.smooth_ln_fcs(
        ln["weight"], ln["bias"], [qkv_w, fc1_w], stats["attn_ln_out"]
    )
    p["input_layernorm"] = {"weight": new_w, "bias": new_b}
    p["self_attention"]["query_key_value"] = {
        **p["self_attention"]["query_key_value"], "weight": new_qkv
    }
    p["mlp"]["dense_h_to_4h"] = {**p["mlp"]["dense_h_to_4h"], "weight": new_fc1}
    return p


def meanact_falcon_layer(layer_params: Dict, stats_max: Dict, stats_min: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    med = (stats_max["attn_ln_out"] + stats_min["attn_ln_out"]) / 2.0
    qkv = p["self_attention"]["query_key_value"]
    fc1 = p["mlp"]["dense_h_to_4h"]
    ln_b, (qkv_b, fc1_b) = mean_ln_fcs(
        p["input_layernorm"]["weight"], p["input_layernorm"]["bias"],
        [qkv["weight"], fc1["weight"]], [qkv.get("bias"), fc1.get("bias")], med,
    )
    p["input_layernorm"] = {**p["input_layernorm"], "bias": ln_b}
    p["self_attention"]["query_key_value"] = {**qkv, "bias": qkv_b}
    p["mlp"]["dense_h_to_4h"] = {**fc1, "bias": fc1_b}
    return p
