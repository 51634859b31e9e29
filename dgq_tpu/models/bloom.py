"""Functional BLOOM in JAX (calibration + fake-quant eval).

BLOOM is calibration-only in the reference — its real-quant engine is absent
and the patched attention forward is broken (reference: kvquanter.py:185-187
uses an undefined variable; SURVEY §7 quirks).  Here the model is fully
functional: fused query_key_value projection, ALiBi attention, GeLU MLP,
embedding LayerNorm.

Layer params:
  layers[i] = {
    'input_layernorm': {'weight','bias'},
    'self_attention': {'query_key_value': {'weight','bias'},
                       'dense': {'weight','bias'}},
    'post_attention_layernorm': {'weight','bias'},
    'mlp': {'dense_h_to_4h': {'weight','bias'},
            'dense_4h_to_h': {'weight','bias'}},
  }
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import QuantState, linear_apply, _kv_fake_quant
from dgq_tpu.models.opt import layer_norm
from dgq_tpu.quant import smooth as smooth_mod
from dgq_tpu.quant.smooth import mean_ln_fcs


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 4096
    num_hidden_layers: int = 30
    num_attention_heads: int = 32
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def tiny_bloom_config(**overrides) -> BloomConfig:
    base = dict(vocab_size=256, hidden_size=64, num_hidden_layers=2, num_attention_heads=4)
    base.update(overrides)
    return BloomConfig(**base)


def init_bloom_params(cfg: BloomConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 4 + 4 * cfg.num_hidden_layers))
    d = cfg.hidden_size

    def lin(k, n_out, n_in):
        w = jax.random.normal(k, (n_out, n_in), dtype) * (0.8 / math.sqrt(n_in))
        return {"weight": w, "bias": jnp.zeros((n_out,), dtype)}

    def ln(dim):
        return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": ln(d),
                "self_attention": {
                    "query_key_value": lin(next(keys), 3 * d, d),
                    "dense": lin(next(keys), d, d),
                },
                "post_attention_layernorm": ln(d),
                "mlp": {
                    "dense_h_to_4h": lin(next(keys), 4 * d, d),
                    "dense_4h_to_h": lin(next(keys), d, 4 * d),
                },
            }
        )
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "word_embeddings_layernorm": ln(d),
        "layers": layers,
        "ln_f": ln(d),
        "lm_head": {"weight": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02},
    }


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """HF BLOOM ALiBi slopes."""
    closest_pow2 = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest_pow2) - 3)))
    slopes = [base ** (i + 1) for i in range(closest_pow2)]
    if closest_pow2 != n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest_pow2) - 3)))
        num_extra = min(closest_pow2, n_heads - closest_pow2)
        slopes += [extra_base ** (2 * i + 1) for i in range(num_extra)]
    return jnp.asarray(slopes, jnp.float32)


def bloom_aux(cfg: BloomConfig, seqlen: int, dtype):
    from dgq_tpu.models.llama import causal_mask

    mask = causal_mask(seqlen, seqlen, jnp.float32)
    slopes = alibi_slopes(cfg.num_attention_heads)  # (H,)
    # alibi bias: slope_h * key_position (relative, HF builds it from the
    # attention-mask cumsum; for dense causal it is j - (S-1) offset-free
    # because softmax is shift-invariant per row — use j directly)
    pos = jnp.arange(seqlen, dtype=jnp.float32)
    alibi = slopes[:, None, None] * pos[None, None, :]  # (H, 1, S)
    return (mask, alibi)


def bloom_embed(params, input_ids: jax.Array, cfg: BloomConfig) -> jax.Array:
    x = params["embed_tokens"][input_ids]
    return layer_norm(x, params["word_embeddings_layernorm"], cfg.layer_norm_eps)


def bloom_attention(attn_params, x, mask, alibi, cfg, qs, kv_scales, collect):
    b, s, d = x.shape
    h, dh = cfg.num_attention_heads, cfg.head_dim

    qkv = linear_apply(attn_params["query_key_value"], x, qs)  # (B, S, 3D)
    # HF BLOOM layout: (B, S, H, 3, Dh)
    qkv = qkv.reshape(b, s, h, 3, dh)
    q = qkv[:, :, :, 0].transpose(0, 2, 1, 3)  # (B, H, S, Dh)
    k = qkv[:, :, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, :, 2].transpose(0, 2, 1, 3)

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
        collect["dense_inp"] = ctx
    return linear_apply(attn_params["dense"], ctx, qs)


def bloom_block(layer_params, x, aux, cfg, qs=QuantState(), kv_scales=None, collect_stats=False):
    mask, alibi = aux
    collect: Optional[dict] = {} if collect_stats else None
    ln1 = layer_norm(x, layer_params["input_layernorm"], cfg.layer_norm_eps)
    if collect is not None:
        collect["attn_ln_out"] = ln1
        collect["qkv_inp"] = ln1
    attn_out = bloom_attention(
        layer_params["self_attention"], ln1, mask, alibi, cfg, qs, kv_scales, collect
    )
    x = x + attn_out

    ln2 = layer_norm(x, layer_params["post_attention_layernorm"], cfg.layer_norm_eps)
    if collect is not None:
        collect["post_ln_out"] = ln2
        collect["fc1_inp"] = ln2
    hmid = linear_apply(layer_params["mlp"]["dense_h_to_4h"], ln2, qs)
    hmid = jax.nn.gelu(hmid, approximate=True)
    if collect is not None:
        collect["fc2_inp"] = hmid
    out = linear_apply(layer_params["mlp"]["dense_4h_to_h"], hmid, qs)
    x = x + out
    if collect is not None:
        return x, collect
    return x


def bloom_head(params, x, cfg: BloomConfig):
    x = layer_norm(x, params["ln_f"], cfg.layer_norm_eps)
    return jnp.einsum("...k,nk->...n", x, params["lm_head"]["weight"].astype(x.dtype))


def bloom_apply(params, input_ids, cfg, qs=QuantState(), kv_scales_per_layer=None):
    x = bloom_embed(params, input_ids, cfg)
    aux = bloom_aux(cfg, input_ids.shape[1], x.dtype)
    for i, layer in enumerate(params["layers"]):
        kv = None if kv_scales_per_layer is None else kv_scales_per_layer[i]
        x = bloom_block(layer, x, aux, cfg, qs, kv)
    return bloom_head(params, x, cfg)


# ---------------------------------------------------------------------------
# smoothing / meanact (reference: smooth.py:280-293, 330-339)
# ---------------------------------------------------------------------------


def smooth_bloom_layer(layer_params: Dict, stats: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    ln1 = p["input_layernorm"]
    qkv_w = p["self_attention"]["query_key_value"]["weight"]
    new_w, new_b, (new_qkv,) = smooth_mod.smooth_ln_fcs(
        ln1["weight"], ln1["bias"], [qkv_w], stats["attn_ln_out"]
    )
    p["input_layernorm"] = {"weight": new_w, "bias": new_b}
    p["self_attention"]["query_key_value"] = {
        **p["self_attention"]["query_key_value"],
        "weight": new_qkv,
    }

    ln2 = p["post_attention_layernorm"]
    fc1_w = p["mlp"]["dense_h_to_4h"]["weight"]
    new_w2, new_b2, (new_fc1,) = smooth_mod.smooth_ln_fcs(
        ln2["weight"], ln2["bias"], [fc1_w], stats["post_ln_out"]
    )
    p["post_attention_layernorm"] = {"weight": new_w2, "bias": new_b2}
    p["mlp"]["dense_h_to_4h"] = {**p["mlp"]["dense_h_to_4h"], "weight": new_fc1}
    # NOTE: the reference additionally sets fc2.inp_bias for BLOOM
    # (smooth.py:293), consumed nowhere in QuantLinear.forward's actual
    # static path — documented as a no-op and omitted.
    return p


def meanact_bloom_layer(layer_params: Dict, stats_max: Dict, stats_min: Dict) -> Dict:
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    med1 = (stats_max["attn_ln_out"] + stats_min["attn_ln_out"]) / 2.0
    qkv = p["self_attention"]["query_key_value"]
    ln_b, (qkv_b,) = mean_ln_fcs(
        p["input_layernorm"]["weight"], p["input_layernorm"]["bias"], [qkv["weight"]], [qkv.get("bias")], med1
    )
    p["input_layernorm"] = {**p["input_layernorm"], "bias": ln_b}
    p["self_attention"]["query_key_value"] = {**qkv, "bias": qkv_b}
    med2 = (stats_max["post_ln_out"] + stats_min["post_ln_out"]) / 2.0
    fc1 = p["mlp"]["dense_h_to_4h"]
    ln_b2, (fc1_b,) = mean_ln_fcs(
        p["post_attention_layernorm"]["weight"], p["post_attention_layernorm"]["bias"], [fc1["weight"]], [fc1.get("bias")], med2
    )
    p["post_attention_layernorm"] = {**p["post_attention_layernorm"], "bias": ln_b2}
    p["mlp"]["dense_h_to_4h"] = {**fc1, "bias": fc1_b}
    return p
