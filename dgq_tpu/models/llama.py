"""Functional LLaMA/LLaMA-2 in JAX.

The reference does not define models — it monkey-patches HuggingFace modules
in place (reference: dgq/utils/modelutils.py:95-111, dgq/quant/kvquanter.py).
The TPU-native design owns the model: params are a pytree of arrays, the
forward is a pure function, and quantization swaps fp linear dicts for
:class:`~dgq_tpu.quant.packing.PackedLinear` leaves in the same tree.

Layer params (fp):
  layers[i] = {
    'input_layernorm':          {'weight': (D,)},
    'self_attn': {'q_proj'|'k_proj'|'v_proj'|'o_proj':
                  {'weight': (N, K)}},       # HF (out, in) layout
    'post_attention_layernorm': {'weight': (D,)},
    'mlp': {'gate_proj'|'up_proj'|'down_proj': {'weight': (N, K)}},
  }

A linear leaf is either ``{'weight', 'bias'?}`` (fp) or a PackedLinear
(quantized).  ``QuantState`` carries the phase toggles the reference keeps as
module attributes (setquant / q_quant scales — quant_sequence.py:13-16,
kvquanter.py:353-364).

Numerics mirror HF LlamaModel: RMSNorm in fp32, rotary embedding with
rotate-half halves, fp32 softmax, GQA via head repetition.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from dgq_tpu.quant.act_quant import make_act_quant_fn
from dgq_tpu.quant.packing import PackedLinear, dequantize_linear

LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def tiny_llama_config(**overrides) -> LlamaConfig:
    """Tiny fixture config for CPU tests (SURVEY §4: fake-backend pattern)."""
    base = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=512,
    )
    base.update(overrides)
    return LlamaConfig(**base)


class KVQuantState(NamedTuple):
    """Static per-tensor q/k/v scales frozen by kv calibration
    (reference: kvquanter.py:353-364; scale = 2*absmax/maxq, zero = 128)."""

    q_scale: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array


@dataclasses.dataclass(frozen=True)
class QuantState:
    """Phase toggles for the fake-quant forward (reference setquant +
    ready() kv quantizers)."""

    actq: bool = False
    wtq: bool = False
    kv: bool = False  # apply kv fake-quant where scales are present


# ---------------------------------------------------------------------------
# init / primitives
# ---------------------------------------------------------------------------


def init_llama_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init params (tests / fixtures). Real use ingests HF weights."""
    keys = iter(jax.random.split(key, 4 + 9 * cfg.num_hidden_layers))
    d, f = cfg.hidden_size, cfg.intermediate_size
    nq = cfg.num_attention_heads * cfg.head_dim
    nkv = cfg.num_key_value_heads * cfg.head_dim

    def lin(k, n_out, n_in):
        w = jax.random.normal(k, (n_out, n_in), dtype) * (0.8 / math.sqrt(n_in))
        return {"weight": w}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": {"weight": jnp.ones((d,), dtype)},
                "self_attn": {
                    "q_proj": lin(next(keys), nq, d),
                    "k_proj": lin(next(keys), nkv, d),
                    "v_proj": lin(next(keys), nkv, d),
                    "o_proj": lin(next(keys), d, nq),
                },
                "post_attention_layernorm": {"weight": jnp.ones((d,), dtype)},
                "mlp": {
                    "gate_proj": lin(next(keys), f, d),
                    "up_proj": lin(next(keys), f, d),
                    "down_proj": lin(next(keys), d, f),
                },
            }
        )
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "layers": layers,
        "norm": {"weight": jnp.ones((d,), dtype)},
        "lm_head": {"weight": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02},
    }


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """HF LlamaRMSNorm: fp32 variance, weight applied after downcast."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(dt) * xf.astype(dt)).astype(dt)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float, dtype=jnp.float32):
    """(S,) positions -> cos/sin of shape (S, head_dim) (halves duplicated,
    HF layout)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # (S, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k: (B, H, S, Dh); cos/sin: (S, Dh)."""
    cos = cos[None, None, :, :]
    sin = sin[None, None, :, :]
    return q * cos + rotate_half(q) * sin, k * cos + rotate_half(k) * sin


def _kv_fake_quant(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Asymmetric 8-bit fake-quant with zero=128, maxq=255 — the calibration
    path's kv quantizer (reference: quantizer.py:28-32 with kvquant scales)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale) + 128.0, 0.0, 255.0)
    return (scale * (q - 128.0)).astype(x.dtype)


def linear_apply(lin, x: jax.Array, qs: QuantState) -> jax.Array:
    """Apply an fp or packed linear, with the reference QuantLinear's forward
    semantics (reference: quant_linear.py:150-160): optional static act quant,
    on-the-fly weight dequant, fp matmul."""
    if isinstance(lin, PackedLinear):
        if qs.actq and lin.amax is not None:
            x = make_act_quant_fn(lin.act_method, lin.abits)(x, lin.amax)
        if qs.wtq:
            w_kn = dequantize_linear(lin).astype(x.dtype)  # (K, N)
            y = x @ w_kn
        else:
            raise ValueError("PackedLinear has no fp weight; wtq must be on")
        if lin.bias is not None:
            y = y + lin.bias.astype(y.dtype)
        return y
    w = lin["weight"]
    y = jnp.einsum("...k,nk->...n", x, w.astype(x.dtype))
    b = lin.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# block forward
# ---------------------------------------------------------------------------


def causal_mask(s_q: int, s_k: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (1, 1, S_q, S_k)."""
    i = jnp.arange(s_q)[:, None] + (s_k - s_q)
    j = jnp.arange(s_k)[None, :]
    m = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)
    return m[None, None, :, :].astype(dtype)


def llama_attention(
    attn_params,
    x: jax.Array,
    mask: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: LlamaConfig,
    qs: QuantState,
    kv_scales: Optional[KVQuantState] = None,
    collect: Optional[dict] = None,
):
    """Full-sequence attention (calibration / fake-quant eval path).

    Mirrors the reference's patched LlamaAttention forward
    (reference: kvquanter.py:245-351): q/k/v proj -> RoPE -> GQA repeat ->
    q/k/v fake-quant (when calibrated) -> fp attention -> o_proj.
    """
    b, s, d = x.shape
    h, hk, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = linear_apply(attn_params["q_proj"], x, qs)
    k = linear_apply(attn_params["k_proj"], x, qs)
    v = linear_apply(attn_params["v_proj"], x, qs)

    q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)

    q, k = apply_rope(q, k, cos, sin)

    rep = h // hk
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    if collect is not None:
        # post-RoPE absmax stats for kv calibration (min-over-batches happens
        # at the caller; reference: smooth_hooker.py:7-14)
        collect["q_rope"] = q
        collect["k_rope"] = k
        collect["v_rope"] = v

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
        collect["o_proj_inp"] = ctx
    return linear_apply(attn_params["o_proj"], ctx, qs)


def llama_mlp(mlp_params, x: jax.Array, qs: QuantState, collect: Optional[dict] = None) -> jax.Array:
    gate = linear_apply(mlp_params["gate_proj"], x, qs)
    up = linear_apply(mlp_params["up_proj"], x, qs)
    h = jax.nn.silu(gate) * up
    if collect is not None:
        collect["down_proj_inp"] = h
    return linear_apply(mlp_params["down_proj"], h, qs)


def llama_block(
    layer_params,
    x: jax.Array,
    mask: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: LlamaConfig,
    qs: QuantState = QuantState(),
    kv_scales: Optional[KVQuantState] = None,
    collect_stats: bool = False,
):
    """One decoder block.  With ``collect_stats`` the function also returns
    the intermediates the reference gathers with forward hooks
    (reference: smooth_hooker.py:65-99) — the functional replacement for
    hook-based stat capture (SURVEY §7 design translation table)."""
    collect: Optional[dict] = {} if collect_stats else None

    ln1 = rms_norm(x, layer_params["input_layernorm"]["weight"], cfg.rms_norm_eps)
    ln1_bias = layer_params["input_layernorm"].get("bias")
    if ln1_bias is not None:  # meanact fold (reference: smooth.py:77-82)
        ln1 = ln1 + ln1_bias.astype(ln1.dtype)
    if collect is not None:
        collect["attn_ln_out"] = ln1
        collect["qkv_inp"] = ln1
    attn_out = llama_attention(
        layer_params["self_attn"], ln1, mask, cos, sin, cfg, qs, kv_scales, collect
    )
    x = x + attn_out

    ln2 = rms_norm(x, layer_params["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    ln2_bias = layer_params["post_attention_layernorm"].get("bias")
    if ln2_bias is not None:
        ln2 = ln2 + ln2_bias.astype(ln2.dtype)
    if collect is not None:
        collect["mlp_ln_out"] = ln2
        collect["gate_up_inp"] = ln2
    mlp_out = llama_mlp(layer_params["mlp"], ln2, qs, collect)
    x = x + mlp_out

    if collect is not None:
        return x, collect
    return x


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def llama_embed(params, input_ids: jax.Array) -> jax.Array:
    return params["embed_tokens"][input_ids]


def llama_head(params, x: jax.Array, cfg: LlamaConfig) -> jax.Array:
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return jnp.einsum("...k,nk->...n", x, params["lm_head"]["weight"].astype(x.dtype))


def llama_apply(
    params,
    input_ids: jax.Array,
    cfg: LlamaConfig,
    qs: QuantState = QuantState(),
    kv_scales_per_layer=None,
) -> jax.Array:
    """Full forward: (B, S) token ids -> (B, S, V) logits.

    Python loop over layers (layer params may be heterogeneous pytrees after
    partial quantization); XLA still fuses per-layer.  The scan-based engine
    path lives in dgq_tpu/models/engine.py.
    """
    b, s = input_ids.shape
    x = llama_embed(params, input_ids)
    mask = causal_mask(s, s, x.dtype)
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.head_dim, cfg.rope_theta, x.dtype)
    for i, layer in enumerate(params["layers"]):
        kv = None if kv_scales_per_layer is None else kv_scales_per_layer[i]
        x = llama_block(layer, x, mask, cos, sin, cfg, qs, kv)
    return llama_head(params, x, cfg)
