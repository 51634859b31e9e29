"""Real-quant INT8-dataflow BLOOM engine.

The reference has NO BLOOM engine (its patched BLOOM forward is broken and
engine conversion raises NotImplementedError — loadutils.py:71-72, SURVEY §7
quirks); this module exceeds the reference: full INT8 dataflow with the
fused Wqkv kept fused through the INT8-out GEMM.

Dataflow per block (mirrors the OPT engine's structure with BLOOM's
architecture):

  LayerNormQ -> fused query_key_value INT8-out GEMM whose per-channel alpha
  carries each interleaved (head, {q,k,v}, dh) component's own output scale
  -> INT8 KV cache (K transposed) -> INT8 q.k^T + ALiBi bias -> fp32 softmax
  -> probs @ dequantized V -> requant -> dense -> LayerNormQ ->
  dense_h_to_4h -> GELU -> requant -> dense_4h_to_h.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.bloom import BloomConfig, alibi_slopes
from dgq_tpu.models.engine import EngineLinear, _linear_s8, f32_out_linear
from dgq_tpu.models.opt_engine import _layer_norm_q, _linear_s8_int8out
from dgq_tpu.quant.packing import PackedLinear


class BloomEngineLayer(NamedTuple):
    ln1_weight: jax.Array
    ln1_bias: jax.Array
    qkv_proj: EngineLinear  # int8 out; interleaved (h, 3, dh) channels
    dense: EngineLinear  # f32 out
    ln2_weight: jax.Array
    ln2_bias: jax.Array
    fc1: EngineLinear  # f32 out
    fc2: EngineLinear  # f32 out
    q_scale: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    dense_input_scale: jax.Array
    fc2_input_scale: jax.Array


class BloomEngineParams(NamedTuple):
    embed_tokens: jax.Array
    emb_ln_weight: jax.Array
    emb_ln_bias: jax.Array
    layers: BloomEngineLayer
    ln_f_weight: jax.Array
    ln_f_bias: jax.Array
    lm_head: jax.Array


class BloomKVCache(NamedTuple):
    k: jax.Array  # (L, B, H, Dh, Smax) int8, transposed
    v: jax.Array  # (L, B, H, Smax, Dh) int8
    length: jax.Array


def init_bloom_kv_cache(cfg: BloomConfig, batch: int, max_len: int) -> BloomKVCache:
    L, H, Dh = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    return BloomKVCache(
        k=jnp.zeros((L, batch, H, Dh, max_len), jnp.int8),
        v=jnp.zeros((L, batch, H, max_len, Dh), jnp.int8),
        length=jnp.zeros((), jnp.int32),
    )


def alibi_int8_attention(ecfg, q_s8, k_cache, v_cache, cache_len, s,
                         q_scale, k_scale, v_scale, slopes, alibi, mask):
    """Attention dispatch shared by the ALiBi engines (BLOOM and MPT):
    s == 1 -> Pallas decode kernel with in-kernel ALiBi; s > 8 on a
    128-multiple cache -> flash prefill with in-kernel ALiBi (no (S, Smax)
    score materialization); otherwise the XLA int8 path.

    q_s8 (B, H, S, Dh) int8; caches (B, H, ...); returns (B, S, H*Dh) f32."""
    b, h, _, dh = q_s8.shape
    smax = k_cache.shape[-1]
    if s == 1 and ecfg.use_kernel:
        from dgq_tpu.ops.attention import int8_decode_attention

        return int8_decode_attention(
            q_s8[:, :, 0, :], k_cache, v_cache, cache_len + 1,
            q_scale, k_scale, v_scale,
            interpret=ecfg.interpret, alibi_slopes=slopes,
        ).reshape(b, 1, h * dh)
    if ecfg.use_kernel and s > 8 and smax % 128 == 0:
        from dgq_tpu.ops.attention import int8_prefill_attention

        sp = -(-s // 128) * 128
        qp = q_s8 if sp == s else jnp.pad(q_s8, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        return int8_prefill_attention(
            qp, k_cache, v_cache, cache_len + s,
            q_scale, k_scale, v_scale, cache_len,
            bq=256 if sp % 256 == 0 else 128,
            bkv=256 if smax % 256 == 0 else 128,
            interpret=ecfg.interpret, alibi_slopes=slopes,
        )[:, :, :s].transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    s32 = jnp.einsum("bhqd,bhdk->bhqk", q_s8, k_cache, preferred_element_type=jnp.int32)
    scores = s32.astype(jnp.float32) * (q_scale * k_scale / math.sqrt(dh))
    scores = scores + alibi[None, :, :, :] + mask[None, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    vf = v_cache.astype(jnp.float32) * v_scale
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vf)
    return ctx.transpose(0, 2, 1, 3).reshape(b, s, h * dh)


def _qkv_int8_out(pl_: PackedLinear, input_scale, q_s, k_s, v_s, cfg: BloomConfig) -> EngineLinear:
    """Fused query_key_value with per-component output scales: the alpha for
    channel n uses q/k/v's scale according to the interleaved (h, 3, dh)
    layout."""
    assert pl_.w4w8 and pl_.span == 2 * pl_.groupsize, (
        "engine conversion needs w4w8 span-packed linears "
        "(quantize with --w4w8 and a groupsize, e.g. 128)"
    )
    h, dh = cfg.num_attention_heads, cfg.head_dim
    out_scales = jnp.stack([q_s, k_s, v_s])  # (3,)
    per_channel_out = jnp.tile(
        jnp.repeat(out_scales, dh)[None, :], (h, 1)
    ).reshape(-1)  # (h*3*dh,) matching the interleave
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


def from_ptq_bloom(params, kv_scales, cfg: BloomConfig) -> BloomEngineParams:
    per_layer = []
    for li, layer in enumerate(params["layers"]):
        at = layer["self_attention"]
        kv = kv_scales[li]
        attn_input_scale = at["query_key_value"].amax.astype(jnp.float32) / 127.0
        dense_input_scale = at["dense"].amax.astype(jnp.float32) / 127.0
        fc1_input_scale = layer["mlp"]["dense_h_to_4h"].amax.astype(jnp.float32) / 127.0
        fc2_input_scale = layer["mlp"]["dense_4h_to_h"].amax.astype(jnp.float32) / 127.0
        per_layer.append(
            BloomEngineLayer(
                ln1_weight=layer["input_layernorm"]["weight"].astype(jnp.float32)
                / attn_input_scale,
                ln1_bias=layer["input_layernorm"]["bias"].astype(jnp.float32)
                / attn_input_scale,
                qkv_proj=_qkv_int8_out(
                    at["query_key_value"], attn_input_scale,
                    kv.q_scale, kv.k_scale, kv.v_scale, cfg,
                ),
                dense=f32_out_linear(at["dense"], dense_input_scale),
                ln2_weight=layer["post_attention_layernorm"]["weight"].astype(jnp.float32)
                / fc1_input_scale,
                ln2_bias=layer["post_attention_layernorm"]["bias"].astype(jnp.float32)
                / fc1_input_scale,
                fc1=f32_out_linear(layer["mlp"]["dense_h_to_4h"], fc1_input_scale),
                fc2=f32_out_linear(layer["mlp"]["dense_4h_to_h"], fc2_input_scale),
                q_scale=kv.q_scale.astype(jnp.float32),
                k_scale=kv.k_scale.astype(jnp.float32),
                v_scale=kv.v_scale.astype(jnp.float32),
                dense_input_scale=dense_input_scale,
                fc2_input_scale=fc2_input_scale,
            )
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    return BloomEngineParams(
        embed_tokens=params["embed_tokens"],
        emb_ln_weight=params["word_embeddings_layernorm"]["weight"].astype(jnp.float32),
        emb_ln_bias=params["word_embeddings_layernorm"]["bias"].astype(jnp.float32),
        layers=stacked,
        ln_f_weight=params["ln_f"]["weight"].astype(jnp.float32),
        ln_f_bias=params["ln_f"]["bias"].astype(jnp.float32),
        lm_head=params["lm_head"]["weight"],
    )


@dataclasses.dataclass(frozen=True)
class BloomEngineConfig:
    cfg: BloomConfig
    use_kernel: bool = True
    interpret: bool = False
    bm_prefill: int = 256
    bm_decode: int = 128
    tp_axis: Optional[str] = None
    # KV-cache precision; only 8 is implemented for BLOOM (INT4 packed KV is
    # the LLaMA engine's knob, models.engine.EngineConfig.kv_bits)
    kv_bits: int = 8

    def __hash__(self):
        return hash((self.cfg, self.use_kernel, self.interpret, self.bm_prefill,
                     self.bm_decode, self.tp_axis, self.kv_bits))


def _bloom_block(ecfg: BloomEngineConfig, layer: BloomEngineLayer, x, k_cache, v_cache,
                 cache_len, mask, alibi, bm):
    cfg = ecfg.cfg
    b, s, d = x.shape
    h, dh = cfg.num_attention_heads, cfg.head_dim

    x_s8 = _layer_norm_q(x, layer.ln1_weight, layer.ln1_bias, cfg.layer_norm_eps)
    qkv_s8 = _linear_s8_int8out(
        layer.qkv_proj, x_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret
    )  # (B, S, h*3*dh) interleaved
    qkv_s8 = qkv_s8.reshape(b, s, h, 3, dh)
    q_s8 = qkv_s8[:, :, :, 0].transpose(0, 2, 1, 3)  # (B, H, S, Dh)
    k_s8 = qkv_s8[:, :, :, 1].transpose(0, 2, 1, 3)
    v_s8 = qkv_s8[:, :, :, 2].transpose(0, 2, 1, 3)

    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_s8.transpose(0, 1, 3, 2), (0, 0, 0, cache_len)
    )
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_s8, (0, 0, cache_len, 0))

    ctx = alibi_int8_attention(
        ecfg, q_s8, k_cache, v_cache, cache_len, s,
        layer.q_scale, layer.k_scale, layer.v_scale,
        alibi_slopes(cfg.num_attention_heads), alibi, mask,
    )

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.dense_input_scale), -127, 127).astype(jnp.int8)
    attn_out = _linear_s8(layer.dense, ctx_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    x_s8 = _layer_norm_q(x, layer.ln2_weight, layer.ln2_bias, cfg.layer_norm_eps)
    h1 = _linear_s8(layer.fc1, x_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)
    h1 = jax.nn.gelu(h1, approximate=True)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -128, 127).astype(jnp.int8)
    out = _linear_s8(layer.fc2, h_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        out = jax.lax.psum(out, ecfg.tp_axis)
    x = x + out.astype(x.dtype)
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg", "window"))
def bloom_engine_forward(
    ecfg: BloomEngineConfig,
    params: BloomEngineParams,
    input_ids: jax.Array,
    cache: BloomKVCache,
    *,
    window: str = "auto",  # forward-contract parity with engine_forward:
    # declares S > 1 windows prefill vs decode/verify.  This family applies
    # fp p @ V everywhere (quant_pv is LLaMA-engine kv8-scoped), so the
    # flag is accepted for the family-generic speculative contract
    # (serving/speculative.py) and does not alter numerics here.
) -> Tuple[jax.Array, BloomKVCache]:
    cfg = ecfg.cfg
    b, s = input_ids.shape
    smax = cache.k.shape[4]
    tok = params.embed_tokens[input_ids].astype(jnp.float32)
    # embedding LayerNorm (fp)
    mu = jnp.mean(tok, axis=-1, keepdims=True)
    var = jnp.mean((tok - mu) ** 2, axis=-1, keepdims=True)
    x = (tok - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps) * params.emb_ln_weight + params.emb_ln_bias

    i = (cache.length + jnp.arange(s))[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

    slopes = alibi_slopes(cfg.num_attention_heads)
    alibi = slopes[:, None, None] * jnp.arange(smax, dtype=jnp.float32)[None, None, :]

    bm = ecfg.bm_prefill if s > 8 else ecfg.bm_decode

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _bloom_block(ecfg, layer, xc, k_c, v_c, cache.length, mask, alibi, bm)
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps) * params.ln_f_weight + params.ln_f_bias
    logits = jnp.einsum("bsd,vd->bsv", x, params.lm_head.astype(x.dtype))
    return logits, BloomKVCache(k=new_k, v=new_v, length=cache.length + s)
