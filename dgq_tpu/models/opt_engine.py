"""Real-quant INT8-dataflow OPT engine.

TPU-native counterpart of the reference's A8W4OPTForCausalLM
(reference: dgq/models/opt_a8w4.py): LayerNormQ (scale-folded LayerNorm with
bias emitting INT8) -> q/k/v as INT8-OUT fused GEMMs (the W4A8B8O8Linear
path: alpha = input_scale * wscales8 / output_scale, bias folded into the
epilogue pre-rounding; q additionally absorbs the 1/sqrt(dh) scaling into
wscales8/bias, opt_a8w4.py:60-61) -> INT8 q.k^T on the MXU (the CUTLASS
bmm_s8t_s8n_f32t equivalent; alpha = q_scale*k_scale) -> fp32 softmax
(softmax quantization abandoned, comment at opt_a8w4.py:176-179) ->
probs @ dequantized V -> requant (clamp -127, opt_a8w4.py:197) -> out_proj
-> LayerNormQ -> fc1 -> ReLU -> requant (clamp -128, opt_a8w4.py:293) -> fc2.

The KV cache holds the INT8 q/k/v outputs directly (they are already INT8
from the B8O8 projections) — no separate KV quantization step, matching the
reference.  The reference's pad-to-16 hack (opt_a8w4.py:383-405) is
unnecessary: the Pallas GEMM pads M internally to its block size.

Deviation (documented): the reference quantizes qkv biases to int8 with a
per-tensor scale (models/linear.py:43-49); we keep the bias in fp32 inside
the fused epilogue — strictly better numerics, same dataflow.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import EngineLinear, _fuse_linears, _linear_s8
from dgq_tpu.models.opt import OPTConfig
from dgq_tpu.quant.packing import PackedLinear


class OPTEngineLayer(NamedTuple):
    ln1_weight: jax.Array  # (D,) f32, / attn_input_scale
    ln1_bias: jax.Array
    # fused q|k|v, int8 out; per-channel alpha carries each component's own
    # output scale (q additionally absorbs 1/sqrt(dh)) so one GEMM launch
    # replaces three (the reference keeps them separate CUDA kernels,
    # opt_a8w4.py:55-66; on TPU launch count dominates decode)
    qkv_proj: EngineLinear
    out_proj: EngineLinear  # f32 out
    ln2_weight: jax.Array  # / fc1_input_scale
    ln2_bias: jax.Array
    fc1: EngineLinear  # f32 out
    fc2: EngineLinear  # f32 out
    q_scale: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    out_input_scale: jax.Array
    fc2_input_scale: jax.Array


class OPTEngineParams(NamedTuple):
    embed_tokens: jax.Array  # (V, D)
    embed_positions: jax.Array  # (P+2, D)
    layers: OPTEngineLayer  # stacked
    final_ln_weight: jax.Array
    final_ln_bias: jax.Array
    lm_head: jax.Array


class OPTKVCache(NamedTuple):
    k: jax.Array  # (L, B, H, Dh, Smax) int8 transposed
    v: jax.Array  # (L, B, H, Smax, Dh) int8
    length: jax.Array


def init_opt_kv_cache(cfg: OPTConfig, batch: int, max_len: int) -> OPTKVCache:
    L, H, Dh = cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    return OPTKVCache(
        k=jnp.zeros((L, batch, H, Dh, max_len), jnp.int8),
        v=jnp.zeros((L, batch, H, max_len, Dh), jnp.int8),
        length=jnp.zeros((), jnp.int32),
    )


def _int8_out_linear(pl_: PackedLinear, input_scale, output_scale, extra_w8_scale=1.0) -> EngineLinear:
    """W4A8B8O8Linear.from_float equivalent (reference: models/linear.py:39-52):
    alpha = input_scale * wscales8 / output_scale (the reference additionally
    pre-interleaves alpha for the CUTLASS epilogue thread map — a GPU-ism with
    no TPU counterpart); bias lands in the epilogue as bias/output_scale."""
    assert pl_.w4w8 and pl_.span == 2 * pl_.groupsize
    w8 = pl_.wscales8.astype(jnp.float32) * extra_w8_scale
    alpha = input_scale.astype(jnp.float32) * w8 / output_scale
    bias = None
    if pl_.bias is not None:
        bias = pl_.bias.astype(jnp.float32) * extra_w8_scale / output_scale
    return EngineLinear(
        qweight=pl_.qweight,
        wscales=jnp.repeat(pl_.wscales, 8, axis=0),
        wzeros=jnp.repeat(pl_.wzeros, 8, axis=0),
        alpha=alpha, bias=bias,
    )


def _f32_out_linear(pl_: PackedLinear, input_scale) -> EngineLinear:
    assert pl_.w4w8 and pl_.span == 2 * pl_.groupsize
    return EngineLinear(
        qweight=pl_.qweight,
        wscales=jnp.repeat(pl_.wscales, 8, axis=0),
        wzeros=jnp.repeat(pl_.wzeros, 8, axis=0),
        alpha=pl_.wscales8.astype(jnp.float32) * input_scale.astype(jnp.float32),
        bias=None if pl_.bias is None else pl_.bias.astype(jnp.float32),
    )


def from_ptq_opt(params, kv_scales, cfg: OPTConfig) -> OPTEngineParams:
    """inference_model equivalent for OPT (reference: loadutils.py:43-56)."""
    per_layer = []
    scaling = cfg.head_dim**-0.5
    for li, layer in enumerate(params["layers"]):
        at = layer["self_attn"]
        kv = kv_scales[li]
        attn_input_scale = at["q_proj"].amax.astype(jnp.float32) / 127.0
        out_input_scale = at["out_proj"].amax.astype(jnp.float32) / 127.0
        fc1_input_scale = layer["fc1"].amax.astype(jnp.float32) / 127.0
        fc2_input_scale = layer["fc2"].amax.astype(jnp.float32) / 127.0
        q_scale = kv.q_scale.astype(jnp.float32)
        k_scale = kv.k_scale.astype(jnp.float32)
        v_scale = kv.v_scale.astype(jnp.float32)
        per_layer.append(
            OPTEngineLayer(
                ln1_weight=layer["self_attn_layer_norm"]["weight"].astype(jnp.float32)
                / attn_input_scale,
                ln1_bias=layer["self_attn_layer_norm"]["bias"].astype(jnp.float32)
                / attn_input_scale,
                # q absorbs the attention scaling (reference: opt_a8w4.py:60-61)
                qkv_proj=_fuse_linears([
                    _int8_out_linear(at["q_proj"], attn_input_scale, q_scale, scaling),
                    _int8_out_linear(at["k_proj"], attn_input_scale, k_scale),
                    _int8_out_linear(at["v_proj"], attn_input_scale, v_scale),
                ]),
                out_proj=_f32_out_linear(at["out_proj"], out_input_scale),
                ln2_weight=layer["final_layer_norm"]["weight"].astype(jnp.float32)
                / fc1_input_scale,
                ln2_bias=layer["final_layer_norm"]["bias"].astype(jnp.float32)
                / fc1_input_scale,
                fc1=_f32_out_linear(layer["fc1"], fc1_input_scale),
                fc2=_f32_out_linear(layer["fc2"], fc2_input_scale),
                q_scale=q_scale, k_scale=k_scale, v_scale=v_scale,
                out_input_scale=out_input_scale, fc2_input_scale=fc2_input_scale,
            )
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    return OPTEngineParams(
        embed_tokens=params["embed_tokens"],
        embed_positions=params["embed_positions"],
        layers=stacked,
        final_ln_weight=params["final_layer_norm"]["weight"].astype(jnp.float32),
        final_ln_bias=params["final_layer_norm"]["bias"].astype(jnp.float32),
        lm_head=params["lm_head"]["weight"],
    )


def _layer_norm_q(x, weight_q, bias_q, eps):
    """LayerNormQ: fp LN with scale-folded weight/bias, round -> int8
    (reference: fused.py:3-25)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * weight_q + bias_q
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


@dataclasses.dataclass(frozen=True)
class OPTEngineConfig:
    cfg: OPTConfig
    use_kernel: bool = True
    interpret: bool = False
    bm_prefill: int = 256
    bm_decode: int = 128
    tp_axis: Optional[str] = None
    # long-context decode chunking: -1 AUTO / 0 off / >0 manual (mirrors
    # models.engine.EngineConfig.decode_attn_chunk)
    decode_attn_chunk: int = -1
    # KV-cache precision; only 8 is implemented for OPT (the INT4 packed
    # cache is the LLaMA engine's knob, models.engine.EngineConfig.kv_bits)
    kv_bits: int = 8

    def __hash__(self):
        return hash((self.cfg, self.use_kernel, self.interpret, self.bm_prefill,
                     self.bm_decode, self.tp_axis, self.decode_attn_chunk,
                     self.kv_bits))


def _opt_block(ecfg: OPTEngineConfig, layer: OPTEngineLayer, x, k_cache, v_cache, cache_len, mask, bm):
    cfg = ecfg.cfg
    b, s, d = x.shape
    dh = cfg.head_dim

    x_s8 = _layer_norm_q(x, layer.ln1_weight, layer.ln1_bias, cfg.layer_norm_eps)
    kw = dict(use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)
    qkv_s8 = _linear_s8_int8out(layer.qkv_proj, x_s8, **kw)
    q_s8, k_s8, v_s8 = jnp.split(qkv_s8, 3, axis=-1)

    h = q_s8.shape[-1] // dh
    q_s8 = q_s8.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    k_s8 = k_s8.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    v_s8 = v_s8.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_s8.transpose(0, 1, 3, 2), (0, 0, 0, cache_len)
    )
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_s8, (0, 0, cache_len, 0))

    if s == 1 and ecfg.use_kernel:
        from dgq_tpu.ops.attention import auto_decode_chunk, int8_decode_attention

        smax = k_cache.shape[-1]
        chunk = ecfg.decode_attn_chunk
        if chunk < 0:  # AUTO (engine.py dispatch mirror)
            chunk = auto_decode_chunk(smax)
        if chunk and smax > chunk:
            from dgq_tpu.ops.attention import int8_decode_attention_chunked

            ctx = int8_decode_attention_chunked(
                q_s8[:, :, 0, :], k_cache, v_cache, cache_len + 1,
                layer.q_scale, layer.k_scale, layer.v_scale,
                chunk=chunk, apply_sqrt_dh=False,  # scaling absorbed into q
                interpret=ecfg.interpret,
            ).reshape(b, 1, h * dh)
        else:
            ctx = int8_decode_attention(
                q_s8[:, :, 0, :], k_cache, v_cache, cache_len + 1,
                layer.q_scale, layer.k_scale, layer.v_scale,
                apply_sqrt_dh=False,  # scaling absorbed into q
                interpret=ecfg.interpret,
            ).reshape(b, 1, h * dh)
    else:
        # INT8 qk BMM (bmm_s8t_s8n_f32t equivalent), alpha = q_scale*k_scale
        s32 = jnp.einsum("bhqd,bhdk->bhqk", q_s8, k_cache, preferred_element_type=jnp.int32)
        scores = s32.astype(jnp.float32) * (layer.q_scale * layer.k_scale)
        scores = scores + mask[None, None, :, :]
        probs = jax.nn.softmax(scores, axis=-1)
        vf = v_cache.astype(jnp.float32) * layer.v_scale
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vf)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h * dh)

    ctx_s8 = jnp.clip(jnp.round(ctx / layer.out_input_scale), -127, 127).astype(jnp.int8)
    attn_out = _linear_s8(layer.out_proj, ctx_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    x_s8 = _layer_norm_q(x, layer.ln2_weight, layer.ln2_bias, cfg.layer_norm_eps)
    h1 = _linear_s8(layer.fc1, x_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)
    h1 = jax.nn.relu(h1)
    h_s8 = jnp.clip(jnp.round(h1 / layer.fc2_input_scale), -128, 127).astype(jnp.int8)
    out = _linear_s8(layer.fc2, h_s8, use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret)
    if ecfg.tp_axis is not None:
        out = jax.lax.psum(out, ecfg.tp_axis)
    x = x + out.astype(x.dtype)
    return x, k_cache, v_cache


def _linear_s8_int8out(lin: EngineLinear, x_s8, *, use_kernel, bm, interpret, groupsize=None):
    """int8 activations -> int8 output (requantized in the epilogue)."""
    if groupsize is None:
        # infer from the packed layout (K = 2 * packed rows, G = scale rows / 8)
        groupsize = (2 * lin.qweight.shape[0] * 8) // lin.wscales.shape[0]
    m = x_s8.reshape(-1, x_s8.shape[-1]).shape[0]
    x2 = x_s8.reshape(-1, x_s8.shape[-1])
    if use_kernel:
        from dgq_tpu.ops.autotune import get_blocks
        from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed

        span = 2 * groupsize
        n_out = lin.alpha.shape[-1]
        bm, bn, bk = get_blocks(m, n_out, x2.shape[-1], groupsize=groupsize, bm_hint=bm)
        y = w4a8_matmul_packed(
            x2, lin.qweight, lin.wscales, lin.wzeros, lin.alpha, lin.bias,
            groupsize=groupsize, span=span, bm=bm, bn=bn, bk=bk,
            out_dtype=jnp.int8, interpret=interpret, scales_replicated=True,
        )
    else:
        from dgq_tpu.quant.packing import unpack_nibbles

        codes = unpack_nibbles(lin.qweight, 2 * groupsize).astype(jnp.int32)
        scales_k = jnp.repeat(lin.wscales[::8].astype(jnp.int32), groupsize, axis=0)
        zeros_k = jnp.repeat(lin.wzeros[::8].astype(jnp.int32), groupsize, axis=0)
        w_s8 = ((codes - zeros_k) * scales_k).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x2, w_s8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * lin.alpha[None, :]
        if lin.bias is not None:
            y = y + lin.bias[None, :]
        y = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    return y.reshape(*x_s8.shape[:-1], -1)


@partial(jax.jit, static_argnames=("ecfg", "window"))
def opt_engine_forward(
    ecfg: OPTEngineConfig,
    params: OPTEngineParams,
    input_ids: jax.Array,  # (B, S)
    cache: OPTKVCache,
    *,
    window: str = "auto",  # forward-contract parity with engine_forward:
    # declares S > 1 windows prefill vs decode/verify.  This family applies
    # fp p @ V everywhere (quant_pv is LLaMA-engine kv8-scoped), so the
    # flag is accepted for the family-generic speculative contract
    # (serving/speculative.py) and does not alter numerics here.
) -> Tuple[jax.Array, OPTKVCache]:
    cfg = ecfg.cfg
    b, s = input_ids.shape
    smax = cache.k.shape[4]
    tok = params.embed_tokens[input_ids]
    pos = params.embed_positions[cache.length + jnp.arange(s) + 2]
    x = (tok + pos[None, :, :]).astype(jnp.float32)

    i = (cache.length + jnp.arange(s))[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

    bm = ecfg.bm_prefill if s > 8 else ecfg.bm_decode

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _opt_block(ecfg, layer, xc, k_c, v_c, cache.length, mask, bm)
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    x = (xf - mu) * jax.lax.rsqrt(var + cfg.layer_norm_eps) * params.final_ln_weight + params.final_ln_bias
    logits = jnp.einsum("bsd,vd->bsv", x, params.lm_head.astype(x.dtype))
    return logits, OPTKVCache(k=new_k, v=new_v, length=cache.length + s)
