"""Real-quant INT8-dataflow LLaMA engine.

The TPU-native counterpart of the reference's A8W4LlamaForCausalLM
(reference: dgq/models/llama_a8w4.py): activations enter the integer domain
at each RMSNormQ (norm weight pre-divided by the static input scale, output
rounded to int8 — fused.py:27-43), every linear is the fused W4A8 Pallas
GEMM, the KV cache lives in INT8, and requantization happens exactly where
the reference puts it: post-RoPE q/k/v (llama_a8w4.py:113-115), pre-o_proj
(:158), pre-down_proj (:282-284).

Differences from the reference (TPU-first redesign):
  * static-shape ring KV cache (B, Hkv, Smax, Dh) int8 + a current-length
    scalar, instead of torch dynamic concat — XLA requires static shapes
    (SURVEY §7 "hard parts"),
  * layers are stacked pytrees scanned with lax.scan (one compiled block
    body for all layers),
  * GQA is handled by reshaping query heads over kv heads — no materialized
    repeat_kv on the int8 cache.

Engine parameters are converted from a PTQ result by :func:`from_ptq`, the
counterpart of inference_model/from_float (reference: loadutils.py:42-73):
  attn_input_scale = q_proj.amax / 127    out_input_scale  = o_proj.amax/127
  q/k/v_output_scale = kv quantizer scales
  mlp_input_scale  = up_proj.amax / 127   down_input_scale = down_proj.amax/127
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import LlamaConfig, rms_norm, rope_cos_sin, rotate_half
from dgq_tpu.quant.packing import PackedLinear


class EngineLinear(NamedTuple):
    """Span-packed dual-grained linear with a precomputed epilogue alpha.

    ``wscales``/``wzeros`` are the 8x sublane-replicated copies the tiled
    prefill GEMM's dynamic k-block row indexing needs; ``s_hi``..``z_lo``
    are COMPACT per-nibble-plane rows ((G/2, N) int8, even planes = hi
    nibbles) consumed by the plane-dot decode kernels
    (ops/fused_decode.py) — 8x less scale DMA on the bandwidth-bound
    decode path.  None for fp-scale (w4w8-fallback) linears, where the
    fused decode path is disabled."""

    qweight: jax.Array  # (K//2, N) int8, span layout
    wscales: jax.Array  # (8G, N) int8 replicated (fp32 in fp-scale mode)
    wzeros: jax.Array  # (8G, N) int8 replicated
    alpha: jax.Array  # (N,) f32 = wscales8 * input_scale
    bias: Optional[jax.Array]  # (N,) f32 or None
    s_hi: Optional[jax.Array] = None  # (G/2, N) int8 even-plane scales
    s_lo: Optional[jax.Array] = None  # (G/2, N) int8 odd-plane scales
    z_hi: Optional[jax.Array] = None  # (G/2, N) int8 even-plane zeros
    z_lo: Optional[jax.Array] = None  # (G/2, N) int8 odd-plane zeros
    # native-s4 decode path (EngineConfig.int4_mxu): rowpair-shifted packed
    # codes that pltpu.bitcast to the s4 matrix in VMEM with ZERO unpack,
    # plus the x-independent folded colsum*scale correction
    # (ops/fused_decode.pack_rowpair_s4 / rowpair_cs_fold)
    qw_rp: Optional[jax.Array] = None  # (K//2, N) int8 rowpair-shifted
    cs_fold: Optional[jax.Array] = None  # (N,) int32


def f32_out_linear(pl_, input_scale) -> "EngineLinear":
    """Shared PackedLinear -> f32-out EngineLinear conversion for the
    sister-family engines (bloom/mpt/falcon): alpha = wscales8 *
    input_scale, fp bias carried through the epilogue.  (The LLaMA
    from_ptq builds richer linears with plane-dot scale rows itself.)"""
    assert pl_.w4w8 and pl_.span == 2 * pl_.groupsize, (
        "engine conversion needs w4w8 span-packed linears "
        "(quantize with --w4w8 and a groupsize, e.g. 128)"
    )
    return EngineLinear(
        qweight=pl_.qweight,
        wscales=jnp.repeat(pl_.wscales, 8, axis=0),
        wzeros=jnp.repeat(pl_.wzeros, 8, axis=0),
        alpha=pl_.wscales8.astype(jnp.float32) * input_scale.astype(jnp.float32),
        bias=None if pl_.bias is None else pl_.bias.astype(jnp.float32),
    )


class EngineLayer(NamedTuple):
    """One stacked engine layer.

    q/k/v and gate/up are fused along the output dim into single GEMMs —
    they share the same INT8 input and input scale, so concatenating the
    packed weights/scales/alphas is exact and cuts kernel launches from 7 to
    4 per block (q|k|v split at [Nq, Nq+Nkv, Nq+2*Nkv]; gate|up at [F])."""

    ln1_weight: jax.Array  # (D,) f32, pre-divided by attn_input_scale
    ln1_bias: Optional[jax.Array]  # meanact fold (None otherwise)
    ln2_weight: jax.Array  # (D,) f32, pre-divided by mlp_input_scale
    ln2_bias: Optional[jax.Array]
    qkv_proj: EngineLinear  # N = Nq + 2*Nkv
    o_proj: EngineLinear
    gate_up_proj: EngineLinear  # N = 2*F
    down_proj: EngineLinear
    q_scale: jax.Array  # () f32 static post-RoPE scales
    k_scale: jax.Array
    v_scale: jax.Array
    out_input_scale: jax.Array  # () f32
    down_input_scale: jax.Array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["embed_tokens", "layers", "norm_weight", "lm_head"],
    meta_fields=["rms_eps"],
)
@dataclasses.dataclass
class EngineParams:
    embed_tokens: jax.Array  # (V, D)
    layers: EngineLayer  # stacked: every leaf has leading dim L
    norm_weight: jax.Array  # (D,)
    lm_head: jax.Array  # (V, D)
    rms_eps: float = 1e-5


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, Hkv, Dh, Smax) int8 — K stored TRANSPOSED so the
    #               scores matmul contracts without a relayout (ops/attention.py)
    v: jax.Array  # (L, B, Hkv, Smax, Dh) int8
    length: jax.Array  # () int32 tokens already cached


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int, num_layers: Optional[int] = None,
                  kv_bits: int = 8) -> KVCache:
    L = num_layers or cfg.num_hidden_layers
    dh = cfg.head_dim if kv_bits == 8 else cfg.head_dim // 2  # int4: packed
    return KVCache(
        k=jnp.zeros((L, batch, cfg.num_key_value_heads, dh, max_len), jnp.int8),
        v=jnp.zeros((L, batch, cfg.num_key_value_heads, max_len, dh), jnp.int8),
        length=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# conversion from PTQ output
# ---------------------------------------------------------------------------


def _engine_linear_fp(pl: PackedLinear, input_scale: jax.Array) -> EngineLinear:
    """fp-group-scale engine representation: exact for BOTH dual-grained
    (scale = int8_scale * scale8) and plain fallback (fp scale) linears —
    the uniform layout the fp-scale decomposed-dot GEMM consumes."""
    if pl.wbits != 4:
        raise ValueError(
            f"engine requires 4-bit nibble-packed weights, got wbits={pl.wbits}; "
            "wbits>=8 models run via the fake-quant eval path only"
        )
    assert pl.span == 2 * pl.groupsize, "engine requires span-packed weights"
    if pl.w4w8:
        fp_s = pl.wscales.astype(jnp.float32) * pl.wscales8.astype(jnp.float32)[None, :]
    else:
        fp_s = pl.wscales.astype(jnp.float32)
    n = fp_s.shape[-1]
    return EngineLinear(
        qweight=pl.qweight,
        wscales=jnp.repeat(fp_s, 8, axis=0),
        wzeros=jnp.repeat(pl.wzeros.astype(jnp.float32), 8, axis=0),
        alpha=jnp.full((n,), 1.0, jnp.float32) * input_scale.astype(jnp.float32),
        bias=pl.bias,
    )


def _engine_linear(pl: PackedLinear, input_scale: jax.Array) -> EngineLinear:
    assert pl.w4w8 and pl.span == 2 * pl.groupsize, "engine requires span-packed w4w8"
    # scales pre-replicated 8x on sublanes: the kernel's aligned-BlockSpec
    # layout, computed once at conversion instead of per call; plus the
    # compact per-plane rows the plane-dot decode kernels consume
    return EngineLinear(
        qweight=pl.qweight,
        wscales=jnp.repeat(pl.wscales, 8, axis=0),
        wzeros=jnp.repeat(pl.wzeros, 8, axis=0),
        alpha=pl.wscales8.astype(jnp.float32) * input_scale.astype(jnp.float32),
        bias=pl.bias,
        s_hi=pl.wscales[0::2],
        s_lo=pl.wscales[1::2],
        z_hi=pl.wzeros[0::2],
        z_lo=pl.wzeros[1::2],
    )


def _pad_linear_n(lin: EngineLinear, mult: int) -> EngineLinear:
    """Pad the output dim to a multiple of ``mult`` with zero-alpha channels
    (their outputs are exactly 0) — unlocks fatter bn tiles for dims like
    F=11008 that only divide by 256."""
    n = lin.alpha.shape[-1]
    pad = (-n) % mult
    if pad == 0 or n < mult or pad > n // 8:
        return lin  # skip tiny dims / disproportionate padding

    def _pad_n(a, cv=0):
        return None if a is None else jnp.pad(a, ((0, 0), (0, pad)), constant_values=cv)

    return EngineLinear(
        qweight=_pad_n(lin.qweight),
        wscales=_pad_n(lin.wscales, 1),
        wzeros=_pad_n(lin.wzeros),
        alpha=jnp.pad(lin.alpha, (0, pad)),  # zero alpha -> zero output
        bias=None if lin.bias is None else jnp.pad(lin.bias, (0, pad)),
        s_hi=_pad_n(lin.s_hi, 1),
        s_lo=_pad_n(lin.s_lo, 1),
        z_hi=_pad_n(lin.z_hi),
        z_lo=_pad_n(lin.z_lo),
    )


def _pad_linear_k(lin: EngineLinear, mult: int) -> EngineLinear:
    """Pad the input dim to a multiple of ``mult``; callers feed zeros in the
    padded activation channels, so the (garbage) padded weights contribute
    exactly 0.

    The scale-row padding is derived from the actual groupsize (scales are
    stored 8x sublane-replicated, so 8 rows per group), and padding only
    happens in whole spans (pad % 2*groupsize == 0) — a partial span would
    desynchronize the nibble-plane structure the kernel's unpack assumes."""
    k = lin.qweight.shape[0] * 2
    # infer groupsize from the packed layout (same rule as _linear_s8):
    # K = 2 * packed rows, G = replicated scale rows / 8
    groupsize = (k * 8) // lin.wscales.shape[0]
    pad = (-k) % mult
    if pad == 0 or k < mult or pad > k // 8 or pad % (2 * groupsize) != 0:
        return lin
    # pad is a whole number of spans, so hi/lo planes each gain
    # pad/(2*groupsize) rows
    pad_pl = pad // (2 * groupsize)

    def _pad_planes(a, cv=0):
        return None if a is None else jnp.pad(a, ((0, pad_pl), (0, 0)), constant_values=cv)

    return EngineLinear(
        qweight=jnp.pad(lin.qweight, ((0, pad // 2), (0, 0))),
        wscales=jnp.pad(lin.wscales, ((0, 8 * pad // groupsize), (0, 0)), constant_values=1),
        wzeros=jnp.pad(lin.wzeros, ((0, 8 * pad // groupsize), (0, 0))),
        alpha=lin.alpha,
        bias=lin.bias,
        s_hi=_pad_planes(lin.s_hi, 1),
        s_lo=_pad_planes(lin.s_lo, 1),
        z_hi=_pad_planes(lin.z_hi),
        z_lo=_pad_planes(lin.z_lo),
    )


def _fuse_linears(lins: list) -> EngineLinear:
    """Concatenate same-input EngineLinears along the output (N) axis —
    exact, because the packed layout keeps N on the last axis of every
    buffer and alpha/bias are per-output-channel."""
    biases = [l.bias for l in lins]
    if any(b is not None for b in biases):
        bias = jnp.concatenate(
            [b if b is not None else jnp.zeros((l.alpha.shape[0],), jnp.float32)
             for l, b in zip(lins, biases)]
        )
    else:
        bias = None
    def _cat(field):
        vals = [getattr(l, field) for l in lins]
        return None if any(v is None for v in vals) else jnp.concatenate(vals, axis=1)

    return EngineLinear(
        qweight=jnp.concatenate([l.qweight for l in lins], axis=1),
        wscales=jnp.concatenate([l.wscales for l in lins], axis=1),
        wzeros=jnp.concatenate([l.wzeros for l in lins], axis=1),
        alpha=jnp.concatenate([l.alpha for l in lins]),
        bias=bias,
        s_hi=_cat("s_hi"),
        s_lo=_cat("s_lo"),
        z_hi=_cat("z_hi"),
        z_lo=_cat("z_lo"),
    )


def _with_rp(lin: EngineLinear, drop_span: bool = False) -> EngineLinear:
    """Attach the native-s4 decode buffers (rowpair-shifted codes + folded
    colsum correction) to a dual-grained EngineLinear.  Derived data —
    call AFTER padding/fusion so the layouts agree; no-op for fp-scale
    linears (no plane rows => no s4 decode path).

    ``drop_span=True`` releases the span-layout copy (qweight=None): every
    engine path — prefill GEMM, decode GEMVs, XLA fallbacks — consumes the
    rowpair layout, so dual storage would only double weight HBM (a 7B
    model would not fit one v5e with both copies)."""
    if lin.s_hi is None:
        return lin
    if lin.qw_rp is not None:
        return lin._replace(qweight=None) if drop_span else lin
    from dgq_tpu.ops.fused_decode import pack_rowpair_s4, rowpair_cs_fold

    # groupsize from the (possibly stacked) packed layout: K = 2*rows,
    # G = replicated scale rows / 8
    span = 2 * (2 * lin.qweight.shape[-2] * 8) // lin.wscales.shape[-2]
    return lin._replace(
        qw_rp=pack_rowpair_s4(lin.qweight, span),
        cs_fold=rowpair_cs_fold(lin.qweight, span, lin.s_hi, lin.s_lo),
        qweight=None if drop_span else lin.qweight,
    )


def add_rowpair(eng: EngineParams, drop_span: bool = False) -> EngineParams:
    """Populate qw_rp/cs_fold on every layer linear of (possibly stacked)
    EngineParams — used by from_ptq and by checkpoint load for checkpoints
    that predate the native-s4 fields.  ``drop_span`` releases the span
    copies (see _with_rp)."""
    lay = eng.layers
    if lay.qkv_proj.s_hi is None:
        return eng
    if lay.qkv_proj.qw_rp is not None and not drop_span:
        return eng
    lay = lay._replace(
        qkv_proj=_with_rp(lay.qkv_proj, drop_span),
        o_proj=_with_rp(lay.o_proj, drop_span),
        gate_up_proj=_with_rp(lay.gate_up_proj, drop_span),
        down_proj=_with_rp(lay.down_proj, drop_span),
    )
    return dataclasses.replace(eng, layers=lay)


def from_ptq(params, kv_scales, cfg: LlamaConfig, *, pad_to: int = 2048,
             keep_span: bool = False) -> EngineParams:
    """Convert a PTQ result (params with PackedLinear leaves + kv scales)
    into stacked engine params (reference: loadutils.py:57-70 +
    A8W4LlamaForCausalLM.from_float).

    ``pad_to`` pads the MLP's intermediate dim (gate/up outputs, down
    inputs) to a tile-friendly multiple — exact, via zero-alpha output
    channels and zero activation inputs — so decode GEMVs use fat blocks
    (e.g. F=11008 -> 11264 halves the grid-iteration count).

    Models containing w4w8-fallback layers (mixed dual-grained / plain
    fp-group-scale) convert to the uniform fp-scale representation; run them
    with EngineConfig(fp_scales=True) (use from_ptq_auto for the pair)."""
    # mixed dual-grained / fallback models use the uniform fp-scale layout
    all_linears = [
        layer[sub][nm]
        for layer in params["layers"]
        for sub, names in (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
                           ("mlp", ("gate_proj", "up_proj", "down_proj")))
        for nm in names
    ]
    mixed = not all(pl.w4w8 for pl in all_linears)
    make_lin = _engine_linear_fp if mixed else _engine_linear

    per_layer = []
    for li, layer in enumerate(params["layers"]):
        at = layer["self_attn"]
        ml = layer["mlp"]
        attn_input_scale = at["q_proj"].amax.astype(jnp.float32) / 127.0
        out_input_scale = at["o_proj"].amax.astype(jnp.float32) / 127.0
        mlp_input_scale = ml["up_proj"].amax.astype(jnp.float32) / 127.0
        down_input_scale = ml["down_proj"].amax.astype(jnp.float32) / 127.0
        kv = kv_scales[li]
        per_layer.append(
            EngineLayer(
                ln1_weight=layer["input_layernorm"]["weight"].astype(jnp.float32)
                / attn_input_scale,
                ln1_bias=(
                    None
                    if layer["input_layernorm"].get("bias") is None
                    else layer["input_layernorm"]["bias"].astype(jnp.float32) / attn_input_scale
                ),
                ln2_weight=layer["post_attention_layernorm"]["weight"].astype(jnp.float32)
                / mlp_input_scale,
                ln2_bias=(
                    None
                    if layer["post_attention_layernorm"].get("bias") is None
                    else layer["post_attention_layernorm"]["bias"].astype(jnp.float32) / mlp_input_scale
                ),
                qkv_proj=_fuse_linears(
                    [
                        make_lin(at["q_proj"], attn_input_scale),
                        make_lin(at["k_proj"], attn_input_scale),
                        make_lin(at["v_proj"], attn_input_scale),
                    ]
                ),
                o_proj=make_lin(at["o_proj"], out_input_scale),
                gate_up_proj=_fuse_linears(
                    [
                        _pad_linear_n(make_lin(ml["gate_proj"], mlp_input_scale), pad_to // 2),
                        _pad_linear_n(make_lin(ml["up_proj"], mlp_input_scale), pad_to // 2),
                    ]
                ),
                down_proj=_pad_linear_k(
                    make_lin(ml["down_proj"], down_input_scale), pad_to // 2
                ),
                q_scale=kv.q_scale.astype(jnp.float32),
                k_scale=kv.k_scale.astype(jnp.float32),
                v_scale=kv.v_scale.astype(jnp.float32),
                out_input_scale=out_input_scale,
                down_input_scale=down_input_scale,
            )
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    return add_rowpair(EngineParams(
        embed_tokens=params["embed_tokens"],
        layers=stacked,
        norm_weight=params["norm"]["weight"].astype(jnp.float32),
        lm_head=params["lm_head"]["weight"],
        rms_eps=cfg.rms_norm_eps,
    ), drop_span=not keep_span)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rms_norm_q(x: jax.Array, weight_q: jax.Array, eps: float, bias_q=None) -> jax.Array:
    """RMSNormQ: fp norm with pre-scaled weight (+ optional meanact bias),
    round -> int8 (reference: fused.py:34-37)."""
    y = rms_norm(x.astype(jnp.float32), weight_q, eps)
    if bias_q is not None:
        y = y + bias_q
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


# block-shape selection lives in ops/autotune.py (get_blocks) — ONE source
# of truth for the engine, bench.py, and the sweep scripts (VERDICT r1 #5)


def _linear_s8(lin: EngineLinear, x_s8: jax.Array, *, use_kernel: bool, groupsize: int | None = None,
               bm: int = 256, interpret: bool = False, fp_scales: bool = False,
               int4_mxu: bool = False) -> jax.Array:
    """int8 activations -> fp32 output via the fused dequant GEMM."""
    qw_any = lin.qweight if lin.qweight is not None else lin.qw_rp
    if groupsize is None:
        # infer from the packed layout: K = 2 * packed rows, scales arrive
        # 8x-replicated so G = rows/8; groupsize = K / G
        groupsize = (2 * qw_any.shape[0] * 8) // lin.wscales.shape[0]
    m = x_s8.shape[0] * x_s8.shape[1] if x_s8.ndim == 3 else x_s8.shape[0]
    x2 = x_s8.reshape(-1, x_s8.shape[-1])
    # native-s4 (rowpair) GEMM: selected by config, or forced when the span
    # layout was dropped at conversion (rp-only storage)
    use_rp = (lin.qw_rp is not None and not fp_scales
              and (int4_mxu or lin.qweight is None))
    if use_rp:
        from dgq_tpu.ops.autotune import get_blocks
        from dgq_tpu.ops.quant_matmul import (
            w4a8_matmul_rp_pipe, w4a8_matmul_rp_xla,
        )

        n_out = lin.alpha.shape[-1]
        if use_kernel:
            bm_sel, bn, bk = get_blocks(
                m, n_out, x2.shape[-1], groupsize=groupsize, bm_hint=bm
            )
            if bk == -1:  # WRES sentinel has no rp twin; pipe at fat bk
                bk = min(x2.shape[-1], 1024)
            y = w4a8_matmul_rp_pipe(
                x2, lin.qw_rp, lin.wscales, lin.wzeros, lin.alpha, lin.bias,
                groupsize=groupsize, bm=bm_sel, bn=bn, bk=bk,
                interpret=interpret, scales_replicated=True,
            )
        else:
            y = w4a8_matmul_rp_xla(
                x2, lin.qw_rp, lin.wscales[::8], lin.wzeros[::8], lin.alpha,
                lin.bias, groupsize=groupsize,
            )
        return y.reshape(*x_s8.shape[:-1], -1)  # bias fused in epilogue
    if use_kernel:
        from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed

        from dgq_tpu.ops.autotune import get_blocks

        span = 2 * groupsize
        n_out = lin.alpha.shape[-1]
        # fp-scale kernel keeps the caller's bm at prefill (not
        # VMEM-validated for fat-M tiles)
        bm_sel, bn, bk = get_blocks(
            m, n_out, x2.shape[-1], groupsize=groupsize, bm_hint=bm
        )
        if not (fp_scales and m > 32):
            bm = bm_sel
        if fp_scales:
            from dgq_tpu.ops.quant_matmul import w4a8_fpscale_matmul_packed

            y = w4a8_fpscale_matmul_packed(
                x2, lin.qweight, lin.wscales[::8], lin.wzeros[::8], lin.alpha, lin.bias,
                groupsize=groupsize, span=span, bm=bm, bn=bn, bk=span,
                interpret=interpret,
            )
        elif bk == -1:  # autotune.WRES_BK: dequant-once w-resident kernel
            from dgq_tpu.ops.quant_matmul import w4a8_matmul_wres

            y = w4a8_matmul_wres(
                x2, lin.qweight, lin.wscales, lin.wzeros, lin.alpha, lin.bias,
                groupsize=groupsize, span=span, bm=bm, bn=bn,
                interpret=interpret, scales_replicated=True,
            )
        else:
            y = w4a8_matmul_packed(
                x2, lin.qweight, lin.wscales, lin.wzeros, lin.alpha, lin.bias,
                groupsize=groupsize, span=span, bm=bm, bn=bn, bk=bk,
                interpret=interpret, scales_replicated=True,
            )
        if lin.bias is not None:
            y = y.reshape(*x_s8.shape[:-1], -1)
            return y  # bias fused in the kernel epilogue
    else:
        # XLA path: dequant to int8 then dot (golden / CPU tests)
        from dgq_tpu.quant.packing import unpack_nibbles

        codes = unpack_nibbles(lin.qweight, 2 * groupsize).astype(jnp.int32)
        k = codes.shape[0]
        # scales arrive 8x-replicated: each group occupies 8 rows
        if fp_scales:
            scales_k = jnp.repeat(lin.wscales[::8].astype(jnp.float32), groupsize, axis=0)
            zeros_k = jnp.repeat(lin.wzeros[::8].astype(jnp.float32), groupsize, axis=0)
            w_fp = (codes.astype(jnp.float32) - zeros_k) * scales_k
            y = (x2.astype(jnp.float32) @ w_fp) * lin.alpha[None, :]
        else:
            scales_k = jnp.repeat(lin.wscales[::8].astype(jnp.int32), groupsize, axis=0)
            zeros_k = jnp.repeat(lin.wzeros[::8].astype(jnp.int32), groupsize, axis=0)
            w_s8 = ((codes - zeros_k) * scales_k).astype(jnp.int8)
            y = jax.lax.dot_general(
                x2, w_s8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32) * lin.alpha[None, :]
    if lin.bias is not None:
        y = y + lin.bias
    return y.reshape(*x_s8.shape[:-1], -1)


def _requant(x: jax.Array, scale: jax.Array, qmin: float = -128.0) -> jax.Array:
    """round(x/scale) clamped to int8 (reference: llama_a8w4.py:113-115,158)."""
    return jnp.clip(jnp.round(x / scale), qmin, 127.0).astype(jnp.int8)


def _attention_scores(q_s8, kt_s8, q_scale, k_scale, head_dim):
    """q.k^T in the INT8 domain: s8 x s8 -> s32 on the MXU, then one scalar
    rescale.  Numerically identical to the reference's dequantize-then-fp
    matmul (llama_a8w4.py:126-129): (q*sq).(k*sk) == sq*sk*(q.k) exactly —
    but without materializing dequantized fp K (the TPU-native counterpart
    of the reference's INT8 CUTLASS qk BMM, bmm.cu:10).  K arrives
    pre-transposed (B, Hkv, Dh, S)."""
    s32 = jnp.einsum(
        "bhqd,bhdk->bhqk", q_s8, kt_s8, preferred_element_type=jnp.int32
    )
    return s32.astype(jnp.float32) * (q_scale * k_scale / math.sqrt(head_dim))


def from_ptq_auto(params, kv_scales, cfg: LlamaConfig, *, pad_to: int = 2048, **ecfg_kw):
    """(EngineConfig, EngineParams) with fp_scales selected automatically
    for mixed w4w8/fallback models (BASELINE config 3)."""
    mixed = not all(
        layer[sub][nm].w4w8
        for layer in params["layers"]
        for sub, names in (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
                           ("mlp", ("gate_proj", "up_proj", "down_proj")))
        for nm in names
    )
    eng = from_ptq(params, kv_scales, cfg, pad_to=pad_to)
    return EngineConfig(cfg=cfg, fp_scales=mixed, **ecfg_kw), eng


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static knobs for the engine forward."""

    cfg: LlamaConfig
    use_kernel: bool = True  # Pallas GEMM vs XLA fallback
    interpret: bool = False
    bm_prefill: int = 256
    bm_decode: int = 128
    tp_axis: Optional[str] = None  # set under shard_map: psum o_proj/down_proj
    # flash prefill kernel: no SxS score materialization in HBM.  On-TPU A/B
    # at 7B / S=2048 (scripts/ab_flash_prefill.py): identical throughput to
    # the standard path (263 ms, prefill is GEMM-dominated), so the memory
    # win is free — default ON.  Engages only when S and Smax are multiples
    # of 128 (falls back to the standard path otherwise).
    flash_prefill: bool = True
    # fp-scale engine mode (w4w8 fallback layers, BASELINE config 3): group
    # scales are fp32 and every linear runs through the decomposed-dot
    # fp-scale GEMM. from_ptq selects this automatically for mixed models.
    fp_scales: bool = False
    # long-context decode: -1 (AUTO, default) selects the VMEM-bounded
    # chunked kernel automatically once Smax exceeds ~8k (see
    # ops.attention.auto_decode_chunk); >0 forces that chunk size; 0 always
    # keeps the whole per-head cache slice in VMEM (fine to ~8k context)
    decode_attn_chunk: int = -1
    # decode launch fusion (VERDICT r1 #3): collapse norm+GEMV(+requant,
    # +SiLU, +residual) sub-blocks into single pallas_calls at s==1
    # (ops/fused_decode.py).  Falls back per-layer when shapes don't fit.
    fused_decode: bool = True
    # INT8 p @ V in decode attention (the reference attempted and abandoned
    # int8 softmax output, opt_a8w4.py:176-179; here: constant-scale
    # quantization of the unnormalized exp-weights, 1/denom folded into the
    # epilogue — ops/attention._quantize_exp).  V stays int8 in VMEM
    # (4x smaller V tile -> VMEM headroom for long contexts); quality-gated
    # in tests/test_quant_pv.py.  Default ON by round-4 measurement: with
    # the trunc(x+0.5) quantization rule the attention kernel pairs at
    # 0.71-0.83x fp p@V (probe_quant_pv_parts, 5-cycle paired medians) and
    # the full B=8 near-full-cache decode step at 0.99x, never a loss
    # (scripts/ab_quant_pv_step.py).  The round-2 per-row-scale version was
    # 2x slower; round 3 reduced the scale to a constant, round 4 removed
    # the round-half-to-even VPU cost.
    #
    # SCOPE (round 5, VERDICT r4 #1): applies to DECODE and speculative-
    # VERIFY windows on the INT8-KV paths only, with one path-invariant
    # rule — codes quantized against the GLOBAL row max (the chunked and
    # paged kernels run a two-pass for it).  Prefill windows are always fp
    # p @ V whatever their chunking, and INT4-KV paths keep fp p @ V, so
    # every dispatch/storage variant emits identical tokens; gated with
    # quant_pv both ON and OFF in tests/test_path_consistency.py.
    quant_pv: bool = True
    # native-s4 decode GEMVs (ROADMAP round-4 lever #1): weights stored
    # rowpair-shifted so the kernel bitcasts them to s4 in VMEM (zero
    # unpack) and contracts on the int4 MXU path (~2x the int8 operand
    # rate; on-chip probe: 610 vs ~400 G welem/s best-window).  Requires
    # EngineParams converted with the qw_rp/cs_fold buffers (from_ptq
    # default).  Bit-identical to the plane-dot path.
    int4_mxu: bool = True
    # KV-cache precision: 8 (default, reference parity: INT8 KV) or 4 —
    # symmetric INT4 packed two-per-byte along the head dim (ops/kv4.py),
    # HALVING cache memory (2x serving slots / context at equal HBM).
    # Attention then runs the XLA path (unpack is a shift/mask);
    # quality-gated in tests/test_kv4.py.  Scales derive from the
    # calibrated INT8 scales (same absmax on the int4 grid).
    kv_bits: int = 8

    def __hash__(self):
        return hash(
            (self.cfg, self.use_kernel, self.interpret, self.bm_prefill,
             self.bm_decode, self.tp_axis, self.flash_prefill, self.fp_scales,
             self.decode_attn_chunk, self.fused_decode, self.quant_pv,
             self.int4_mxu, self.kv_bits)
        )


def _lin_qw(lin: EngineLinear):
    """Whichever packed weight exists (span layout, or rowpair-only when
    the span copy was dropped at conversion) — same (K//2, N) shape."""
    return lin.qweight if lin.qweight is not None else lin.qw_rp


def _lin_groupsize(lin: EngineLinear) -> int:
    """Groupsize from the packed layout (K = 2*rows, G = scale rows / 8)."""
    return (2 * _lin_qw(lin).shape[0] * 8) // lin.wscales.shape[0]


def _mlp_bf(span: int, fdim: int) -> int:
    """Intermediate-dim block for the fused MLP kernel (multiple of span,
    ~512 columns — the VMEM-validated size)."""
    bf = span * max(1, 512 // span)
    return min(bf, fdim)


def _decode_fusable(layer: EngineLayer) -> bool:
    """Static shape check for the fused decode kernels (ops/fused_decode.py);
    False falls back to the unfused per-op path."""
    gs = _lin_groupsize(layer.qkv_proj)
    span = 2 * gs
    for lin in (layer.qkv_proj, layer.o_proj, layer.gate_up_proj, layer.down_proj):
        if _lin_groupsize(lin) != gs or lin.s_hi is None:
            return False
        k = 2 * _lin_qw(lin).shape[0]
        n = lin.alpha.shape[-1]
        if k % span != 0 or (n % 512 != 0 and n % 128 != 0 and n >= 512):
            return False
    fdim = 2 * _lin_qw(layer.down_proj).shape[0]
    if layer.gate_up_proj.alpha.shape[-1] != 2 * fdim:
        return False
    bf = _mlp_bf(span, fdim)
    return fdim % bf == 0 and bf % span == 0


def _use_fused_rows(ecfg: EngineConfig, layer: EngineLayer, b: int, s: int) -> bool:
    """Gate for the fused decode-launch kernels (VERDICT r1 #3): the fused
    kernels act on independent ROWS, so short multi-token windows (s <= 8 —
    speculative verification) flatten (B, S, D) -> (B*S, D) and ride the
    same kernels as s=1 decode; only attention needs sequence structure.
    Keeps a verify step at ~decode-step cost instead of the unfused path's
    ~160 extra launches.

    Row cap 64: covers 8 serving slots x (spec_k+1)=8 verify rows — the
    round-3 cap of 32 silently dropped 8-slot spec verification onto the
    unfused path (VERDICT r3 #3, the serving+spec regression); VMEM cost
    at 64 rows is ~1 MB of activation scratch."""
    return (s <= 8 and ecfg.use_kernel and not ecfg.fp_scales
            and ecfg.fused_decode and b * s <= 64 and _decode_fusable(layer))


def _use_s4(ecfg: EngineConfig, layer: EngineLayer) -> bool:
    """Gate for the native-s4 decode GEMV kernels: the rowpair buffers must
    exist (from_ptq default; older checkpoints fall back to the plane
    path).  rp-only storage (span copy dropped at conversion) forces the
    s4 path regardless of the config flag — there is no span layout to
    fall back to."""
    qp = layer.qkv_proj
    return qp.qw_rp is not None and (bool(ecfg.int4_mxu) or qp.qweight is None)


def _qkv_rows(ecfg: EngineConfig, layer: EngineLayer, x: jax.Array,
              bm: int, fused: bool) -> jax.Array:
    """(B, S, D) -> qkv projections (B, S, N): fused norm+GEMV row kernel
    or the unfused RMSNormQ + GEMM path.  SHARED by engine._block and the
    serving decode/verify blocks so the numeric paths cannot diverge."""
    cfg = ecfg.cfg
    b, s, d = x.shape
    if fused:
        from dgq_tpu.ops.fused_decode import fused_norm_gemv, fused_norm_gemv_rp

        qp = layer.qkv_proj
        if _use_s4(ecfg, layer):
            return fused_norm_gemv_rp(
                x.reshape(b * s, d), layer.ln1_weight, layer.ln1_bias,
                qp.qw_rp, qp.s_hi, qp.s_lo, qp.z_hi, qp.z_lo, qp.cs_fold,
                qp.alpha, qp.bias,
                span=2 * _lin_groupsize(layer.qkv_proj), eps=cfg.rms_norm_eps,
                interpret=ecfg.interpret,
            ).reshape(b, s, -1)
        return fused_norm_gemv(
            x.reshape(b * s, d), layer.ln1_weight, layer.ln1_bias,
            qp.qweight, qp.s_hi, qp.s_lo, qp.z_hi, qp.z_lo, qp.alpha, qp.bias,
            span=2 * _lin_groupsize(layer.qkv_proj), eps=cfg.rms_norm_eps,
            interpret=ecfg.interpret,
        ).reshape(b, s, -1)
    x_s8 = _rms_norm_q(x, layer.ln1_weight, cfg.rms_norm_eps, layer.ln1_bias)
    return _linear_s8(layer.qkv_proj, x_s8, use_kernel=ecfg.use_kernel, bm=bm,
                      interpret=ecfg.interpret, fp_scales=ecfg.fp_scales,
                      int4_mxu=ecfg.int4_mxu)


def _block_tail(ecfg: EngineConfig, layer: EngineLayer, x: jax.Array,
                ctx: jax.Array, bm: int, fused: bool) -> jax.Array:
    """Attention context -> o_proj (+psum) + residual -> MLP (+psum) +
    residual, fused or unfused.  SHARED by engine._block and the serving
    decode/verify blocks (x, ctx are (B, S, D)-shaped; fused kernels see
    flattened rows)."""
    cfg = ecfg.cfg
    b, s, d = x.shape
    kwl = dict(use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret,
               fp_scales=ecfg.fp_scales, int4_mxu=ecfg.int4_mxu)
    tp = ecfg.tp_axis
    if fused:
        from dgq_tpu.ops.fused_decode import (
            fused_mlp_decode, fused_mlp_decode_rp, fused_requant_gemv,
            fused_requant_gemv_rp,
        )

        s4 = _use_s4(ecfg, layer)

        def _row_csf(csf):
            # row-parallel (K-sharded) linears under TP carry per-rank
            # LOCAL cs_fold rows ((tp, N) per layer, sliced to (1, N) by
            # shard_map — parallel/sharded_engine._localize_row_cs_fold),
            # keeping the rp int32 partials bitwise equal to the plane
            # path's.  A GLOBAL (N,) fold reaching here under TP (params
            # placed without shard_engine_params) would be added once PER
            # RANK and psum-multiplied — add it on rank 0 only (exact).
            if tp is None or csf is None or csf.ndim == 2:
                return csf
            return csf * (jax.lax.axis_index(tp) == 0).astype(jnp.int32)

        op = layer.o_proj
        if s4:
            attn_out = fused_requant_gemv_rp(
                ctx.reshape(b * s, -1), layer.out_input_scale,
                op.qw_rp, op.s_hi, op.s_lo, op.z_hi, op.z_lo,
                _row_csf(op.cs_fold),
                op.alpha, op.bias,
                residual=None if tp is not None else x.reshape(b * s, d),
                span=2 * _lin_groupsize(layer.o_proj), qmin=-127.0,
                fuse_residual=tp is None, interpret=ecfg.interpret,
            ).reshape(b, s, -1)
        else:
            attn_out = fused_requant_gemv(
                ctx.reshape(b * s, -1), layer.out_input_scale,  # llama_a8w4.py:158 clamps -127
                op.qweight, op.s_hi, op.s_lo, op.z_hi, op.z_lo,
                op.alpha, op.bias,
                residual=None if tp is not None else x.reshape(b * s, d),
                span=2 * _lin_groupsize(layer.o_proj), qmin=-127.0,
                fuse_residual=tp is None, interpret=ecfg.interpret,
            ).reshape(b, s, -1)
        if tp is not None:
            x = x + jax.lax.psum(attn_out, tp).astype(x.dtype)
        else:
            x = attn_out.astype(x.dtype)  # residual fused in-kernel

        # ---- mlp: ONE launch (norm + gate/up + SiLU + requant + down) ----
        span_m = 2 * _lin_groupsize(layer.gate_up_proj)
        fdim = 2 * _lin_qw(layer.down_proj).shape[0]
        gu, dn = layer.gate_up_proj, layer.down_proj
        if s4:
            mlp_out = fused_mlp_decode_rp(
                x.reshape(b * s, d), layer.ln2_weight, layer.ln2_bias,
                gu.qw_rp, gu.s_hi, gu.s_lo, gu.z_hi, gu.z_lo, gu.cs_fold,
                gu.alpha,
                layer.down_input_scale,
                dn.qw_rp, dn.wscales, dn.wzeros, _row_csf(dn.cs_fold),
                dn.alpha, dn.bias,
                span=span_m, bf=_mlp_bf(span_m, fdim), eps=cfg.rms_norm_eps,
                fuse_residual=tp is None, interpret=ecfg.interpret,
            ).reshape(b, s, -1)
        else:
            mlp_out = fused_mlp_decode(
                x.reshape(b * s, d), layer.ln2_weight, layer.ln2_bias,
                gu.qweight, gu.s_hi, gu.s_lo, gu.z_hi, gu.z_lo, gu.alpha,
                layer.down_input_scale,
                dn.qweight, dn.wscales, dn.wzeros, dn.alpha, dn.bias,
                span=span_m, bf=_mlp_bf(span_m, fdim), eps=cfg.rms_norm_eps,
                fuse_residual=tp is None, interpret=ecfg.interpret,
            ).reshape(b, s, -1)
        if tp is not None:
            x = x + jax.lax.psum(mlp_out, tp).astype(x.dtype)
        else:
            x = mlp_out.astype(x.dtype)
        return x

    ctx_s8 = _requant(ctx, layer.out_input_scale, qmin=-127.0)  # llama_a8w4.py:158 clamps -127
    attn_out = _linear_s8(layer.o_proj, ctx_s8, **kwl)
    if tp is not None:
        # row-parallel o_proj: all-reduce the fp32 partial sums *after* the
        # per-channel epilogue (int32 psum would overflow the alpha-scaling
        # contract — SURVEY §7 "multi-host INT8 collectives")
        attn_out = jax.lax.psum(attn_out, tp)
    x = x + attn_out.astype(x.dtype)

    # ---- mlp ----
    x_s8 = _rms_norm_q(x, layer.ln2_weight, cfg.rms_norm_eps, layer.ln2_bias)
    gate_up = _linear_s8(layer.gate_up_proj, x_s8, **kwl)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    hidden = jax.nn.silu(gate) * up
    h_s8 = _requant(hidden, layer.down_input_scale)
    mlp_out = _linear_s8(layer.down_proj, h_s8, **kwl)
    if tp is not None:
        mlp_out = jax.lax.psum(mlp_out, tp)
    x = x + mlp_out.astype(x.dtype)
    return x


def _block(ecfg: EngineConfig, layer: EngineLayer, x: jax.Array,
           k_cache, v_cache, cache_len, pos_cos, pos_sin, mask, bm: int,
           decode_window: bool = False):
    """One engine decoder block on (B, S, D) fp activations.

    Returns (x_out, new_k_cache, new_v_cache).  k/v caches are
    (B, Hkv, Smax, Dh) int8; new tokens are written at [cache_len, cache_len+S).

    ``decode_window``: the S > 1 window is a DECODE-side window (speculative
    verification), not prompt prefill.  quant_pv applies to decode/verify
    windows only — prefill always runs fp p @ V, whatever its chunking, so
    whole / chunked / prefix-remainder prefill of the same tokens emit
    identical logits (VERDICT r4 #1 prefix-cache + chunked-prefill breaks).
    """
    cfg = ecfg.cfg
    b, s, d = x.shape
    dh = cfg.head_dim

    # ---- attention ----
    fused = _use_fused_rows(ecfg, layer, b, s)
    qkv = _qkv_rows(ecfg, layer, x, bm, fused)

    # head counts inferred from (possibly tensor-sharded) projection widths,
    # so the same block body runs unsharded and under shard_map TP:
    # N_total = (rep + 2) * hk_local * dh with rep = H // Hkv (static)
    rep_g = cfg.num_attention_heads // cfg.num_key_value_heads
    hk = qkv.shape[-1] // dh // (rep_g + 2)
    h = rep_g * hk
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)

    q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)

    # RoPE in fp (reference: llama_a8w4.py:110-111)
    cos = pos_cos[None, None, :, :]
    sin = pos_sin[None, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    # post-RoPE requant to int8 — the KV cache lives in INT8
    if ecfg.kv_bits == 4:
        # INT4 KV mode (ops/kv4.py): quantize to the int4 grid, pack two
        # values/byte along Dh, attend over the unpacked cache on the XLA
        # path with scale4 folded into the epilogues
        from dgq_tpu.ops.kv4 import (
            KV4_RATIO,
            pack_nibbles,
            quantize_kv4,
            unpack_nibbles,
        )

        q_s8 = _requant(q, layer.q_scale)
        k4 = quantize_kv4(k, layer.k_scale)
        v4 = quantize_kv4(v, layer.v_scale)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, pack_nibbles(k4, axis=-1).transpose(0, 1, 3, 2),
            (0, 0, 0, cache_len))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, pack_nibbles(v4, axis=-1), (0, 0, cache_len, 0))
        rep = h // hk
        k_all = unpack_nibbles(k_cache, axis=2)   # (B, Hkv, Dh, Smax)
        v_all = unpack_nibbles(v_cache, axis=-1)  # (B, Hkv, Smax, Dh)
        qg = q_s8.reshape(b, hk, rep * s, dh)
        scores = _attention_scores(qg, k_all, layer.q_scale,
                                   layer.k_scale * KV4_RATIO, dh)
        scores = scores.reshape(b, hk, rep, s, -1) + mask[None, None, None, :, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        vf = v_all.astype(jnp.float32) * (layer.v_scale * KV4_RATIO)
        ctx = jnp.einsum("bgrqk,bgkd->bgrqd", probs, vf)
        ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(b, s, h * dh)
        x = _block_tail(ecfg, layer, x, ctx, bm, fused)
        return x, k_cache, v_cache

    q_s8 = _requant(q, layer.q_scale)
    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)

    # K cache is stored transposed (B, Hkv, Dh, Smax)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_s8.transpose(0, 1, 3, 2), (0, 0, 0, cache_len)
    )
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_s8, (0, 0, cache_len, 0))

    rep = h // hk
    if s == 1 and ecfg.use_kernel:
        from dgq_tpu.ops.attention import auto_decode_chunk

        smax = k_cache.shape[-1]
        chunk = ecfg.decode_attn_chunk
        if chunk < 0:  # AUTO: VMEM-bounded kernel once Smax outgrows ~8k
            chunk = auto_decode_chunk(smax)
        if chunk and smax > chunk:
            from dgq_tpu.ops.attention import int8_decode_attention_chunked

            ctx = int8_decode_attention_chunked(
                q_s8[:, :, 0, :], k_cache, v_cache, cache_len + 1,
                layer.q_scale, layer.k_scale, layer.v_scale,
                chunk=chunk, interpret=ecfg.interpret, quant_pv=ecfg.quant_pv,
            )
        else:
            from dgq_tpu.ops.attention import int8_decode_attention

            ctx = int8_decode_attention(
                q_s8[:, :, 0, :],  # (B, H, Dh)
                k_cache,
                v_cache,
                cache_len + 1,
                layer.q_scale,
                layer.k_scale,
                layer.v_scale,
                interpret=ecfg.interpret,
                quant_pv=ecfg.quant_pv,
            )  # (B, H, Dh) f32
        ctx = ctx.reshape(b, 1, h * dh)
    elif (ecfg.use_kernel and ecfg.flash_prefill and s > 8
          and not (ecfg.quant_pv and decode_window)
          and k_cache.shape[-1] % 128 == 0):
        # decode/verify windows with quant_pv never ride the fp flash
        # kernel: a spec_k > 7 verification window must still reproduce
        # decode numerics (the fallback below quantizes p @ V for it)
        # short multi-token windows (s <= 8, speculative verification) skip
        # the flash kernel: padding 5 queries to the kernel's 128-row block
        # costs more than the tiny (s, Smax) score materialization below
        # flash prefill: blockwise online softmax, scores never hit HBM.
        # S is auto-padded to the kernel's 128-row query granularity (the
        # pad rows score against valid keys only — the kernel masks
        # j < prompt_len — and are sliced off), so the path engages for ANY
        # prompt length instead of silently materializing (S, Smax) scores
        # when S % 128 != 0 (VERDICT r1 #9).
        from dgq_tpu.ops.attention import int8_prefill_attention

        smax = k_cache.shape[-1]
        sp = -(-s // 128) * 128
        qp = q_s8 if sp == s else jnp.pad(
            q_s8, ((0, 0), (0, 0), (0, sp - s), (0, 0))
        )
        ctx = int8_prefill_attention(
            qp, k_cache, v_cache,
            cache_len + s,  # total valid length
            layer.q_scale, layer.k_scale, layer.v_scale,
            cache_len,  # absolute position of the first query row
            bq=256 if sp % 256 == 0 else 128,
            bkv=256 if smax % 256 == 0 else 128,
            interpret=ecfg.interpret,
        )  # (B, H, Sp, Dh) f32
        ctx = ctx[:, :, :s].transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    else:
        # GQA: fold query-head groups onto kv heads
        qg = q_s8.reshape(b, hk, rep * s, dh)  # (B, Hkv, rep*S, Dh)
        scores = _attention_scores(qg, k_cache, layer.q_scale, layer.k_scale, dh)
        scores = scores.reshape(b, hk, rep, s, -1) + mask[None, None, None, :, :]
        if ecfg.quant_pv and (s == 1 or decode_window):
            # mirror the kernel's INT8 p @ V on the fallback path: constant-
            # scale exp-weight quantization, 1/denom in the epilogue.  The
            # rule is per-ROW (every row's exp(s - m) max is exactly 1), so
            # it applies beyond s == 1 — crucially to the s = k+1
            # speculative-verification windows (decode_window=True), which
            # must reproduce decode numerics or speculation breaks its
            # bitwise greedy-equality contract (tests/test_speculative.py).
            # PREFILL windows of any size stay fp: the same prompt tokens
            # can arrive whole (flash fp), chunked, or as a prefix-cache
            # remainder, and all three must emit identical logits
            # (tests/test_prefix_cache.py, test_serving chunked prefill).
            from dgq_tpu.ops.attention import _quantize_exp

            sf = scores.astype(jnp.float32)
            m = jnp.max(sf, axis=-1, keepdims=True)
            e = jnp.exp(sf - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            qe = _quantize_exp(e)
            acc = jnp.einsum("bgrqk,bgkd->bgrqd", qe, v_cache,
                             preferred_element_type=jnp.int32)
            ctx = acc.astype(jnp.float32) * ((layer.v_scale / 127.0) / denom)
        else:
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            vf = v_cache.astype(jnp.float32) * layer.v_scale
            ctx = jnp.einsum("bgrqk,bgkd->bgrqd", probs, vf)  # (B, Hkv, rep, S, Dh)
        ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(b, s, h * dh)

    x = _block_tail(ecfg, layer, x, ctx, bm, fused)
    return x, k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg", "window"))
def engine_forward(
    ecfg: EngineConfig,
    params: EngineParams,
    input_ids: jax.Array,  # (B, S)
    cache: KVCache,
    *,
    window: str = "auto",
) -> Tuple[jax.Array, KVCache]:
    """Prefill or decode step: runs S tokens starting at cache.length.

    Returns (logits (B, S, V), updated cache).

    ``window`` declares the S > 1 window kind: "prefill" (prompt tokens;
    fp p @ V regardless of quant_pv, so chunked/whole/prefix prefill
    agree), "decode" (speculative-verification window; quant_pv's INT8
    p @ V applies so verification reproduces decode numerics bitwise), or
    "auto" (S == 1 -> decode, S > 1 -> prefill).  Every engine family's
    forward shares this contract (serving/speculative.py passes
    window="decode" on verify windows)."""
    cfg = ecfg.cfg
    b, s = input_ids.shape
    smax = cache.k.shape[4]  # k is (L, B, Hkv, Dh, Smax)
    decode_window = window == "decode" or (window == "auto" and s == 1)
    x = params.embed_tokens[input_ids].astype(jnp.float32)

    positions = cache.length + jnp.arange(s)
    pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, jnp.float32)

    # additive mask over the full cache: key j visible iff j <= cache.length + i
    i = (cache.length + jnp.arange(s))[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)  # (S, Smax)

    bm = ecfg.bm_prefill if s > 8 else ecfg.bm_decode

    def scan_body(x, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        x, k_c, v_c = _block(ecfg, layer, x, k_c, v_c, cache.length, pos_cos, pos_sin, mask, bm,
                             decode_window=decode_window)
        return x, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    x = rms_norm(x, params.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
    logits = jnp.einsum("bsd,vd->bsv", x, params.lm_head.astype(x.dtype))
    new_cache = KVCache(k=new_k, v=new_v, length=cache.length + s)
    return logits, new_cache


@partial(jax.jit, static_argnames=("ecfg", "n"))
def engine_decode_multi(ecfg: EngineConfig, params: EngineParams, tok, cache, n: int):
    """``n`` greedy decode steps in ONE dispatch (statically unrolled).

    Amortizes the per-dispatch cost — dominant through remote/tunneled
    device attachments and non-trivial even locally (the reference pays it
    per CUDA launch instead, SURVEY §3.3).  Params are an argument, never a
    closure capture (captured arrays re-materialize per call).
    Returns (tokens (B, n), next_tok (B, 1), cache)."""
    toks = []
    for _ in range(n):
        logits, cache = engine_forward(ecfg, params, tok, cache)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        toks.append(tok[:, 0])
    return jnp.stack(toks, axis=1), tok, cache


def generate(
    ecfg: EngineConfig,
    params: EngineParams,
    prompt_ids: jax.Array,  # (B, S)
    max_new_tokens: int,
    max_len: int,
    sampling=None,  # Optional[dgq_tpu.serving.sampling.SamplingParams]
    rng_key: Optional[jax.Array] = None,
    decode_unroll: int = 1,
) -> jax.Array:
    """Decode loop (prefill + N steps); greedy by default, or sampled with
    SamplingParams (temperature / top-k / top-p).  ``decode_unroll`` > 1
    batches that many greedy steps per dispatch (greedy only)."""
    from dgq_tpu.serving.sampling import SamplingParams, sample_logits

    sampling = sampling or SamplingParams()
    if not sampling.greedy and rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def pick(lg, key):
        return sample_logits(lg[:, -1, :], sampling, key)

    b, s = prompt_ids.shape
    cache = init_kv_cache(ecfg.cfg, b, max_len, kv_bits=ecfg.kv_bits)
    logits, cache = engine_forward(ecfg, params, prompt_ids, cache)
    key = None
    if not sampling.greedy:
        rng_key, key = jax.random.split(rng_key)
    next_tok = pick(logits, key)
    toks = [next_tok]
    remaining = max_new_tokens - 1
    if sampling.greedy and decode_unroll > 1:
        cols = [jnp.stack(toks, axis=1)]
        tok = next_tok[:, None]
        while remaining > 0:
            n = min(decode_unroll, remaining)
            chunk, tok, cache = engine_decode_multi(ecfg, params, tok, cache, n)
            cols.append(chunk)
            remaining -= n
        return jnp.concatenate(cols, axis=1)
    for _ in range(remaining):
        logits, cache = engine_forward(ecfg, params, next_tok[:, None], cache)
        if not sampling.greedy:
            rng_key, key = jax.random.split(rng_key)
        next_tok = pick(logits, key)
        toks.append(next_tok)
    return jnp.stack(toks, axis=1)
