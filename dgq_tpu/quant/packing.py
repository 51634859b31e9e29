"""INT4 nibble packing and the packed-linear checkpoint schema.

The reference packs two 4-bit codes per int8 byte along the flattened
(out, in) weight rows (reference: dgq/quant/quant_linear.py:8-22, 110-144).
Here the packed layout is TPU-native instead: the weight is stored
**input-major** as ``(K//2, N)`` so that

  * ``x (M,K) @ W (K,N)`` hits the MXU with no transpose,
  * N rides the 128-wide lane dimension,
  * K (and therefore the quantization group dim, groupsize 128) rides the
    sublane dimension, so in-kernel unpack is a vectorized shift/mask and the
    per-group scale broadcasts over 64 packed sublanes (SURVEY §7 "packing
    layout must keep the group dim lane-aligned").

Byte layout: ``byte[k2, n] = (code[2*k2, n] << 4) | code[2*k2+1, n]`` — same
high/low nibble order as the reference's python_compress
(reference: quant_linear.py:9-13), transposed to (K, N).

Dual-grained ("w4w8") storage mirrors reference packW4W8
(quant_linear.py:134-144): int8 per-group scale ``wscales``, int8 per-group
zero ``wzeros``, bf16 per-output-channel ``wscales8``; effective fp group
scale = wscales * wscales8.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def pack_nibbles(codes_kn: jax.Array, span: int = 0) -> jax.Array:
    """Pack (K, N) integer codes in [0, 15] into (K//2, N) int8 bytes.

    Two layouts:
      * ``span == 0`` ("pair"): byte k2 packs logical rows (2*k2, 2*k2+1) —
        the reference's adjacent-pair scheme transposed to (K, N).
      * ``span == 2*groupsize`` ("span"): K is cut into spans of ``span``
        rows; within a span, byte row r packs logical row r (high nibble)
        and row r + span/2 (low nibble).  With span = 2*groupsize each nibble
        plane is exactly one quantization group, so the Pallas GEMM unpacks
        with a shift/mask and a sublane concat — no row interleave — and
        broadcasts one (1, N) scale row per plane.
    """
    k, n = codes_kn.shape
    assert k % 2 == 0, f"K={k} must be even to nibble-pack"
    c = codes_kn.astype(jnp.int32)
    if span:
        assert k % span == 0, f"K={k} must be a multiple of span={span}"
        half = span // 2
        cs = c.reshape(k // span, span, n)
        hi = cs[:, :half, :].reshape(k // 2, n)
        lo = cs[:, half:, :].reshape(k // 2, n)
    else:
        hi = c[0::2, :]
        lo = c[1::2, :]
    byte = (hi << 4) | (lo & 0xF)
    return jax.lax.bitcast_convert_type(byte.astype(jnp.uint8), jnp.int8)


def unpack_nibbles(packed: jax.Array, span: int = 0) -> jax.Array:
    """Unpack (K//2, N) int8 bytes into (K, N) int8 codes in [0, 15]."""
    k2, n = packed.shape
    ub = jax.lax.bitcast_convert_type(packed, jnp.uint8).astype(jnp.int32)
    hi = ub >> 4
    lo = ub & 0xF
    if span:
        half = span // 2
        hi_s = hi.reshape(k2 // half, half, n)
        lo_s = lo.reshape(k2 // half, half, n)
        out = jnp.concatenate([hi_s, lo_s], axis=1).reshape(2 * k2, n)
    else:
        out = jnp.stack([hi, lo], axis=1).reshape(2 * k2, n)
    return out.astype(jnp.int8)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qweight", "wscales", "wzeros", "wscales8", "bias", "amax"],
    meta_fields=["in_features", "out_features", "groupsize", "w4w8", "act_method", "abits", "span", "wbits"],
)
@dataclasses.dataclass
class PackedLinear:
    """Quantized-linear state: the functional counterpart of the reference's
    QuantLinear buffers (reference: quant_linear.py:87-93).

    Shapes (K = in_features, N = out_features, G = K // groupsize):
      qweight:  (K//2, N) int8      nibble-packed codes (wbits <= 4), or
                (K, N) uint8/int32  unpacked codes (wbits >= 8, matching the
                                    reference's wbits<8 pack() branch,
                                    quant_linear.py:118-121)
      wscales:  (G, N)              int8 (w4w8) or f32 (plain) group scales
      wzeros:   (G, N)              int8 (w4w8) or f32 (plain) group zeros
      wscales8: (N,) f32 | None     per-output-channel scale (w4w8 only)
      bias:     (N,) f32 | None
      amax:     () f32 | None       static activation absmax (act scale = amax/127)
    """

    qweight: jax.Array
    wscales: jax.Array
    wzeros: jax.Array
    wscales8: Optional[jax.Array]
    bias: Optional[jax.Array]
    amax: Optional[jax.Array]
    in_features: int
    out_features: int
    groupsize: int
    w4w8: bool
    act_method: Optional[str] = "static"
    abits: int = 8
    span: int = 0  # nibble layout: 0 = adjacent-pair, else 2*groupsize span
    wbits: int = 4  # weight bits; >= 8 stores codes unpacked (no nibbles)


def _group_scales_to_k(scales_gn: jax.Array, groupsize: int) -> jax.Array:
    """Broadcast (G, N) group params to (K, N)."""
    g, n = scales_gn.shape
    return jnp.repeat(scales_gn, groupsize, axis=0)


def pack_linear(
    weight_nk: jax.Array,
    scale_flat: jax.Array,
    zero_flat: jax.Array,
    groupsize: int,
    *,
    bias: Optional[jax.Array] = None,
    amax: Optional[jax.Array] = None,
    act_method: str = "static",
    bits: int = 4,
) -> PackedLinear:
    """Plain (non-dual-grained) packing. reference: quant_linear.py:110-121.

    ``scale_flat``/``zero_flat`` are per-(out-row, group) params flattened to
    (N*G,) in the reference's view(-1, groupsize) order.

    ``bits <= 4`` nibble-packs (codes clipped to [0, 2^bits - 1]);
    ``bits >= 8`` stores the codes unpacked, matching the reference's
    wbits >= 8 branch (quant_linear.py:118-121) — uint8 for 8-bit, int32
    for 16-bit.
    """
    if bits not in (2, 3, 4, 8, 16):
        raise ValueError(f"pack_linear: unsupported wbits={bits}")
    n, k = weight_nk.shape
    g = k // groupsize
    # bf16-round the scales exactly like the reference stores them.
    scales = scale_flat.reshape(n, g).astype(jnp.bfloat16).astype(jnp.float32)
    zeros = zero_flat.reshape(n, g).astype(jnp.bfloat16).astype(jnp.float32)
    wg = weight_nk.astype(jnp.float32).reshape(n, g, groupsize)
    codes = jnp.round(wg / scales[:, :, None] + zeros[:, :, None])
    codes = jnp.clip(codes, 0, (1 << bits) - 1)
    codes_kn = codes.reshape(n, k).T  # (K, N)
    if bits >= 8:
        qweight = codes_kn.astype(jnp.uint8 if bits == 8 else jnp.int32)
        span = 0
    else:
        span = 2 * groupsize if k % (2 * groupsize) == 0 else 0
        qweight = pack_nibbles(codes_kn, span)
    return PackedLinear(
        qweight=qweight,
        wscales=scales.T,  # (G, N)
        wzeros=zeros.T,
        wscales8=None,
        bias=None if bias is None else bias.astype(jnp.float32),
        amax=None if amax is None else jnp.asarray(amax, jnp.float32),
        in_features=k,
        out_features=n,
        groupsize=groupsize,
        w4w8=False,
        act_method=act_method,
        span=span,
        wbits=bits,
    )


def pack_linear_w4w8(
    weight_nk: jax.Array,
    scale_flat: jax.Array,
    zero_flat: jax.Array,
    scale8_n: jax.Array,
    groupsize: int,
    *,
    bias: Optional[jax.Array] = None,
    amax: Optional[jax.Array] = None,
    act_method: str = "static",
) -> PackedLinear:
    """Dual-grained packing. reference: quant_linear.py:134-144.

    ``scale_flat`` holds integer-valued group scales (round(s4/s8), >= 1),
    ``zero_flat`` integer-valued zeros, ``scale8_n`` the per-channel fp scale.
    The quantization codes are computed against the *effective* scale
    wscales * bf16(wscales8), matching reference packW4W8's qscales.

    Dual-grained packing is 4-bit by definition (config.py enforces
    w4w8 => wbits == 4).
    """
    n, k = weight_nk.shape
    g = k // groupsize
    iscales = scale_flat.reshape(n, g)  # integer-valued
    izeros = zero_flat.reshape(n, g)
    scale8 = scale8_n.reshape(n).astype(jnp.bfloat16).astype(jnp.float32)
    qscales = iscales * scale8[:, None]  # (N, G) effective fp scale
    wg = weight_nk.astype(jnp.float32).reshape(n, g, groupsize)
    codes = jnp.round(wg / qscales[:, :, None] + izeros[:, :, None])
    # int-range-aware clamp: |code - zero| * iscale must fit int8
    # (reference: quantizer_helper.py:176-183; the reference instead packs the
    # already-clamped fake-quant weight — this clamp makes packing safe for
    # arbitrary inputs too)
    int_max = jnp.floor(127.0 / jnp.maximum(iscales, 1.0))
    upper = jnp.clip(izeros + int_max, None, 15.0)[:, :, None]
    lower = jnp.clip(izeros - int_max, 0.0, None)[:, :, None]
    codes = jnp.clip(jnp.clip(codes, lower, upper), 0, 15)
    codes_kn = codes.reshape(n, k).T
    span = 2 * groupsize if k % (2 * groupsize) == 0 else 0
    return PackedLinear(
        qweight=pack_nibbles(codes_kn, span),
        wscales=iscales.T.astype(jnp.int8),  # (G, N)
        wzeros=izeros.T.astype(jnp.int8),
        wscales8=scale8,
        bias=None if bias is None else bias.astype(jnp.float32),
        amax=None if amax is None else jnp.asarray(amax, jnp.float32),
        in_features=k,
        out_features=n,
        groupsize=groupsize,
        w4w8=True,
        act_method=act_method,
        span=span,
    )


def dequantize_linear(pl: PackedLinear) -> jax.Array:
    """Reconstruct the fp32 weight in (K, N) layout.

    reference: quant_linear.py:97-108 (unpack), transposed to input-major.
    """
    if pl.wbits >= 8:  # unpacked storage (reference wbits>=8 branch)
        codes = pl.qweight.astype(jnp.float32)  # (K, N)
    else:
        codes = unpack_nibbles(pl.qweight, pl.span).astype(jnp.float32)  # (K, N)
    if pl.w4w8:
        scales = pl.wscales.astype(jnp.float32) * pl.wscales8.astype(jnp.float32)[None, :]
    else:
        scales = pl.wscales.astype(jnp.float32)
    zeros = pl.wzeros.astype(jnp.float32)
    scales_k = _group_scales_to_k(scales, pl.groupsize)
    zeros_k = _group_scales_to_k(zeros, pl.groupsize)
    return (codes - zeros_k) * scales_k


def dequantize_to_int8(pl: PackedLinear) -> jax.Array:
    """Dequantize only to the INT8 domain: (codes - zero) * int8_group_scale.

    This is the integer half of the dual-grained factorization — the part the
    fused Pallas GEMM does in VMEM (the fp half, wscales8, moves to the
    per-channel epilogue).  Values are guaranteed to fit int8 by the w4w8
    search's int-range-aware zero clamping
    (reference: quantizer_helper.py:176-183).
    """
    assert pl.w4w8, "int8 dequant path requires dual-grained packing"
    codes = unpack_nibbles(pl.qweight, pl.span).astype(jnp.int32)
    scales_k = _group_scales_to_k(pl.wscales.astype(jnp.int32), pl.groupsize)
    zeros_k = _group_scales_to_k(pl.wzeros.astype(jnp.int32), pl.groupsize)
    return ((codes - zeros_k) * scales_k).astype(jnp.int8)
