"""INT8-KV attention kernels.

The TPU-native counterpart of the reference's INT8 attention path: the
reference stores the KV cache in INT8 and runs q.k^T through an INT8 CUTLASS
BMM (reference: dgq/models/bmm.cu:10-80, llama_a8w4.py:113-129).  Here the
decode attention is one Pallas kernel per (batch, kv-head): the INT8 K tile
feeds the MXU directly (s8 x s8 -> s32) with the per-tensor q/k scales folded
into one fp multiplier, softmax runs in fp32, and the INT8 V tile is
dequantized in VMEM right before the probs @ V matmul — V never
materializes in fp in HBM.

Cache layout: K is stored transposed, (B, Hkv, Dh, Smax), so the scores
matmul contracts along the last/first dims without a Mosaic relayout; V is
(B, Hkv, Smax, Dh).

The whole per-(b, h) cache slice sits in VMEM (Smax*Dh bytes each for K/V —
at Smax=8192, Dh=128: 1 MB each), so no inner flash loop is needed; the
kernel is HBM-bandwidth-bound on the cache read, which is the decode
optimum.  Longer contexts need the blocked variant (future work, SURVEY §5
long-context row).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize_exp(e):
    """Constant-scale INT8 quantization of flash exp-weights e = exp(s - m).

    The reference attempted (and abandoned) int8 softmax output with a
    global scale (reference: opt_a8w4.py:176-179 comment).  Round 2 retried
    with a per-row scale and measured it 2x slower than fp p @ V — the
    per-row max pass plus two divisions over (rep, Smax) cost more VPU time
    than the V dequant they replaced.  Round 3 observes the per-row scale
    was a constant in disguise: e's row max is EXACTLY 1 (exp(m - m) at the
    max position), so pscale = rowmax(p)/127 == 1/(127*denom) and the codes
    round(p/pscale) == round(127*e).  Quantizing the UNNORMALIZED e with
    the constant scale 1/127 yields the same codes with zero reductions and
    zero divisions — callers fold the 1/denom (whole-cache) or nothing
    (flash chunks, where the combine divides by the accumulated sum) into
    the existing f32 epilogue.  Codes span the full [0, 127] range; the
    worst-case relative error on dominant components stays ~0.4%, and
    p @ V runs s8 x s8 -> s32 on the MXU with V kept int8 (4x VMEM saved
    on the V tile).

    SINGLE source of the quantization rule: the Pallas kernels, the XLA
    goldens and the engine fallback all call this, so the bit-for-bit gate
    in tests/test_quant_pv.py stays meaningful.

    Rounding is trunc(x + 0.5) (round-half-up), not jnp.round: e >= 0 so
    the two agree except on exact .5 ties (round-half-even breaks ties
    down half the time; immaterial for quality, gated the same), and the
    on-chip parts probe (scripts/probe_quant_pv_parts.py) measured
    jnp.round's half-to-even lowering at ~100 us/call of pure VPU time at
    the 7B decode shape -- 2.7x the whole s8 dot -- while add+truncating
    cast is free next to it (162 vs 60 us best-window)."""
    return (e * 127.0 + 0.5).astype(jnp.int8)


def _decode_kernel(
    len_ref,  # SMEM (B,) int32: per-slot valid cache length (incl. current token)
    q_ref,  # (1, 1, rep, Dh) int8
    kt_ref,  # (1, 1, Dh, Smax) int8
    v_ref,  # (1, 1, Smax, Dh) int8
    scale_ref,  # SMEM (3,) f32: qk_scale (= q_scale*k_scale/sqrt(dh)), v_scale
    out_ref,  # (1, 1, rep, Dh) f32
    *,
    quant_pv: bool = False,
    slope_ref=None,  # SMEM (H,) f32 per-QUERY-head ALiBi slopes, or None
):
    rep, dh = q_ref.shape[2], q_ref.shape[3]
    smax = kt_ref.shape[3]
    length = len_ref[pl.program_id(0)]

    q = q_ref[0, 0]  # (rep, Dh) int8
    kt = kt_ref[0, 0]  # (Dh, Smax) int8
    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # (rep, Smax)
    qk_scale = scale_ref[0]
    s = scores.astype(jnp.float32) * qk_scale

    pos = jax.lax.broadcasted_iota(jnp.int32, (rep, smax), 1)
    if slope_ref is not None:
        # ALiBi: slope_h * key position (per-row equivalent to
        # slope*(j-i) by softmax shift-invariance — models/mpt.py:115).
        # Rows are the rep query heads of kv-group program_id(1); slopes
        # arrive per QUERY head, so gather rep of them (static unroll) —
        # correct under GQA, identical to a scalar read when rep == 1.
        g = pl.program_id(1)
        sl = jnp.stack([slope_ref[g * rep + r] for r in range(rep)])[:, None]
        s = s + sl * pos.astype(jnp.float32)
    s = jnp.where(pos < length, s, jnp.finfo(jnp.float32).min)

    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=1, keepdims=True)

    v_scale = scale_ref[1]
    if quant_pv:
        # quantize the UNNORMALIZED exp-weights (row max exactly 1) with the
        # constant scale 1/127; 1/denom folds into the f32 epilogue — no
        # per-row reductions or divisions over (rep, Smax) at all
        qe = _quantize_exp(e)
        acc = jax.lax.dot_general(
            qe, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[0, 0] = acc.astype(jnp.float32) * ((v_scale / 127.0) / denom)
    else:
        p = e / denom  # (rep, Smax) f32
        vf = v_ref[0, 0].astype(jnp.float32) * v_scale  # (Smax, Dh) f32, in VMEM
        out_ref[0, 0] = jax.lax.dot_general(
            p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("interpret", "apply_sqrt_dh", "quant_pv"))
def int8_decode_attention(
    q_s8: jax.Array,  # (B, H, Dh) int8 — current token's quantized queries
    kt_cache: jax.Array,  # (B, Hkv, Dh, Smax) int8
    v_cache: jax.Array,  # (B, Hkv, Smax, Dh) int8
    length: jax.Array,  # () or (B,) int32 — valid tokens per slot
    q_scale: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    *,
    apply_sqrt_dh: bool = True,  # OPT absorbs 1/sqrt(dh) into q (opt_a8w4.py:60-61)
    interpret: bool = False,
    quant_pv: bool = False,  # INT8 p @ V (see _quantize_exp)
    alibi_slopes: Optional[jax.Array] = None,  # (H,) f32 per-QUERY-head ALiBi
) -> jax.Array:
    """Single-token attention over the INT8 cache -> (B, H, Dh) f32."""
    b, h, dh = q_s8.shape
    _, hk, _, smax = kt_cache.shape
    rep = h // hk
    qg = q_s8.reshape(b, hk, rep, dh)
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (b,))

    qk_scale = (q_scale * k_scale).astype(jnp.float32)
    if apply_sqrt_dh:
        qk_scale = qk_scale / math.sqrt(dh)
    scales = jnp.stack([qk_scale, v_scale.astype(jnp.float32), jnp.float32(0)])

    n_prefetch = 2 if alibi_slopes is None else 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,  # length, scales (, alibi slopes)
        grid=(b, hk),
        in_specs=[
            pl.BlockSpec((1, 1, rep, dh), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh, smax), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, smax, dh), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, dh), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
    )

    if alibi_slopes is None:
        def kernel(len_ref, scale_ref, q_ref, kt_ref, v_ref, out_ref):
            _decode_kernel(len_ref, q_ref, kt_ref, v_ref, scale_ref, out_ref,
                           quant_pv=quant_pv)

        operands = (lengths, scales, qg, kt_cache, v_cache)
    else:
        def kernel(len_ref, scale_ref, slope_ref, q_ref, kt_ref, v_ref, out_ref):
            _decode_kernel(len_ref, q_ref, kt_ref, v_ref, scale_ref, out_ref,
                           quant_pv=quant_pv, slope_ref=slope_ref)

        operands = (lengths, scales, alibi_slopes.astype(jnp.float32),
                    qg, kt_cache, v_cache)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hk, rep, dh), jnp.float32),
        interpret=interpret,
    )(*operands)
    return out.reshape(b, h, dh)


def _prefill_kernel(
    plen_ref,  # SMEM (2,) int32: [total valid length, query position offset]
    scale_ref,  # SMEM (3,) f32
    q_ref,  # (1, 1, bq, Dh) int8
    kt_ref,  # (1, 1, Dh, Smax) int8
    v_ref,  # (1, 1, Smax, Dh) int8
    out_ref,  # (1, 1, bq, Dh) f32
    *,
    bkv: int,
    slope_ref=None,  # SMEM (H,) f32 ALiBi slopes (bloom/mpt), or None
):
    bq, dh = q_ref.shape[2], q_ref.shape[3]
    smax = kt_ref.shape[3]
    iq = pl.program_id(2)
    plen = plen_ref[0]
    q0 = plen_ref[1] + iq * bq  # absolute position of this query block
    qk_scale = scale_ref[0]
    v_scale = scale_ref[1]

    q = q_ref[0, 0]  # (bq, Dh) int8
    nkv = smax // bkv
    neg = jnp.finfo(jnp.float32).min

    # STATIC unroll with static slices: the fori_loop + dynamic-slice form
    # compiles ~5x slower through Mosaic (473s vs 99s at 7B shapes); the
    # masked extra work on non-causal blocks is a few percent of the layer.
    m = jnp.full((bq, 1), neg, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)
    for jk in range(nkv):
        k0 = jk * bkv
        kt = kt_ref[0, 0, :, k0 : k0 + bkv]  # (Dh, bkv) int8, static slice
        s32 = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        s = s32.astype(jnp.float32) * qk_scale
        qpos = q0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        kpos = k0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        if slope_ref is not None:
            # ALiBi: slope_h * key position (see _decode_kernel)
            s = s + slope_ref[pl.program_id(1)] * kpos.astype(jnp.float32)
        s = jnp.where((kpos <= qpos) & (kpos < plen), s, neg)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        vf = v_ref[0, 0, k0 : k0 + bkv, :].astype(jnp.float32) * v_scale
        acc = acc * alpha + jax.lax.dot_general(
            p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = m_new
    out_ref[0, 0] = acc / jnp.maximum(l, 1e-20)


@functools.partial(jax.jit, static_argnames=("bq", "bkv", "apply_sqrt_dh", "interpret"))
def int8_prefill_attention(
    q_s8: jax.Array,  # (B, H, S, Dh) int8 post-RoPE quantized queries
    kt_cache: jax.Array,  # (B, Hkv, Dh, Smax) int8 (written for [0, offset+S))
    v_cache: jax.Array,  # (B, Hkv, Smax, Dh) int8
    prompt_len: jax.Array,  # () int32 total valid length (offset + true S)
    q_scale: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    q_offset: jax.Array = None,  # () int32 absolute position of q row 0
    *,
    bq: int = 256,
    bkv: int = 256,
    apply_sqrt_dh: bool = True,
    interpret: bool = False,
    alibi_slopes: Optional[jax.Array] = None,  # (H,) f32 — bloom/mpt ALiBi
) -> jax.Array:
    """Causal flash attention over the INT8 cache -> (B, H, S, Dh) f32.

    Blockwise online softmax in VMEM: scores never materialize at (S, S) in
    HBM (SURVEY §5 long-context row: "blockwise Pallas flash-attention with
    INT8 KV, quant/dequant fused in-kernel").  GQA handled by an index-map
    fold (kv head = query head // rep).
    """
    b, h, s, dh = q_s8.shape
    _, hk, _, smax = kt_cache.shape
    rep = h // hk
    assert s % bq == 0 and smax % bkv == 0, (s, bq, smax, bkv)

    qk = (q_scale * k_scale).astype(jnp.float32)
    if apply_sqrt_dh:
        qk = qk / math.sqrt(dh)
    scales = jnp.stack([qk, v_scale.astype(jnp.float32), jnp.float32(0)])

    n_prefetch = 2 if alibi_slopes is None else 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(b, h, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda i, j, iq, *_: (i, j, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh, smax), lambda i, j, iq, *_: (i, j // rep, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, smax, dh), lambda i, j, iq, *_: (i, j // rep, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dh), lambda i, j, iq, *_: (i, j, iq, 0), memory_space=pltpu.VMEM),
    )

    if alibi_slopes is None:
        def kernel(plen_ref, scale_ref, q_ref, kt_ref, v_ref, out_ref):
            _prefill_kernel(plen_ref, scale_ref, q_ref, kt_ref, v_ref, out_ref, bkv=bkv)

        extra = ()
    else:
        def kernel(plen_ref, scale_ref, slope_ref, q_ref, kt_ref, v_ref, out_ref):
            _prefill_kernel(plen_ref, scale_ref, q_ref, kt_ref, v_ref, out_ref,
                            bkv=bkv, slope_ref=slope_ref)

        extra = (alibi_slopes.astype(jnp.float32),)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, dh), jnp.float32),
        interpret=interpret,
    )(
        jnp.stack([
            jnp.asarray(prompt_len, jnp.int32),
            jnp.zeros((), jnp.int32) if q_offset is None else jnp.asarray(q_offset, jnp.int32),
        ]),
        scales, *extra, q_s8, kt_cache, v_cache,
    )


def int8_prefill_attention_xla(
    q_s8, kt_cache, v_cache, prompt_len, q_scale, k_scale, v_scale, apply_sqrt_dh=True
) -> jax.Array:
    """XLA golden model for the prefill kernel (materializes S x Smax)."""
    b, h, s, dh = q_s8.shape
    _, hk, _, smax = kt_cache.shape
    rep = h // hk
    qk = q_scale * k_scale
    if apply_sqrt_dh:
        qk = qk / math.sqrt(dh)
    qg = q_s8.reshape(b, hk, rep * s, dh)
    s32 = jnp.einsum("bgrd,bgds->bgrs", qg, kt_cache, preferred_element_type=jnp.int32)
    scores = s32.astype(jnp.float32).reshape(b, hk, rep, s, smax) * qk
    qpos = jnp.arange(s)[None, None, None, :, None]
    kpos = jnp.arange(smax)[None, None, None, None, :]
    scores = jnp.where((kpos <= qpos) & (kpos < prompt_len), scores, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(scores, axis=-1)
    vf = v_cache.astype(jnp.float32) * v_scale
    out = jnp.einsum("bgrqs,bgsd->bgrqd", p, vf)
    return out.reshape(b, h, s, dh)


def int8_decode_attention_xla(
    q_s8, kt_cache, v_cache, length, q_scale, k_scale, v_scale,
    apply_sqrt_dh=True, quant_pv=False, alibi_slopes=None,
) -> jax.Array:
    """XLA golden model for the decode kernel (also the use_kernel=False
    engine path; quant_pv mirrors the kernel's INT8 p @ V bit-for-bit;
    alibi_slopes (H,) adds slope*key-position like the kernel's in-kernel
    ALiBi — exact under softmax shift-invariance)."""
    b, h, dh = q_s8.shape
    _, hk, _, smax = kt_cache.shape
    rep = h // hk
    qg = q_s8.reshape(b, hk, rep, dh)
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (b,))
    qk = q_scale * k_scale
    if apply_sqrt_dh:
        qk = qk / math.sqrt(dh)
    s32 = jnp.einsum("bgrd,bgds->bgrs", qg, kt_cache, preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * qk
    pos = jnp.arange(smax)[None, None, None, :]
    if alibi_slopes is not None:
        sl = jnp.asarray(alibi_slopes, jnp.float32).reshape(hk, rep)
        s = s + sl[None, :, :, None] * pos.astype(jnp.float32)
    s = jnp.where(pos < lengths[:, None, None, None], s, jnp.finfo(jnp.float32).min)
    if quant_pv:
        # mirror the kernel: constant-scale quantization of the unnormalized
        # exp-weights, 1/denom folded into the f32 epilogue
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        qe = _quantize_exp(e)
        acc = jnp.einsum("bgrs,bgsd->bgrd", qe, v_cache,
                         preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * ((v_scale / 127.0) / denom)
    else:
        p = jax.nn.softmax(s, axis=-1)
        vf = v_cache.astype(jnp.float32) * v_scale
        out = jnp.einsum("bgrs,bgsd->bgrd", p, vf)
    return out.reshape(b, h, dh)


def _decode_chunk_kernel(
    len_ref,  # SMEM (B,)
    scale_ref,  # SMEM (3,)
    q_ref,  # (1, 1, rep, Dh) int8
    kt_ref,  # (1, 1, Dh, CH) int8 — one cache chunk
    v_ref,  # (1, 1, CH, Dh) int8
    acc_ref,  # (1, 1, rep, Dh) f32 partial numerator
    m_ref,  # (1, 1, rep, 128) f32 partial max (col 0)
    l_ref,  # (1, 1, rep, 128) f32 partial sum (col 0)
    *,
    quant_pv: bool = False,
):
    rep, dh = q_ref.shape[2], q_ref.shape[3]
    ch = kt_ref.shape[3]
    b_idx = pl.program_id(0)
    c_idx = pl.program_id(2)
    length = len_ref[b_idx]
    qk_scale = scale_ref[0]
    v_scale = scale_ref[1]
    neg = jnp.finfo(jnp.float32).min

    q = q_ref[0, 0]
    kt = kt_ref[0, 0]
    s32 = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    s = s32.astype(jnp.float32) * qk_scale
    pos = c_idx * ch + jax.lax.broadcasted_iota(jnp.int32, (rep, ch), 1)
    s = jnp.where(pos < length, s, neg)

    m = jnp.max(s, axis=1, keepdims=True)  # (rep, 1)
    # all-masked chunks: exp(neg - neg) would be 1; pin m to 0 so p = exp(neg) = 0
    m_safe = jnp.where(m <= neg / 2, 0.0, m)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=1, keepdims=True)
    del quant_pv  # fp-only body; quantized p@V rides the two-pass gmax kernels
    vf = v_ref[0, 0].astype(jnp.float32) * v_scale
    acc = jax.lax.dot_general(
        p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[0, 0] = acc
    m_ref[0, 0] = jnp.broadcast_to(m_safe, (rep, 128))
    l_ref[0, 0] = jnp.broadcast_to(l, (rep, 128))


def _chunk_scores(len_ref, scale_ref, q_ref, kt_ref):
    """Shared score body for the chunked/paged decode kernels: int8 MXU
    QK dot, scale, mask by valid length -> (rep, CH) f32.  Positions are
    LOGICAL (program_id(2) is the logical chunk/page), so masking matches
    the contiguous layout bit-for-bit."""
    rep = q_ref.shape[2]
    ch = kt_ref.shape[3]
    length = len_ref[pl.program_id(0)]
    s32 = jax.lax.dot_general(
        q_ref[0, 0], kt_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = s32.astype(jnp.float32) * scale_ref[0]
    pos = pl.program_id(2) * ch + jax.lax.broadcasted_iota(jnp.int32, (rep, ch), 1)
    return jnp.where(pos < length, s, jnp.finfo(jnp.float32).min)


def _chunk_max_kernel(len_ref, scale_ref, q_ref, kt_ref, m_ref):
    """quant_pv pass 1: per-chunk RAW row max (no all-masked pinning — the
    global combine needs the true max; fully-masked rows keep finfo.min,
    which reproduces the whole-cache kernel's exp(s - m) = 1 garbage
    exactly on inactive slots)."""
    rep = q_ref.shape[2]
    s = _chunk_scores(len_ref, scale_ref, q_ref, kt_ref)
    m = jnp.max(s, axis=1, keepdims=True)
    m_ref[0, 0] = jnp.broadcast_to(m, (rep, 128))


def _chunk_pv_kernel(len_ref, scale_ref, gmax_ref, q_ref, kt_ref, v_ref,
                     acc_ref, l_ref):
    """quant_pv pass 2: quantize exp(s - M_row) against the GLOBAL row max
    M (scalar-prefetched), so the codes are bit-identical to the
    whole-cache kernel's (_decode_kernel) — the path-invariance contract
    that keeps chunked/paged decode emitting the dense batcher's tokens
    (VERDICT r4 #1).  With a global max the partials sum directly: no
    online rescale in the combine."""
    rep, dh = q_ref.shape[2], q_ref.shape[3]
    i, j = pl.program_id(0), pl.program_id(1)
    s = _chunk_scores(len_ref, scale_ref, q_ref, kt_ref)
    # static-unrolled SMEM gather of this kv-group's rep row maxima
    gm = jnp.stack([gmax_ref[i, j * rep + r] for r in range(rep)])[:, None]
    e = jnp.exp(s - gm)  # masked positions: exp(neg - M) == 0
    qe = _quantize_exp(e)
    acc32 = jax.lax.dot_general(
        qe, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc_ref[0, 0] = acc32.astype(jnp.float32)
    l_ref[0, 0] = jnp.broadcast_to(jnp.sum(e, axis=1, keepdims=True), (rep, 128))


def auto_decode_chunk(smax: int) -> int:
    """Pick the decode-attention chunk size for a context of ``smax``.

    Returns 0 (whole-cache kernel) up to 8k context — the per-head K+V
    slice plus f32 temporaries stay comfortably inside the ~16 MB VMEM
    budget there — and otherwise the largest chunk in {4096..128} that
    divides ``smax`` (the chunked kernel requires smax % chunk == 0).
    Engine dispatch consults this when EngineConfig.decode_attn_chunk is
    left at its AUTO default, so long contexts select the VMEM-bounded
    kernel without manual knobs (VERDICT r1 #9)."""
    if smax <= 8192:
        return 0
    for c in (4096, 2048, 1024, 512, 256, 128):
        if smax % c == 0:
            return c
    return 0  # odd smax: whole-cache kernel (caller may still OOM VMEM)


@functools.partial(jax.jit, static_argnames=("chunk", "apply_sqrt_dh", "interpret", "quant_pv"))
def int8_decode_attention_chunked(
    q_s8: jax.Array,  # (B, H, Dh) int8
    kt_cache: jax.Array,  # (B, Hkv, Dh, Smax) int8
    v_cache: jax.Array,  # (B, Hkv, Smax, Dh) int8
    length: jax.Array,
    q_scale: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    *,
    chunk: int = 2048,
    apply_sqrt_dh: bool = True,
    interpret: bool = False,
    quant_pv: bool = False,  # INT8 p @ V, GLOBAL-row-max codes (two-pass)
) -> jax.Array:
    """Long-context decode attention: the cache is processed in
    VMEM-bounded chunks (grid over chunks), each emitting flash partials
    (numerator, row max, row sum) that combine exactly outside the kernel
    via logsumexp merging.  Extends the INT8 decode path beyond
    VMEM-resident context lengths (SURVEY §5 long-context row).

    quant_pv runs TWO passes (max, then quantize+dot) so the int8
    exp-weight codes use the global row max — bit-identical to the
    whole-cache kernel and the dense XLA golden.  Per-chunk quantization
    before the online rescale would emit different codes per dispatch
    path and break the framework's cross-path exactness contracts
    (VERDICT r4 #1)."""
    b, h, dh = q_s8.shape
    _, hk, _, smax = kt_cache.shape
    rep = h // hk
    assert smax % chunk == 0, (smax, chunk)
    nc = smax // chunk
    qg = q_s8.reshape(b, hk, rep, dh)
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (b,))

    qk = (q_scale * k_scale).astype(jnp.float32)
    if apply_sqrt_dh:
        qk = qk / math.sqrt(dh)
    scales = jnp.stack([qk, v_scale.astype(jnp.float32), jnp.float32(0)])

    q_spec = pl.BlockSpec((1, 1, rep, dh), lambda i, j, c, *_: (i, j, 0, 0), memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((1, 1, dh, chunk), lambda i, j, c, *_: (i, j, 0, c), memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, chunk, dh), lambda i, j, c, *_: (i, j, c, 0), memory_space=pltpu.VMEM)
    part_spec = lambda w: pl.BlockSpec((1, 1, rep, w), lambda i, j, c, *_: (i * nc + c, j, 0, 0), memory_space=pltpu.VMEM)

    if quant_pv:
        # two-pass global-max quantized p @ V: pass 1 streams K again for
        # the true per-row max (scores are int8 MXU dots — the re-read is
        # the price of code-level path invariance vs the whole-cache
        # kernel), pass 2 quantizes exp(s - M) and the int32 partials sum
        # directly (no online rescale).
        m = pl.pallas_call(
            _chunk_max_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2, grid=(b, hk, nc),
                in_specs=[q_spec, kt_spec], out_specs=part_spec(128),
            ),
            out_shape=jax.ShapeDtypeStruct((b * nc, hk, rep, 128), jnp.float32),
            interpret=interpret,
        )(lengths, scales, qg, kt_cache)
        m = m.reshape(b, nc, hk, rep, 128)[..., 0]  # (B, nc, Hkv, rep)
        gmax = jnp.max(m, axis=1).reshape(b, hk * rep)  # (B, Hkv*rep)

        acc, l = pl.pallas_call(
            _chunk_pv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3, grid=(b, hk, nc),
                in_specs=[q_spec, kt_spec, v_spec],
                out_specs=(part_spec(dh), part_spec(128)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b * nc, hk, rep, dh), jnp.float32),
                jax.ShapeDtypeStruct((b * nc, hk, rep, 128), jnp.float32),
            ),
            interpret=interpret,
        )(lengths, scales, gmax, qg, kt_cache, v_cache)
        acc = acc.reshape(b, nc, hk, rep, dh)
        l = l.reshape(b, nc, hk, rep, 128)[..., :1]
        num = jnp.sum(acc, axis=1) * (jnp.asarray(v_scale, jnp.float32) / 127.0)
        den = jnp.sum(l, axis=1)
        out = num / jnp.maximum(den, 1e-20)
        return out.reshape(b, h, dh)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hk, nc),
        in_specs=[q_spec, kt_spec, v_spec],
        out_specs=(part_spec(dh), part_spec(128), part_spec(128)),
    )

    acc, m, l = pl.pallas_call(
        _decode_chunk_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * nc, hk, rep, dh), jnp.float32),
            jax.ShapeDtypeStruct((b * nc, hk, rep, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * nc, hk, rep, 128), jnp.float32),
        ),
        interpret=interpret,
    )(lengths, scales, qg, kt_cache, v_cache)

    acc = acc.reshape(b, nc, hk, rep, dh)
    m = m.reshape(b, nc, hk, rep, 128)[..., :1]
    l = l.reshape(b, nc, hk, rep, 128)[..., :1]

    m_glob = jnp.max(m, axis=1, keepdims=True)  # (B, 1, Hkv, rep, 1)
    w = jnp.exp(m - m_glob)  # per-chunk weight
    num = jnp.sum(acc * w, axis=1)  # (B, Hkv, rep, Dh)
    den = jnp.sum(l * w, axis=1)  # (B, Hkv, rep, 1)
    out = num / jnp.maximum(den, 1e-20)
    return out.reshape(b, h, dh)

# -- paged KV cache attention -------------------------------------------------
#
# vLLM-style paged KV for serving (no reference counterpart — the reference
# allocates a contiguous cache per sequence, llama_a8w4.py:117-120; the
# serving layer here sizes the pool by TOTAL tokens, not slots x Smax, and
# shares prompt-prefix pages between slots).  TPU-native mechanism: the page
# table rides PrefetchScalarGridSpec, so each grid step's BlockSpec index_map
# dereferences table[slot, logical_page] and the kernel body is IDENTICAL to
# the chunked decode kernel — same int8 MXU scores, same flash partials,
# same logsumexp combine.  Unallocated logical pages point at the reserved
# null page 0 and are fully masked by the length test.


@functools.partial(
    jax.jit, static_argnames=("apply_sqrt_dh", "interpret", "quant_pv")
)
def int8_paged_decode_attention(
    q_s8: jax.Array,  # (B, H, Dh) int8
    kt_pool: jax.Array,  # (P, Hkv, Dh, ps) int8 — shared page pool, K transposed
    v_pool: jax.Array,  # (P, Hkv, ps, Dh) int8
    table: jax.Array,  # (B, NP) int32 — physical page per (slot, logical page)
    length: jax.Array,  # () or (B,) int32
    q_scale: jax.Array,
    k_scale: jax.Array,
    v_scale: jax.Array,
    *,
    apply_sqrt_dh: bool = True,
    interpret: bool = False,
    quant_pv: bool = False,
) -> jax.Array:
    """Decode attention over a paged INT8 KV pool -> (B, H, Dh) f32.

    Grid (B, Hkv, NP); logical page c of slot i streams physical page
    table[i, c] into VMEM via the scalar-prefetched index map.  Each page
    emits flash partials (numerator, row max, row sum) exactly like
    int8_decode_attention_chunked; the combine is shared."""
    b, h, dh = q_s8.shape
    _, hk, _, ps = kt_pool.shape
    npg = table.shape[1]
    rep = h // hk
    qg = q_s8.reshape(b, hk, rep, dh)
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (b,))

    qk = (q_scale * k_scale).astype(jnp.float32)
    if apply_sqrt_dh:
        qk = qk / math.sqrt(dh)
    scales = jnp.stack([qk, v_scale.astype(jnp.float32), jnp.float32(0)])

    q_spec = pl.BlockSpec((1, 1, rep, dh), lambda i, j, c, *_: (i, j, 0, 0), memory_space=pltpu.VMEM)

    def kt_spec(n_pre):
        # the page table is always the LAST prefetch operand; n_pre pins arity
        return pl.BlockSpec(
            (1, 1, dh, ps),
            lambda i, j, c, *pre: (pre[n_pre - 1][i, c], j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def v_spec(n_pre):
        return pl.BlockSpec(
            (1, 1, ps, dh),
            lambda i, j, c, *pre: (pre[n_pre - 1][i, c], j, 0, 0),
            memory_space=pltpu.VMEM,
        )

    part_spec = lambda w: pl.BlockSpec((1, 1, rep, w), lambda i, j, c, *_: (i * npg + c, j, 0, 0), memory_space=pltpu.VMEM)
    tbl = table.astype(jnp.int32)

    if quant_pv:
        # two-pass global-max quantized p @ V (see int8_decode_attention_
        # chunked): codes match the whole-cache kernel and the dense XLA
        # golden bit-for-bit, so paged serving emits the dense batcher's
        # tokens with quant_pv on (VERDICT r4 #1).
        def max_kernel(len_ref, scale_ref, tbl_ref, q_ref, kt_ref, m_ref):
            _chunk_max_kernel(len_ref, scale_ref, q_ref, kt_ref, m_ref)

        m = pl.pallas_call(
            max_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3, grid=(b, hk, npg),
                in_specs=[q_spec, kt_spec(3)], out_specs=part_spec(128),
            ),
            out_shape=jax.ShapeDtypeStruct((b * npg, hk, rep, 128), jnp.float32),
            interpret=interpret,
        )(lengths, scales, tbl, qg, kt_pool)
        m = m.reshape(b, npg, hk, rep, 128)[..., 0]
        gmax = jnp.max(m, axis=1).reshape(b, hk * rep)

        def pv_kernel(len_ref, scale_ref, gmax_ref, tbl_ref, q_ref, kt_ref,
                      v_ref, acc_ref, l_ref):
            _chunk_pv_kernel(len_ref, scale_ref, gmax_ref, q_ref, kt_ref,
                             v_ref, acc_ref, l_ref)

        acc, l = pl.pallas_call(
            pv_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4, grid=(b, hk, npg),
                in_specs=[q_spec, kt_spec(4), v_spec(4)],
                out_specs=(part_spec(dh), part_spec(128)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b * npg, hk, rep, dh), jnp.float32),
                jax.ShapeDtypeStruct((b * npg, hk, rep, 128), jnp.float32),
            ),
            interpret=interpret,
        )(lengths, scales, gmax, tbl, qg, kt_pool, v_pool)
        acc = acc.reshape(b, npg, hk, rep, dh)
        l = l.reshape(b, npg, hk, rep, 128)[..., :1]
        num = jnp.sum(acc, axis=1) * (jnp.asarray(v_scale, jnp.float32) / 127.0)
        den = jnp.sum(l, axis=1)
        out = num / jnp.maximum(den, 1e-20)
        return out.reshape(b, h, dh)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lengths, scales, page table
        grid=(b, hk, npg),
        in_specs=[q_spec, kt_spec(3), v_spec(3)],
        out_specs=(part_spec(dh), part_spec(128), part_spec(128)),
    )

    def kernel(len_ref, scale_ref, tbl_ref, q_ref, kt_ref, v_ref, acc_ref, m_ref, l_ref):
        # body == chunked decode kernel: program_id(2) is the LOGICAL page,
        # so pos = c*ps + iota masks exactly as the contiguous layout does
        _decode_chunk_kernel(
            len_ref, scale_ref, q_ref, kt_ref, v_ref, acc_ref, m_ref, l_ref,
        )

    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * npg, hk, rep, dh), jnp.float32),
            jax.ShapeDtypeStruct((b * npg, hk, rep, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * npg, hk, rep, 128), jnp.float32),
        ),
        interpret=interpret,
    )(lengths, scales, tbl, qg, kt_pool, v_pool)

    acc = acc.reshape(b, npg, hk, rep, dh)
    m = m.reshape(b, npg, hk, rep, 128)[..., :1]
    l = l.reshape(b, npg, hk, rep, 128)[..., :1]
    m_glob = jnp.max(m, axis=1, keepdims=True)
    w = jnp.exp(m - m_glob)
    num = jnp.sum(acc * w, axis=1)
    den = jnp.sum(l * w, axis=1)
    out = num / jnp.maximum(den, 1e-20)
    return out.reshape(b, h, dh)


def gather_paged_kv(kt_pool, v_pool, table):
    """Densify a paged pool: (B, Hkv, Dh, NP*ps) K-transposed and
    (B, Hkv, NP*ps, Dh) V, in logical-position order."""
    b, npg = table.shape
    _, hk, dh, ps = kt_pool.shape
    kt = kt_pool[table]  # (B, NP, Hkv, Dh, ps)
    kt = kt.transpose(0, 2, 3, 1, 4).reshape(b, hk, dh, npg * ps)
    v = v_pool[table]  # (B, NP, Hkv, ps, Dh)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, hk, npg * ps, dh)
    return kt, v


def _decode_chunk_kernel_kv4(
    len_ref,  # SMEM (B,)
    scale_ref,  # SMEM (3,)
    tbl_ref,  # SMEM (B, NP) — consumed by the index maps only
    q_ref,  # (1, 1, rep, Dh) int8 — PERMUTED: [:, :Dh/2]=even dims, [:, Dh/2:]=odd
    kt_ref,  # (1, 1, Dh/2, CH) int8 nibble-packed along Dh
    v_ref,  # (1, 1, CH, Dh/2) int8 nibble-packed along Dh
    acc_ref,  # (1, 1, rep, Dh) f32 partial numerator, [lo | hi] halves
    m_ref,
    l_ref,
):
    """Flash-partial body over ONE INT4 nibble page.

    No in-kernel interleave: pack_nibbles put even Dh indices in the low
    nibble and odd in the high nibble, so with q pre-permuted to
    [even | odd] the score contraction splits exactly:
        q . K = q_even . K_lo + q_odd . K_hi
    and p@V emits [ctx_even | ctx_odd] halves the caller re-interleaves —
    two MXU dots per plane instead of a sublane shuffle."""
    rep, dh = q_ref.shape[2], q_ref.shape[3]
    dh2 = dh // 2
    ch = kt_ref.shape[3]
    b_idx = pl.program_id(0)
    c_idx = pl.program_id(2)
    length = len_ref[b_idx]
    qk_scale = scale_ref[0]
    v_scale = scale_ref[1]
    neg = jnp.finfo(jnp.float32).min

    q = q_ref[0, 0]
    # widen to int32 before the nibble split: Mosaic does not legalize
    # vector shifts on int8 (arith.shli on i8 fails on real TPUs; interpret
    # mode accepts it) — int32 mask/xor sign-extension compiles everywhere
    kt = kt_ref[0, 0].astype(jnp.int32)
    kt_lo = (((kt & 0xF) ^ 8) - 8).astype(jnp.int8)  # sign-extended low nibble
    kt_hi = (kt >> 4).astype(jnp.int8)  # int8->int32 sign-extended, so >>4 is signed
    s32 = jax.lax.dot_general(
        q[:, :dh2], kt_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ) + jax.lax.dot_general(
        q[:, dh2:], kt_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    stf = s32.astype(jnp.float32) * qk_scale
    pos = c_idx * ch + jax.lax.broadcasted_iota(jnp.int32, (rep, ch), 1)
    stf = jnp.where(pos < length, stf, neg)

    m = jnp.max(stf, axis=1, keepdims=True)
    m_safe = jnp.where(m <= neg / 2, 0.0, m)
    pr = jnp.exp(stf - m_safe)
    l = jnp.sum(pr, axis=1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.int32)
    v_lo = (((v & 0xF) ^ 8) - 8).astype(jnp.float32) * v_scale  # (CH, Dh/2)
    v_hi = (v >> 4).astype(jnp.float32) * v_scale
    acc_lo = jax.lax.dot_general(
        pr, v_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_hi = jax.lax.dot_general(
        pr, v_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    acc_ref[0, 0, :, :dh2] = acc_lo
    acc_ref[0, 0, :, dh2:] = acc_hi
    m_ref[0, 0] = jnp.broadcast_to(m_safe, (rep, 128))
    l_ref[0, 0] = jnp.broadcast_to(l, (rep, 128))


@functools.partial(
    jax.jit, static_argnames=("apply_sqrt_dh", "interpret")
)
def int4_paged_decode_attention(
    q_s8: jax.Array,  # (B, H, Dh) int8 (UNPERMUTED)
    kt_pool: jax.Array,  # (P, Hkv, Dh//2, ps) int8 nibble pages (K transposed)
    v_pool: jax.Array,  # (P, Hkv, ps, Dh//2) int8 nibble pages
    table: jax.Array,  # (B, NP) int32
    length: jax.Array,
    q_scale: jax.Array,
    k_scale4: jax.Array,  # EFFECTIVE int4 scale (k_scale8 * KV4_RATIO)
    v_scale4: jax.Array,
    *,
    apply_sqrt_dh: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Paged decode attention over INT4 nibble pages -> (B, H, Dh) f32.

    Same grid/prefetch structure as int8_paged_decode_attention; pages
    stream PACKED into VMEM (half the bytes of the INT8 pool — the memory-
    bandwidth win rides into the kernel, not just HBM residency)."""
    b, h, dh = q_s8.shape
    _, hk, dh2, ps = kt_pool.shape
    assert 2 * dh2 == dh, (q_s8.shape, kt_pool.shape)
    npg = table.shape[1]
    rep = h // hk
    # q permuted to [even dims | odd dims] to match the nibble planes
    q_perm = jnp.concatenate([q_s8[..., 0::2], q_s8[..., 1::2]], axis=-1)
    qg = q_perm.reshape(b, hk, rep, dh)
    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32), (b,))

    qk = (q_scale * k_scale4).astype(jnp.float32)
    if apply_sqrt_dh:
        qk = qk / math.sqrt(dh)
    scales = jnp.stack([qk, v_scale4.astype(jnp.float32), jnp.float32(0)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, hk, npg),
        in_specs=[
            pl.BlockSpec((1, 1, rep, dh), lambda i, j, c, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, dh2, ps),
                lambda i, j, c, len_ref, scale_ref, tbl_ref: (tbl_ref[i, c], j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, ps, dh2),
                lambda i, j, c, len_ref, scale_ref, tbl_ref: (tbl_ref[i, c], j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, rep, dh), lambda i, j, c, *_: (i * npg + c, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rep, 128), lambda i, j, c, *_: (i * npg + c, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rep, 128), lambda i, j, c, *_: (i * npg + c, j, 0, 0), memory_space=pltpu.VMEM),
        ),
    )

    acc, m, l = pl.pallas_call(
        _decode_chunk_kernel_kv4,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * npg, hk, rep, dh), jnp.float32),
            jax.ShapeDtypeStruct((b * npg, hk, rep, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * npg, hk, rep, 128), jnp.float32),
        ),
        interpret=interpret,
    )(lengths, scales, table.astype(jnp.int32), qg, kt_pool, v_pool)

    acc = acc.reshape(b, npg, hk, rep, dh)
    m = m.reshape(b, npg, hk, rep, 128)[..., :1]
    l = l.reshape(b, npg, hk, rep, 128)[..., :1]
    m_glob = jnp.max(m, axis=1, keepdims=True)
    w = jnp.exp(m - m_glob)
    num = jnp.sum(acc * w, axis=1)
    den = jnp.sum(l * w, axis=1)
    out = num / jnp.maximum(den, 1e-20)  # (B, hk, rep, Dh) in [lo | hi] order
    # re-interleave: out[..., :Dh/2] are even dims, out[..., Dh/2:] odd
    out = jnp.stack([out[..., :dh2], out[..., dh2:]], axis=-1).reshape(
        b, hk, rep, dh)
    return out.reshape(b, h, dh)


def int8_paged_decode_attention_xla(
    q_s8, kt_pool, v_pool, table, length, q_scale, k_scale, v_scale,
    apply_sqrt_dh=True, quant_pv=False,
) -> jax.Array:
    """XLA golden / fallback: gather the slot's pages dense, then the
    contiguous decode attention.  Numerically the kernel and this path share
    the mask convention (unallocated pages masked by length)."""
    kt, v = gather_paged_kv(kt_pool, v_pool, table)
    return int8_decode_attention_xla(
        q_s8, kt, v, length, q_scale, k_scale, v_scale,
        apply_sqrt_dh=apply_sqrt_dh, quant_pv=quant_pv,
    )
