"""Fused decode-step kernels: norm/requant + dequant-GEMV (+ MLP) in ONE
pallas_call each.

Round-1 measurement (ROADMAP "late findings"): the 7B decode step is
launch-bound — ~160 Pallas launches plus the XLA glue fusions between them
dominate the 16.1 ms/step, not dispatch or FLOPs.  The reference pays 4 CUDA
launches per linear (reference: dgq/kernels/linear.cu:48-51 — dequant +
GEMM + two elementwise); the TPU answer is to collapse each decode
sub-block into a single kernel:

  * ``fused_norm_gemv``      — RMSNormQ prologue + full-K dequant GEMV
                               (replaces norm fusion + qkv/gate-up GEMM)
  * ``fused_norm_gemv_s4``   — same, contracting on the v5e int4 MXU path
                               (s4 x s4 plane dots; experimental, see
                               _plane_dot_s4 / ROADMAP round-4 lever #1)
  * ``fused_requant_gemv``   — int8 requant prologue + GEMV + optional
                               residual-add epilogue (o_proj)
  * ``fused_mlp_decode``     — RMSNormQ + gate/up GEMV + SiLU·mul +
                               requant + down GEMV + residual epilogue:
                               the ENTIRE MLP in one launch

All three exploit the decode shape (M = batch <= 8 rows): the activation
row block is VMEM-resident with a constant index map (fetched once), so the
contraction runs full-K inside each grid step and the normalization /
requant prologue is computed once into scratch at step 0 and reused.

Dequant algebra (round-2 rework): the per-element ``(code - z) * s``
materialization is VPU-bound (launch-overhead probe: 28 us/launch vs a
12.8 us DMA floor for a 7B-shaped GEMV).  Because z and s are constant per
128-deep nibble *plane*, the contraction distributes over them:

    y_n = sum_p  s_{p,n} * ( dot(x_p, codes_p)_n  -  sum(x_p) * z_{p,n} )

so the MXU contracts RAW nibble codes and the scale/zero arithmetic
collapses to per-plane (1, bn)-row corrections — ~1.6x less VPU work per
byte, and the group scales are consumed COMPACT ((G/2, N) int8 hi/lo plane
rows, precomputed in engine.from_ptq) instead of the 8x sublane-replicated
copies the tiled prefill GEMM needs, cutting scale DMA 8x.  All arithmetic
stays in exact int32, matching ops/quant_matmul.py bit for bit.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _plane_dot(x_s8, qw_ref, sh_ref, sl_ref, zh_ref, zl_ref, nsp: int, span: int):
    """Contract x_s8 (B, nsp*span) with the span-packed weight block in
    qw_ref via raw-nibble-plane dots + per-plane scalar corrections,
    returning exact (B, bn) int32.

    Per span t the hi nibbles are group 2t (k in [t*span, t*span+half)) and
    the lo nibbles group 2t+1 — the layout of quant/packing.pack_nibbles."""
    half = span // 2
    acc = None
    for t in range(nsp):
        u = qw_ref[t * half : (t + 1) * half, :].astype(jnp.uint8).astype(jnp.int32)
        hi = (u >> 4).astype(jnp.int8)
        lo = (u & 0xF).astype(jnp.int8)
        xh = x_s8[:, t * span : t * span + half]
        xl = x_s8[:, t * span + half : (t + 1) * span]
        dh = jax.lax.dot_general(
            xh, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        dl = jax.lax.dot_general(
            xl, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        sh = sh_ref[t : t + 1, :].astype(jnp.int32)  # (1, bn)
        sl = sl_ref[t : t + 1, :].astype(jnp.int32)
        zh = zh_ref[t : t + 1, :].astype(jnp.int32)
        zl = zl_ref[t : t + 1, :].astype(jnp.int32)
        sxh = jnp.sum(xh.astype(jnp.int32), axis=1, keepdims=True)  # (B, 1)
        sxl = jnp.sum(xl.astype(jnp.int32), axis=1, keepdims=True)
        p = (dh - sxh * zh) * sh + (dl - sxl * zl) * sl
        acc = p if acc is None else acc + p
    return acc


def _plane_dot_s4(x_s8, qw_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                  csh_ref, csl_ref, nsp: int, span: int,
                  interpret: bool = False):
    """_plane_dot on the v5e int4 MXU path: every dot is s4 x s4.

    Decode is weight-feed bound and the MXU consumes int4 operands ~2x
    faster than int8 (probe_gemv_bakeoff: s4 x s4 nets 1.5x the int8
    weight-element rate even paying a full in-step astype; mixed s8 x s4
    legalizes to an upcast and stays at the int8 rate —
    probe_mixed_s8s4).  So BOTH operands go 4-bit, exactly:

      codes c in [0,15]      ->  c4 = c - 8           in s4
      activation x in s8     ->  x = 16*hi4 + lo4 + 8 with
                                 lo4 = (x & 0xF) - 8, hi4 = (x-(x&0xF))>>4
      dot(x, c) = 16*dot(hi4,c4) + dot(lo4,c4) + 8*sum(x) + 8*colsum(c4)

    hi4/lo4 STACK as extra rows (2B, half) so the weight plane streams
    through the MXU ONCE at the int4 rate — at decode M the extra rows are
    free (the MXU pads M anyway).  colsum(c4) is a per-plane (nsp, bn)
    int32 constant precomputed from the packed weights (plane_colsums);
    sum(x) is the same per-row reduction the zero correction already
    needs.  All arithmetic stays exact int32 — bit-identical to
    _plane_dot."""
    half = span // 2
    b = x_s8.shape[0]
    # interpret mode (CPU) rejects sub-byte dot operands ("custom element
    # sizes on non-sub-byte types"); int8 carriers are numerically
    # identical there — the true s4 dtype path is exercised on hardware
    # (scripts/tpu_kernel_compile_gate.py + the on-chip parity test)
    dot_ty = jnp.int8 if interpret else jnp.int4
    # plane math in int32, single cast int32 -> s4 at the dot operands:
    # Mosaic legalizes i32->i4 converts but not i8 arithmetic in the
    # 4x-packed layout the cast would otherwise impose upstream
    x32 = x_s8.astype(jnp.int32)
    low = x32 & 0xF
    hi8 = (x32 - low) >> 4  # [-8, 7]
    lo8 = low - 8
    acc = None
    for t in range(nsp):
        u = qw_ref[t * half : (t + 1) * half, :].astype(jnp.uint8).astype(jnp.int32)
        c4h = ((u >> 4) - 8).astype(dot_ty)
        c4l = ((u & 0xF) - 8).astype(dot_ty)
        sh_k = slice(t * span, t * span + half)
        sl_k = slice(t * span + half, (t + 1) * span)
        xh4 = jnp.concatenate([hi8[:, sh_k], lo8[:, sh_k]], axis=0).astype(dot_ty)
        xl4 = jnp.concatenate([hi8[:, sl_k], lo8[:, sl_k]], axis=0).astype(dot_ty)
        dh2 = jax.lax.dot_general(
            xh4, c4h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # (2B, bn)
        dl2 = jax.lax.dot_general(
            xl4, c4l, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        sxh = jnp.sum(x_s8[:, sh_k].astype(jnp.int32), axis=1, keepdims=True)
        sxl = jnp.sum(x_s8[:, sl_k].astype(jnp.int32), axis=1, keepdims=True)
        dh = 16 * dh2[:b] + dh2[b:] + 8 * sxh + 8 * csh_ref[t : t + 1, :]
        dl = 16 * dl2[:b] + dl2[b:] + 8 * sxl + 8 * csl_ref[t : t + 1, :]
        sh = sh_ref[t : t + 1, :].astype(jnp.int32)
        sl = sl_ref[t : t + 1, :].astype(jnp.int32)
        zh = zh_ref[t : t + 1, :].astype(jnp.int32)
        zl = zl_ref[t : t + 1, :].astype(jnp.int32)
        p = (dh - sxh * zh) * sh + (dl - sxl * zl) * sl
        acc = p if acc is None else acc + p
    return acc


def pack_rowpair_s4(qweight_span: jax.Array, span: int) -> jax.Array:
    """Repack span-packed nibbles into the ROWPAIR-SHIFTED layout the
    native-s4 kernels consume: byte r packs the zero-shifted codes
    ``(c - 8) & 0xF`` of logical rows 2r (LOW nibble) and 2r+1 (HIGH
    nibble).  An in-kernel ``pltpu.bitcast(..., int4)`` of a (R, C) int8
    block then yields the (2R, C) s4 code matrix DIRECTLY — verified
    on-chip (scripts/probe_s4_bitcast_numerics.py: byte row r splits into
    s4 rows [2r = lo, 2r+1 = hi]) — so the decode GEMV streams weights to
    the MXU with ZERO per-element unpack work (the measured ~495 G welem/s
    VPU ceiling of the shift/mask path; the bitcast path probed at up to
    610).  Conversion-time only.  Accepts stacked (..., K//2, N) inputs."""
    from dgq_tpu.quant.packing import unpack_nibbles

    lead = qweight_span.shape[:-2]
    q2 = qweight_span.reshape((-1,) + qweight_span.shape[-2:])
    outs = []
    for i in range(q2.shape[0]):
        codes = unpack_nibbles(q2[i], span).astype(jnp.int32)  # (K, N) in [0,15]
        c4 = (codes - 8) & 0xF
        byte = ((c4[1::2] << 4) | c4[0::2]).astype(jnp.uint8)
        outs.append(jax.lax.bitcast_convert_type(byte, jnp.int8))
    out = jnp.stack(outs) if len(outs) > 1 else outs[0][None]
    return out.reshape(lead + out.shape[-2:])


def rowpair_cs_fold(qweight_span: jax.Array, span: int,
                    s_hi: jax.Array, s_lo: jax.Array) -> jax.Array:
    """(..., N) int32 x-independent correction folded out of the rowpair
    group dots: ``8 * sum_g s_g * colsum_g(c - 8)``.  Added ONCE to the
    int32 accumulator (exact), killing all per-group colsum traffic.
    s_hi/s_lo are the compact per-plane scale rows (even/odd groups)."""
    from dgq_tpu.quant.packing import unpack_nibbles

    lead = qweight_span.shape[:-2]
    q2 = qweight_span.reshape((-1,) + qweight_span.shape[-2:])
    sh2 = s_hi.reshape((-1,) + s_hi.shape[-2:])
    sl2 = s_lo.reshape((-1,) + s_lo.shape[-2:])
    gs = span // 2
    outs = []
    for i in range(q2.shape[0]):
        c4 = unpack_nibbles(q2[i], span).astype(jnp.int32) - 8  # (K, N)
        k, n = c4.shape
        cs = c4.reshape(k // gs, gs, n).sum(axis=1)  # (G, N)
        g = cs.shape[0]
        s_g = jnp.zeros((g, n), jnp.int32)
        s_g = s_g.at[0::2].set(sh2[i].astype(jnp.int32))
        s_g = s_g.at[1::2].set(sl2[i].astype(jnp.int32))
        outs.append(8 * jnp.sum(cs * s_g, axis=0))
    out = jnp.stack(outs) if len(outs) > 1 else outs[0][None]
    return out.reshape(lead + out.shape[-1:])


def rowpair_cs_fold_rp(qw_rp: jax.Array, groupsize: int,
                       s_hi: jax.Array, s_lo: jax.Array) -> jax.Array:
    """rowpair_cs_fold computed FROM the rowpair layout itself (used when
    the span copy was dropped — e.g. per-rank re-derivation for TP).
    Accepts stacked (..., K//2, N) inputs."""
    lead = qw_rp.shape[:-2]
    q2 = qw_rp.reshape((-1,) + qw_rp.shape[-2:])
    sh2 = s_hi.reshape((-1,) + s_hi.shape[-2:])
    sl2 = s_lo.reshape((-1,) + s_lo.shape[-2:])
    outs = []
    for i in range(q2.shape[0]):
        u = jax.lax.bitcast_convert_type(q2[i], jnp.uint8).astype(jnp.int32)
        lo = ((u & 0xF) ^ 8) - 8
        hi = ((u >> 4) ^ 8) - 8
        k2, n = q2[i].shape
        c4 = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)
        g = 2 * k2 // groupsize
        cs = c4.reshape(g, groupsize, n).sum(axis=1)
        s_g = jnp.zeros((g, n), jnp.int32)
        s_g = s_g.at[0::2].set(sh2[i].astype(jnp.int32))
        s_g = s_g.at[1::2].set(sl2[i].astype(jnp.int32))
        outs.append(8 * jnp.sum(cs * s_g, axis=0))
    out = jnp.stack(outs) if len(outs) > 1 else outs[0][None]
    return out.reshape(lead + out.shape[-1:])


def _bitcast_rows_s4(wb, interpret: bool):
    """(R, C) int8 packed bytes -> (2R, C) s4 code view (row 2r = low
    nibble, 2r+1 = high).  Free relayout on hardware; interpret mode (CPU
    rejects sub-byte dots) emulates with an int8 carrier — numerically
    identical, the true s4 path is exercised by the on-chip compile gate
    and parity scripts."""
    if not interpret:
        return pltpu.bitcast(wb, jnp.int4)
    u = wb.astype(jnp.uint8).astype(jnp.int32)
    lo = ((u & 0xF) ^ 8) - 8
    hi = ((u >> 4) ^ 8) - 8
    r, c = wb.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * r, c).astype(jnp.int8)


def _group_dot_s4rp_core(x_s8, qwrp_ref, srow, zrow, ngr: int, gs: int,
                         interpret: bool):
    """Contract int8 activations with ROWPAIR-SHIFTED s4 weights on the
    native int4 MXU path — ZERO weight unpack (see pack_rowpair_s4).

    x decomposes exactly as ``x = 16*hi4 + lo4 + 8`` with hi4/lo4 s4,
    STACKED as extra rows so each weight group streams through the MXU
    once at the int4 operand rate.  ``srow(g)``/``zrow(g)`` return the
    (1, bn) int32 group scale / UNSHIFTED zero rows (the -8 zero shift is
    applied here).  The x-independent ``8*colsum*scale`` term is NOT
    included — callers add the pre-folded per-channel constant
    (rowpair_cs_fold) to the int32 accumulator.  All arithmetic exact
    int32 — bit-identical to _plane_dot on the same layer (reference
    dequant contract: dgq/kernels/linear.cu:21-51)."""
    b = x_s8.shape[0]
    dot_ty = jnp.int8 if interpret else jnp.int4
    x32 = x_s8.astype(jnp.int32)
    low = x32 & 0xF
    hi8 = (x32 - low) >> 4  # [-8, 7]
    lo8 = low - 8
    hb = gs // 2  # byte rows per group
    acc = None
    for g in range(ngr):
        w4 = _bitcast_rows_s4(qwrp_ref[g * hb : (g + 1) * hb, :], interpret)
        ks = slice(g * gs, (g + 1) * gs)
        x4 = jnp.concatenate([hi8[:, ks], lo8[:, ks]], axis=0).astype(dot_ty)
        d2 = jax.lax.dot_general(
            x4, w4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # (2B, bn)
        sx = jnp.sum(x_s8[:, ks].astype(jnp.int32), axis=1, keepdims=True)
        s = srow(g)
        z4 = zrow(g) - 8
        # dot(x, c4) = 16*dot(hi4, c4) + dot(lo4, c4) + 8*colsum(c4); the
        # colsum term is x-independent and pre-folded (rowpair_cs_fold)
        d = 16 * d2[:b] + d2[b:]
        p = (d - sx * z4) * s
        acc = p if acc is None else acc + p
    return acc


def _group_dot_s4rp(x_s8, qwrp_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                    csf_ref, ngr: int, gs: int, interpret: bool):
    """_group_dot_s4rp_core over compact per-plane scale rows (even groups
    in sh/zh row g//2, odd in sl/zl) + the folded colsum correction."""

    def srow(g):
        r = (sh_ref if g % 2 == 0 else sl_ref)
        return r[g // 2 : g // 2 + 1, :].astype(jnp.int32)

    def zrow(g):
        r = (zh_ref if g % 2 == 0 else zl_ref)
        return r[g // 2 : g // 2 + 1, :].astype(jnp.int32)

    acc = _group_dot_s4rp_core(x_s8, qwrp_ref, srow, zrow, ngr, gs, interpret)
    return acc + csf_ref[:]


def plane_colsums(qweight: jax.Array, span: int = 256):
    """Per-plane column sums of the ZERO-SHIFTED codes (c - 8), int32 —
    the pack-time constant _plane_dot_s4 needs.  qweight: (K//2, N) int8
    span-packed; returns (csum_hi, csum_lo), each (K//span, N) int32."""
    k2, n = qweight.shape
    half = span // 2
    nsp = 2 * k2 // span
    u = qweight.astype(jnp.uint8).astype(jnp.int32).reshape(nsp, half, n)
    return ((u >> 4) - 8).sum(axis=1), ((u & 0xF) - 8).sum(axis=1)


def _unpack_dot(x_s8, qw_ref, s_all, z_all, nsp: int, span: int):
    """Legacy per-element dequant contraction on 8x-replicated scales —
    kept for the down-proj leg of the MLP kernel, whose per-f-block plane
    rows (nspf=bf/span, typically 2) violate Mosaic's sublane-divisibility
    rule for compact blocks (the replicated rows 16t / 16t+8 are 8-aligned
    by construction)."""
    half = span // 2
    acc = None
    for t in range(nsp):
        byte = qw_ref[t * half : (t + 1) * half, :].astype(jnp.int32) & 0xFF
        hi = byte >> 4
        lo = byte & 0xF
        r = 16 * t
        w_hi = (hi - z_all[r : r + 1, :]) * s_all[r : r + 1, :]
        w_lo = (lo - z_all[r + 8 : r + 9, :]) * s_all[r + 8 : r + 9, :]
        w_s8 = jnp.concatenate([w_hi, w_lo], axis=0).astype(jnp.int8)  # (span, bn)
        d = jax.lax.dot_general(
            x_s8[:, t * span : (t + 1) * span], w_s8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = d if acc is None else acc + d
    return acc


def _rmsnorm_q(x, w, b, eps: float):
    """RMSNormQ on a (B, D) f32 block -> int8 (matches engine._rms_norm_q)."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps) * w + b
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


def _plane_specs(nsp: int, bn: int, index_map):
    """BlockSpecs for the 4 compact plane-scale arrays ((nsp, bn) blocks)."""
    return [pl.BlockSpec((nsp, bn), index_map, memory_space=pltpu.VMEM)] * 4


# --------------------------------------------------------------------------
# norm + GEMV (qkv / gate_up entry)
# --------------------------------------------------------------------------

def _norm_gemv_kernel(
    x_ref,  # (B8, K) f32 residual-stream block (constant index map)
    lnw_ref,  # (1, K) f32 pre-scaled norm weight
    lnb_ref,  # (1, K) f32 norm bias (zeros when absent)
    qw_ref,  # (K//2, bn) int8 span-packed
    sh_ref,  # (nspk, bn) int8 even-plane group scales
    sl_ref,  # (nspk, bn) int8 odd-plane group scales
    zh_ref,  # (nspk, bn) int8 even-plane zeros
    zl_ref,  # (nspk, bn) int8 odd-plane zeros
    alpha_ref,  # (1, bn) f32
    beta_ref,  # (1, bn) f32
    out_ref,  # (B8, bn) f32
    xq_ref,  # (B8, K) int8 scratch
    *,
    nspk: int,
    span: int,
    eps: float,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xq_ref[:] = _rmsnorm_q(x_ref[:], lnw_ref[:], lnb_ref[:], eps)

    acc = _plane_dot(xq_ref[:], qw_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                     nspk, span)
    out_ref[:] = acc.astype(jnp.float32) * alpha_ref[:] + beta_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("span", "bn", "eps", "interpret"),
)
def fused_norm_gemv(
    x: jax.Array,  # (B, K) f32 residual stream
    ln_w: jax.Array,  # (K,) f32
    ln_b: Optional[jax.Array],  # (K,) f32 or None
    qweight: jax.Array,  # (K//2, N) int8 span-packed
    s_hi: jax.Array,  # (G//2, N) int8 compact even-plane scales
    s_lo: jax.Array,  # (G//2, N) int8
    z_hi: jax.Array,  # (G//2, N) int8
    z_lo: jax.Array,  # (G//2, N) int8
    alpha: jax.Array,  # (N,) f32
    beta: Optional[jax.Array] = None,  # (N,) f32
    *,
    span: int = 256,
    bn: int = 512,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """One launch: y = (RMSNormQ(x) @ dequant(W)) * alpha + beta."""
    b, k = x.shape
    k2, n = qweight.shape
    assert 2 * k2 == k and k % span == 0, (x.shape, qweight.shape, span)
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0, (n, bn)
    nspk = k // span
    assert s_hi.shape == (nspk, n), (s_hi.shape, nspk, n)
    if ln_b is None:
        ln_b = jnp.zeros((k,), jnp.float32)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_norm_gemv_kernel, nspk=nspk, span=span, eps=eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            *_plane_specs(nspk, bn, lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b8, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # scratch carries across steps
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), ln_w.reshape(1, k).astype(jnp.float32),
        ln_b.reshape(1, k).astype(jnp.float32), qweight,
        s_hi, s_lo, z_hi, z_lo,
        alpha.reshape(1, n).astype(jnp.float32), beta.reshape(1, n).astype(jnp.float32),
    )
    return out[:b]


def _norm_gemv_s4_kernel(
    x_ref, lnw_ref, lnb_ref, qw_ref, sh_ref, sl_ref, zh_ref, zl_ref,
    csh_ref,  # (nspk, bn) int32 even-plane colsums of (c - 8)
    csl_ref,  # (nspk, bn) int32 odd-plane colsums
    alpha_ref, beta_ref, out_ref, xq_ref,
    *, nspk: int, span: int, eps: float, interpret: bool,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xq_ref[:] = _rmsnorm_q(x_ref[:], lnw_ref[:], lnb_ref[:], eps)

    acc = _plane_dot_s4(xq_ref[:], qw_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                        csh_ref, csl_ref, nspk, span, interpret=interpret)
    out_ref[:] = acc.astype(jnp.float32) * alpha_ref[:] + beta_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("span", "bn", "eps", "interpret"),
)
def fused_norm_gemv_s4(
    x: jax.Array,  # (B, K) f32 residual stream
    ln_w: jax.Array,
    ln_b: Optional[jax.Array],
    qweight: jax.Array,  # (K//2, N) int8 span-packed
    s_hi: jax.Array,
    s_lo: jax.Array,
    z_hi: jax.Array,
    z_lo: jax.Array,
    alpha: jax.Array,
    beta: Optional[jax.Array] = None,
    csum_hi: Optional[jax.Array] = None,  # (K//span, N) int32; derived if None
    csum_lo: Optional[jax.Array] = None,
    *,
    span: int = 256,
    bn: int = 512,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """fused_norm_gemv on the int4 MXU path (see _plane_dot_s4).
    Bit-identical output; pass precomputed plane_colsums(qweight) to keep
    the pack-time constant out of the per-call graph."""
    b, k = x.shape
    k2, n = qweight.shape
    assert 2 * k2 == k and k % span == 0, (x.shape, qweight.shape, span)
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0, (n, bn)
    nspk = k // span
    assert s_hi.shape == (nspk, n), (s_hi.shape, nspk, n)
    if ln_b is None:
        ln_b = jnp.zeros((k,), jnp.float32)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)
    if csum_hi is None or csum_lo is None:
        csum_hi, csum_lo = plane_colsums(qweight, span)

    out = pl.pallas_call(
        functools.partial(_norm_gemv_s4_kernel, nspk=nspk, span=span, eps=eps,
                          interpret=interpret),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            *_plane_specs(nspk, bn, lambda j: (0, j)),
            pl.BlockSpec((nspk, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nspk, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b8, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), ln_w.reshape(1, k).astype(jnp.float32),
        ln_b.reshape(1, k).astype(jnp.float32), qweight,
        s_hi, s_lo, z_hi, z_lo,
        csum_hi.astype(jnp.int32), csum_lo.astype(jnp.int32),
        alpha.reshape(1, n).astype(jnp.float32), beta.reshape(1, n).astype(jnp.float32),
    )
    return out[:b]


def _norm_gemv_rp_kernel(
    x_ref, lnw_ref, lnb_ref, qwrp_ref, sh_ref, sl_ref, zh_ref, zl_ref,
    csf_ref,  # (1, bn) int32 folded colsum*scale correction
    alpha_ref, beta_ref, out_ref, xq_ref,
    *, ngr: int, gs: int, eps: float, interpret: bool,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xq_ref[:] = _rmsnorm_q(x_ref[:], lnw_ref[:], lnb_ref[:], eps)

    acc = _group_dot_s4rp(xq_ref[:], qwrp_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                          csf_ref, ngr, gs, interpret)
    out_ref[:] = acc.astype(jnp.float32) * alpha_ref[:] + beta_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("span", "bn", "eps", "interpret"),
)
def fused_norm_gemv_rp(
    x: jax.Array,  # (B, K) f32 residual stream
    ln_w: jax.Array,
    ln_b: Optional[jax.Array],
    qw_rp: jax.Array,  # (K//2, N) int8 ROWPAIR-SHIFTED (pack_rowpair_s4)
    s_hi: jax.Array,  # (G//2, N) int8 compact even-group scales
    s_lo: jax.Array,
    z_hi: jax.Array,
    z_lo: jax.Array,
    cs_fold: jax.Array,  # (N,) int32 (rowpair_cs_fold)
    alpha: jax.Array,
    beta: Optional[jax.Array] = None,
    *,
    span: int = 256,
    bn: int = 512,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """fused_norm_gemv on the NATIVE-s4 int4 MXU path: weights bitcast in
    VMEM to s4 code rows with zero unpack (see _group_dot_s4rp).
    Bit-identical to fused_norm_gemv on the same quantized layer."""
    b, k = x.shape
    k2, n = qw_rp.shape
    gs = span // 2
    assert 2 * k2 == k and k % gs == 0, (x.shape, qw_rp.shape, span)
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0, (n, bn)
    ngr = k // gs
    nspk = ngr // 2
    assert s_hi.shape == (nspk, n), (s_hi.shape, nspk, n)
    if ln_b is None:
        ln_b = jnp.zeros((k,), jnp.float32)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_norm_gemv_rp_kernel, ngr=ngr, gs=gs, eps=eps,
                          interpret=interpret),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            *_plane_specs(nspk, bn, lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b8, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), ln_w.reshape(1, k).astype(jnp.float32),
        ln_b.reshape(1, k).astype(jnp.float32), qw_rp,
        s_hi, s_lo, z_hi, z_lo,
        cs_fold.reshape(1, n).astype(jnp.int32),
        alpha.reshape(1, n).astype(jnp.float32), beta.reshape(1, n).astype(jnp.float32),
    )
    return out[:b]


def _requant_gemv_rp_kernel(
    x_ref, scale_ref, qwrp_ref, sh_ref, sl_ref, zh_ref, zl_ref,
    csf_ref, alpha_ref, beta_ref, res_ref, out_ref, xq_ref,
    *, ngr: int, gs: int, qmin: float, fuse_residual: bool, interpret: bool,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        y = jnp.round(x_ref[:] / scale_ref[0])
        xq_ref[:] = jnp.clip(y, qmin, 127.0).astype(jnp.int8)

    acc = _group_dot_s4rp(xq_ref[:], qwrp_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                          csf_ref, ngr, gs, interpret)
    y = acc.astype(jnp.float32) * alpha_ref[:] + beta_ref[:]
    if fuse_residual:
        y = y + res_ref[:]
    out_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("span", "bn", "qmin", "fuse_residual", "interpret"),
)
def fused_requant_gemv_rp(
    x: jax.Array,
    in_scale: jax.Array,
    qw_rp: jax.Array,
    s_hi: jax.Array,
    s_lo: jax.Array,
    z_hi: jax.Array,
    z_lo: jax.Array,
    cs_fold: jax.Array,
    alpha: jax.Array,
    beta: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    *,
    span: int = 256,
    bn: int = 512,
    qmin: float = -127.0,
    fuse_residual: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """fused_requant_gemv on the native-s4 int4 MXU path (zero unpack)."""
    b, k = x.shape
    k2, n = qw_rp.shape
    gs = span // 2
    assert 2 * k2 == k and k % gs == 0
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0
    ngr = k // gs
    nspk = ngr // 2
    assert s_hi.shape == (nspk, n), (s_hi.shape, nspk, n)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)
    if residual is None:
        assert not fuse_residual
        residual = jnp.zeros((b8, n), jnp.float32)
    elif b8 != b:
        residual = jnp.pad(residual, ((0, b8 - b), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_requant_gemv_rp_kernel, ngr=ngr, gs=gs,
                          qmin=qmin, fuse_residual=fuse_residual,
                          interpret=interpret),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            *_plane_specs(nspk, bn, lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b8, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), jnp.reshape(in_scale, (1,)).astype(jnp.float32),
        qw_rp, s_hi, s_lo, z_hi, z_lo,
        cs_fold.reshape(1, n).astype(jnp.int32),
        alpha.reshape(1, n).astype(jnp.float32), beta.reshape(1, n).astype(jnp.float32),
        residual.astype(jnp.float32),
    )
    return out[:b]


# --------------------------------------------------------------------------
# requant + GEMV (+ residual) (o_proj)
# --------------------------------------------------------------------------

def _requant_gemv_kernel(
    x_ref,  # (B8, K) f32 attention context (constant index map)
    scale_ref,  # (1,) f32 SMEM requant scale
    qw_ref,
    sh_ref,
    sl_ref,
    zh_ref,
    zl_ref,
    alpha_ref,
    beta_ref,
    res_ref,  # (B8, bn) f32 residual block
    out_ref,
    xq_ref,  # (B8, K) int8 scratch
    *,
    nspk: int,
    span: int,
    qmin: float,
    fuse_residual: bool,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        y = jnp.round(x_ref[:] / scale_ref[0])
        xq_ref[:] = jnp.clip(y, qmin, 127.0).astype(jnp.int8)

    acc = _plane_dot(xq_ref[:], qw_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                     nspk, span)
    y = acc.astype(jnp.float32) * alpha_ref[:] + beta_ref[:]
    if fuse_residual:
        y = y + res_ref[:]
    out_ref[:] = y


def _requant_gemv_s4_kernel(
    x_ref, scale_ref, qw_ref, sh_ref, sl_ref, zh_ref, zl_ref,
    csh_ref,  # (nspk, bn) int32 plane colsums of (c - 8)
    csl_ref,
    alpha_ref, beta_ref, res_ref, out_ref, xq_ref,
    *, nspk: int, span: int, qmin: float, fuse_residual: bool,
    interpret: bool,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        y = jnp.round(x_ref[:] / scale_ref[0])
        xq_ref[:] = jnp.clip(y, qmin, 127.0).astype(jnp.int8)

    acc = _plane_dot_s4(xq_ref[:], qw_ref, sh_ref, sl_ref, zh_ref, zl_ref,
                        csh_ref, csl_ref, nspk, span, interpret=interpret)
    y = acc.astype(jnp.float32) * alpha_ref[:] + beta_ref[:]
    if fuse_residual:
        y = y + res_ref[:]
    out_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("span", "bn", "qmin", "fuse_residual", "interpret"),
)
def fused_requant_gemv_s4(
    x: jax.Array,  # (B, K) f32 (e.g. attention context)
    in_scale: jax.Array,  # () f32 static requant scale
    qweight: jax.Array,
    s_hi: jax.Array,
    s_lo: jax.Array,
    z_hi: jax.Array,
    z_lo: jax.Array,
    alpha: jax.Array,
    beta: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,
    csum_hi: Optional[jax.Array] = None,  # (K//span, N) int32; derived if None
    csum_lo: Optional[jax.Array] = None,
    *,
    span: int = 256,
    bn: int = 512,
    qmin: float = -127.0,
    fuse_residual: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """fused_requant_gemv on the int4 MXU path (see _plane_dot_s4).
    Bit-identical output; pass precomputed plane_colsums(qweight)."""
    b, k = x.shape
    k2, n = qweight.shape
    assert 2 * k2 == k and k % span == 0
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0
    nspk = k // span
    assert s_hi.shape == (nspk, n), (s_hi.shape, nspk, n)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)
    if residual is None:
        assert not fuse_residual
        residual = jnp.zeros((b8, n), jnp.float32)
    elif b8 != b:
        residual = jnp.pad(residual, ((0, b8 - b), (0, 0)))
    if csum_hi is None or csum_lo is None:
        csum_hi, csum_lo = plane_colsums(qweight, span)

    out = pl.pallas_call(
        functools.partial(_requant_gemv_s4_kernel, nspk=nspk, span=span,
                          qmin=qmin, fuse_residual=fuse_residual,
                          interpret=interpret),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            *_plane_specs(nspk, bn, lambda j: (0, j)),
            pl.BlockSpec((nspk, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nspk, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b8, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), jnp.reshape(in_scale, (1,)).astype(jnp.float32),
        qweight, s_hi, s_lo, z_hi, z_lo,
        csum_hi.astype(jnp.int32), csum_lo.astype(jnp.int32),
        alpha.reshape(1, n).astype(jnp.float32), beta.reshape(1, n).astype(jnp.float32),
        residual.astype(jnp.float32),
    )
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("span", "bn", "qmin", "fuse_residual", "interpret"),
)
def fused_requant_gemv(
    x: jax.Array,  # (B, K) f32 (e.g. attention context)
    in_scale: jax.Array,  # () f32 static requant scale
    qweight: jax.Array,
    s_hi: jax.Array,
    s_lo: jax.Array,
    z_hi: jax.Array,
    z_lo: jax.Array,
    alpha: jax.Array,
    beta: Optional[jax.Array] = None,
    residual: Optional[jax.Array] = None,  # (B, N) f32 added in-kernel
    *,
    span: int = 256,
    bn: int = 512,
    qmin: float = -127.0,
    fuse_residual: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """One launch: y = (requant(x) @ dequant(W)) * alpha + beta [+ residual]."""
    b, k = x.shape
    k2, n = qweight.shape
    assert 2 * k2 == k and k % span == 0
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0
    nspk = k // span
    assert s_hi.shape == (nspk, n), (s_hi.shape, nspk, n)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)
    if residual is None:
        assert not fuse_residual
        residual = jnp.zeros((b8, n), jnp.float32)
    elif b8 != b:
        residual = jnp.pad(residual, ((0, b8 - b), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_requant_gemv_kernel, nspk=nspk, span=span,
                          qmin=qmin, fuse_residual=fuse_residual),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((b8, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((k2, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            *_plane_specs(nspk, bn, lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b8, k), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), jnp.reshape(in_scale, (1,)).astype(jnp.float32),
        qweight, s_hi, s_lo, z_hi, z_lo,
        alpha.reshape(1, n).astype(jnp.float32), beta.reshape(1, n).astype(jnp.float32),
        residual.astype(jnp.float32),
    )
    return out[:b]


# --------------------------------------------------------------------------
# whole-MLP kernel: norm + gate/up GEMV + SiLU*up + requant + down + residual
# --------------------------------------------------------------------------

def _mlp_kernel(
    x_ref,  # (B8, D) f32 residual stream (constant index map)
    lnw_ref,  # (1, D) f32
    lnb_ref,  # (1, D) f32
    hscale_ref,  # (1,) f32 SMEM: down-proj input requant scale
    qwg_ref,  # (D//2, bf) int8 — gate columns of the fused gate_up weight
    shg_ref,  # (nspd, bf) int8 compact plane scales (gate)
    slg_ref,
    zhg_ref,
    zlg_ref,
    ag_ref,  # (1, bf) f32 gate alpha
    qwu_ref,  # (D//2, bf) int8 — up columns
    shu_ref,
    slu_ref,
    zhu_ref,
    zlu_ref,
    au_ref,
    qwd_ref,  # (bf//2, D) int8 — down rows for this intermediate block
    sd_ref,  # (16*nspf, D) int8 replicated down scales (this block's rows)
    zd_ref,
    ad_ref,  # (1, D) f32 down alpha
    bd_ref,  # (1, D) f32 down bias
    out_ref,  # (B8, D) f32
    xq_ref,  # (B8, D) int8 scratch (normed input)
    acc_ref,  # (B8, D) int32 scratch (down accumulation)
    *,
    nf: int,
    nspd: int,  # spans along D (gate/up contraction)
    nspf: int,  # spans along bf (down contraction per step)
    span: int,
    eps: float,
    fuse_residual: bool,
):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        xq_ref[:] = _rmsnorm_q(x_ref[:], lnw_ref[:], lnb_ref[:], eps)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]
    g32 = _plane_dot(xq, qwg_ref, shg_ref, slg_ref, zhg_ref, zlg_ref, nspd, span)
    u32 = _plane_dot(xq, qwu_ref, shu_ref, slu_ref, zhu_ref, zlu_ref, nspd, span)
    g = g32.astype(jnp.float32) * ag_ref[:]
    u = u32.astype(jnp.float32) * au_ref[:]
    h = (g * jax.nn.sigmoid(g)) * u  # SiLU(gate) * up
    h_s8 = jnp.clip(jnp.round(h / hscale_ref[0]), -128.0, 127.0).astype(jnp.int8)

    acc_ref[:] += _unpack_dot(h_s8, qwd_ref, sd_ref[:].astype(jnp.int32),
                              zd_ref[:].astype(jnp.int32), nspf, span)

    @pl.when(f == nf - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * ad_ref[:] + bd_ref[:]
        if fuse_residual:
            y = y + x_ref[:]
        out_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("span", "bf", "eps", "fuse_residual", "interpret"),
)
def fused_mlp_decode(
    x: jax.Array,  # (B, D) f32 residual stream
    ln_w: jax.Array,  # (D,) f32
    ln_b: Optional[jax.Array],
    gu_qweight: jax.Array,  # (D//2, 2F) int8 — [gate | up] fused columns
    gu_s_hi: jax.Array,  # (G//2, 2F) int8 compact plane scales
    gu_s_lo: jax.Array,
    gu_z_hi: jax.Array,
    gu_z_lo: jax.Array,
    gu_alpha: jax.Array,  # (2F,) f32
    down_scale: jax.Array,  # () f32 down-proj input requant scale
    d_qweight: jax.Array,  # (F//2, D) int8
    d_wscales: jax.Array,  # (8*Gf, D) int8 replicated (see _unpack_dot)
    d_wzeros: jax.Array,
    d_alpha: jax.Array,  # (D,) f32
    d_beta: Optional[jax.Array] = None,  # (D,) f32 down bias
    *,
    span: int = 256,
    bf: int = 512,
    eps: float = 1e-6,
    fuse_residual: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """The entire LLaMA decode MLP in ONE pallas_call.

    Grid walks the intermediate dimension F in blocks of ``bf``; each step
    computes that block of SiLU(gate)*up from the VMEM-resident normed
    input, requants it, and accumulates its contribution to the down
    projection.  The final step applies the down per-channel epilogue and
    (optionally) adds the residual stream.  Replaces 5 device launches
    (norm fusion, gate_up GEMM, SiLU/requant fusion, down GEMM, residual
    add) with one; weight traffic is unchanged.

    Under tensor parallelism call with ``fuse_residual=False`` and psum +
    residual-add outside (the partial down output is alpha-scaled, which
    commutes with the all-reduce)."""
    b, d = x.shape
    d2, n2f = gu_qweight.shape
    assert 2 * d2 == d and d % span == 0, (x.shape, gu_qweight.shape, span)
    f2, dout = d_qweight.shape
    fdim = 2 * f2
    assert n2f == 2 * fdim and dout == d, (gu_qweight.shape, d_qweight.shape)
    bf = min(bf, fdim)
    assert fdim % bf == 0 and bf % span == 0, (fdim, bf, span)
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    nf = fdim // bf
    nspd = d // span
    nspf = bf // span
    assert gu_s_hi.shape == (nspd, n2f), (gu_s_hi.shape, nspd, n2f)
    assert d_wscales.shape == (8 * fdim // (span // 2), d), (d_wscales.shape, fdim, span)
    if ln_b is None:
        ln_b = jnp.zeros((d,), jnp.float32)
    if d_beta is None:
        d_beta = jnp.zeros((d,), jnp.float32)

    fb = fdim // bf  # column-block offset of the up half

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, nf=nf, nspd=nspd, nspf=nspf, span=span,
                          eps=eps, fuse_residual=fuse_residual),
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((b8, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # gate columns [f*bf, (f+1)*bf)
            pl.BlockSpec((d2, bf), lambda f: (0, f), memory_space=pltpu.VMEM),
            *_plane_specs(nspd, bf, lambda f: (0, f)),
            pl.BlockSpec((1, bf), lambda f: (0, f), memory_space=pltpu.VMEM),
            # up columns [F + f*bf, ...)
            pl.BlockSpec((d2, bf), lambda f: (0, fb + f), memory_space=pltpu.VMEM),
            *_plane_specs(nspd, bf, lambda f: (0, fb + f)),
            pl.BlockSpec((1, bf), lambda f: (0, fb + f), memory_space=pltpu.VMEM),  # up alpha
            # down rows [f*bf/2, ...)
            pl.BlockSpec((bf // 2, d), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * nspf, d), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * nspf, d), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b8, d), jnp.int8),
            pltpu.VMEM((b8, d), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), ln_w.reshape(1, d).astype(jnp.float32),
        ln_b.reshape(1, d).astype(jnp.float32),
        jnp.reshape(down_scale, (1,)).astype(jnp.float32),
        gu_qweight, gu_s_hi, gu_s_lo, gu_z_hi, gu_z_lo,
        gu_alpha.reshape(1, n2f).astype(jnp.float32),
        gu_qweight, gu_s_hi, gu_s_lo, gu_z_hi, gu_z_lo,
        gu_alpha.reshape(1, n2f).astype(jnp.float32),
        d_qweight, d_wscales, d_wzeros,
        d_alpha.reshape(1, d).astype(jnp.float32),
        d_beta.reshape(1, d).astype(jnp.float32),
    )
    return out[:b]


def _mlp_rp_kernel(
    x_ref,  # (B8, D) f32 residual stream (constant index map)
    lnw_ref,
    lnb_ref,
    hscale_ref,  # (1,) f32 SMEM: down-proj input requant scale
    qwg_ref,  # (D//2, bf) int8 rowpair — gate columns
    shg_ref,  # (nspd, bf) int8 compact plane scales (gate)
    slg_ref,
    zhg_ref,
    zlg_ref,
    csfg_ref,  # (1, bf) int32 folded colsum (gate)
    ag_ref,
    qwu_ref,  # up columns (rowpair)
    shu_ref,
    slu_ref,
    zhu_ref,
    zlu_ref,
    csfu_ref,
    au_ref,
    qwd_ref,  # (bf//2, D) int8 rowpair — down rows for this block
    sd_ref,  # (8*ngf, D) int8 replicated down group scales (this block)
    zd_ref,  # (8*ngf, D) int8 replicated down zeros (UNSHIFTED)
    csfd_ref,  # (1, D) int32 folded colsum (down, whole-F)
    ad_ref,
    bd_ref,
    out_ref,
    xq_ref,  # (B8, D) int8 scratch (normed input)
    acc_ref,  # (B8, D) int32 scratch (down accumulation)
    *,
    nf: int,
    ngd: int,  # groups along D (gate/up contraction)
    ngf: int,  # groups along bf (down contraction per step)
    gs: int,
    eps: float,
    fuse_residual: bool,
    interpret: bool,
):
    f = pl.program_id(0)

    @pl.when(f == 0)
    def _():
        xq_ref[:] = _rmsnorm_q(x_ref[:], lnw_ref[:], lnb_ref[:], eps)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]
    g32 = _group_dot_s4rp(xq, qwg_ref, shg_ref, slg_ref, zhg_ref, zlg_ref,
                          csfg_ref, ngd, gs, interpret)
    u32 = _group_dot_s4rp(xq, qwu_ref, shu_ref, slu_ref, zhu_ref, zlu_ref,
                          csfu_ref, ngd, gs, interpret)
    g = g32.astype(jnp.float32) * ag_ref[:]
    u = u32.astype(jnp.float32) * au_ref[:]
    h = (g * jax.nn.sigmoid(g)) * u  # SiLU(gate) * up
    h_s8 = jnp.clip(jnp.round(h / hscale_ref[0]), -128.0, 127.0).astype(jnp.int8)

    def srow(i):
        return sd_ref[8 * i : 8 * i + 1, :].astype(jnp.int32)

    def zrow(i):
        return zd_ref[8 * i : 8 * i + 1, :].astype(jnp.int32)

    acc_ref[:] += _group_dot_s4rp_core(h_s8, qwd_ref, srow, zrow, ngf, gs,
                                       interpret)

    @pl.when(f == nf - 1)
    def _():
        acc = acc_ref[:] + csfd_ref[:]
        y = acc.astype(jnp.float32) * ad_ref[:] + bd_ref[:]
        if fuse_residual:
            y = y + x_ref[:]
        out_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("span", "bf", "eps", "fuse_residual", "interpret"),
)
def fused_mlp_decode_rp(
    x: jax.Array,  # (B, D) f32 residual stream
    ln_w: jax.Array,
    ln_b: Optional[jax.Array],
    gu_qw_rp: jax.Array,  # (D//2, 2F) int8 rowpair — [gate | up]
    gu_s_hi: jax.Array,  # (G//2, 2F) int8 compact plane scales
    gu_s_lo: jax.Array,
    gu_z_hi: jax.Array,
    gu_z_lo: jax.Array,
    gu_cs_fold: jax.Array,  # (2F,) int32
    gu_alpha: jax.Array,  # (2F,) f32
    down_scale: jax.Array,  # () f32
    d_qw_rp: jax.Array,  # (F//2, D) int8 rowpair
    d_wscales: jax.Array,  # (8*Gf, D) int8 replicated
    d_wzeros: jax.Array,  # (8*Gf, D) int8 replicated (unshifted)
    d_cs_fold: jax.Array,  # (D,) int32
    d_alpha: jax.Array,
    d_beta: Optional[jax.Array] = None,
    *,
    span: int = 256,
    bf: int = 512,
    eps: float = 1e-6,
    fuse_residual: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """fused_mlp_decode on the native-s4 int4 MXU path: all three weight
    streams (gate, up, down) feed the MXU as bitcast s4 code rows with
    zero unpack.  Bit-identical to fused_mlp_decode."""
    b, d = x.shape
    d2, n2f = gu_qw_rp.shape
    gs = span // 2
    assert 2 * d2 == d and d % gs == 0, (x.shape, gu_qw_rp.shape, span)
    f2, dout = d_qw_rp.shape
    fdim = 2 * f2
    assert n2f == 2 * fdim and dout == d, (gu_qw_rp.shape, d_qw_rp.shape)
    bf = min(bf, fdim)
    assert fdim % bf == 0 and bf % gs == 0, (fdim, bf, gs)
    b8 = _cdiv(max(b, 1), 8) * 8
    if b8 != b:
        x = jnp.pad(x, ((0, b8 - b), (0, 0)))
    nf = fdim // bf
    ngd = d // gs
    ngf = bf // gs
    nspd = ngd // 2
    assert gu_s_hi.shape == (nspd, n2f), (gu_s_hi.shape, nspd, n2f)
    assert d_wscales.shape == (8 * fdim // gs, d), (d_wscales.shape, fdim, gs)
    if ln_b is None:
        ln_b = jnp.zeros((d,), jnp.float32)
    if d_beta is None:
        d_beta = jnp.zeros((d,), jnp.float32)

    fb = fdim // bf  # column-block offset of the up half

    out = pl.pallas_call(
        functools.partial(_mlp_rp_kernel, nf=nf, ngd=ngd, ngf=ngf, gs=gs,
                          eps=eps, fuse_residual=fuse_residual,
                          interpret=interpret),
        grid=(nf,),
        in_specs=[
            pl.BlockSpec((b8, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # gate columns [f*bf, (f+1)*bf)
            pl.BlockSpec((d2, bf), lambda f: (0, f), memory_space=pltpu.VMEM),
            *_plane_specs(nspd, bf, lambda f: (0, f)),
            pl.BlockSpec((1, bf), lambda f: (0, f), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda f: (0, f), memory_space=pltpu.VMEM),
            # up columns [F + f*bf, ...)
            pl.BlockSpec((d2, bf), lambda f: (0, fb + f), memory_space=pltpu.VMEM),
            *_plane_specs(nspd, bf, lambda f: (0, fb + f)),
            pl.BlockSpec((1, bf), lambda f: (0, fb + f), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda f: (0, fb + f), memory_space=pltpu.VMEM),
            # down rows [f*bf/2, ...)
            pl.BlockSpec((bf // 2, d), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * ngf, d), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * ngf, d), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b8, d), lambda f: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b8, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((b8, d), jnp.int8),
            pltpu.VMEM((b8, d), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.astype(jnp.float32), ln_w.reshape(1, d).astype(jnp.float32),
        ln_b.reshape(1, d).astype(jnp.float32),
        jnp.reshape(down_scale, (1,)).astype(jnp.float32),
        gu_qw_rp, gu_s_hi, gu_s_lo, gu_z_hi, gu_z_lo,
        gu_cs_fold.reshape(1, n2f).astype(jnp.int32),
        gu_alpha.reshape(1, n2f).astype(jnp.float32),
        gu_qw_rp, gu_s_hi, gu_s_lo, gu_z_hi, gu_z_lo,
        gu_cs_fold.reshape(1, n2f).astype(jnp.int32),
        gu_alpha.reshape(1, n2f).astype(jnp.float32),
        d_qw_rp, d_wscales, d_wzeros,
        d_cs_fold.reshape(1, d).astype(jnp.int32),
        d_alpha.reshape(1, d).astype(jnp.float32),
        d_beta.reshape(1, d).astype(jnp.float32),
    )
    return out[:b]
