"""Fused W4A8 dequant-GEMM Pallas TPU kernel.

The TPU-native counterpart of the reference's CUTLASS path
(reference: dgq/kernels/linear.cu).  The reference launches a separate
INT4->INT8 dequant kernel that materializes the full INT8 weight in global
memory before every GEMM (linear.cu:21-51, SURVEY §2.2 "not fused into the
GEMM mainloop").  Here the unpack+dequant is fused into the GEMM: each
(K-block, N-block) tile of packed nibbles is unpacked to INT8 in VMEM,
dequantized in the *integer* domain with the dual-grained per-group INT8
scales, fed to the MXU as s8 x s8 -> s32, and the only floating-point work is
the per-output-channel alpha epilogue (alpha = wscales8 * input_scale,
matching W4A8BF32OF32Linear.from_float at models/linear.py:91).

Packed layout (see dgq_tpu/quant/packing.py): weight is (K//2, N) int8 in
"span" layout — every 2*groupsize logical rows pack group 2t in the high
nibbles and group 2t+1 in the low nibbles of the same groupsize packed rows.
The kernel's K-block is one span (= 2*groupsize = 256 for g128), so unpack is

    hi = (byte >> 4) & 0xF   -> group 2t codes   (groupsize, bn)
    lo =  byte       & 0xF   -> group 2t+1 codes (groupsize, bn)

and each plane's dequant broadcasts a single (1, bn) scale/zero row: a pure
VPU shift/mask/multiply that pipelines under the MXU.

Grid is (M/bm, N/bn, K/bk), K innermost ("arbitrary"), int32 accumulator in
VMEM scratch; fp32 (or re-quantized int8) store on the last K step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgq_tpu.quant.packing import PackedLinear, dequantize_to_int8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(
    x_ref,  # (bm, bk) int8, bk = n_spans * span
    qw_ref,  # (bk//2, bn) int8 packed (n_spans consecutive spans)
    scales_ref,  # (16*n_spans, bn) int8: per span, rows 0-7 = even group, 8-15 = odd
    zeros_ref,  # (16*n_spans, bn) int8
    alpha_ref,  # (1, bn) f32 per-channel epilogue scale
    beta_ref,  # (1, bn) f32 per-channel epilogue bias (pre-rounding for int8 out)
    out_ref,  # (bm, bn) out_dtype
    acc_ref,  # (bm, bn) int32 scratch
    *,
    nk: int,
    n_spans: int,
    span: int,
    out_dtype,
    split_dots: bool = False,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    half = span // 2
    # group params arrive 8x-replicated on sublanes so BlockSpecs stay
    # 8-aligned (Mosaic rejects 2-row sublane blocks / unaligned slices)
    s_all = scales_ref[:].astype(jnp.int32)
    z_all = zeros_ref[:].astype(jnp.int32)

    acc = acc_ref[:]
    for t in range(n_spans):  # static unroll: one dequant+dot per span
        byte = qw_ref[t * half : (t + 1) * half, :].astype(jnp.int32) & 0xFF
        hi = byte >> 4  # even group of span t
        lo = byte & 0xF  # odd group
        r = 16 * t
        w_hi = (hi - z_all[r : r + 1, :]) * s_all[r : r + 1, :]
        w_lo = (lo - z_all[r + 8 : r + 9, :]) * s_all[r + 8 : r + 9, :]
        if split_dots:
            # two half-span dots, no (span, bn) concat copy between the VPU
            # dequant and the MXU — shortens the critical path per step
            acc += jax.lax.dot_general(
                x_ref[:, t * span : t * span + half],
                w_hi.astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc += jax.lax.dot_general(
                x_ref[:, t * span + half : (t + 1) * span],
                w_lo.astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            w_s8 = jnp.concatenate([w_hi, w_lo], axis=0).astype(jnp.int8)  # (span, bn)
            acc += jax.lax.dot_general(
                x_ref[:, t * span : (t + 1) * span],
                w_s8,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * alpha_ref[:].astype(jnp.float32)
        y = y + beta_ref[:].astype(jnp.float32)
        if out_dtype == jnp.int8:
            out_ref[:] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
        else:
            out_ref[:] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("groupsize", "span", "bm", "bn", "bk", "out_dtype", "interpret", "scales_replicated", "vmem_limit", "split_dots"),
)
def w4a8_matmul_packed(
    x_s8: jax.Array,  # (M, K) int8
    qweight: jax.Array,  # (K//2, N) int8, span layout
    wscales: jax.Array,  # (G, N) int8
    wzeros: jax.Array,  # (G, N) int8
    alpha: jax.Array,  # (N,) f32
    beta: Optional[jax.Array] = None,  # (N,) f32 epilogue bias (fused pre-round)
    *,
    groupsize: int = 128,
    span: int = 256,
    bm: int = 256,
    bn: int = 256,
    bk: Optional[int] = None,  # K block; multiple of span (default: one span)
    out_dtype=jnp.float32,
    interpret: bool = False,
    scales_replicated: bool = False,  # wscales/wzeros already (8G, N)
    vmem_limit: Optional[int] = None,  # raise Mosaic's VMEM budget (<=16MB phys)
    split_dots: bool = False,  # two half-span dots instead of concat+one dot
) -> jax.Array:
    """Raw fused kernel entry: y[m, n] = (sum_k x[m,k] * w_s8[k,n]) * alpha[n].

    Requires span == 2*groupsize, K % bk == 0, bk % span == 0, N % bn == 0.
    M is padded here to a multiple of bm.
    """
    m, k = x_s8.shape
    k2, n = qweight.shape
    assert 2 * k2 == k, (x_s8.shape, qweight.shape)
    assert span == 2 * groupsize, "kernel dequant assumes span = 2*groupsize"
    bk = bk or span
    assert bk % span == 0 and k % bk == 0, (k, bk, span)
    n_spans = bk // span
    nk = k // bk
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0, (n, bn)

    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        x_s8 = jnp.pad(x_s8, ((0, m_pad - m), (0, 0)))

    # 8x sublane replication so each K step reads an aligned (16, bn) block:
    # rows [16k, 16k+8) = group 2k, rows [16k+8, 16k+16) = group 2k+1
    # (engine params pre-replicate at conversion time to skip this per call)
    if scales_replicated:
        scales_x, zeros_x = wscales, wzeros
    else:
        scales_x = jnp.repeat(wscales, 8, axis=0)
        zeros_x = jnp.repeat(wzeros, 8, axis=0)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    grid = (m_pad // bm, n // bn, nk)
    out = pl.pallas_call(
        functools.partial(
            _kernel, nk=nk, n_spans=n_spans, span=span, out_dtype=out_dtype,
            split_dots=split_dots,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * n_spans, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * n_spans, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k + k2 * n + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_s8, qweight, scales_x, zeros_x, alpha.reshape(1, n), beta.reshape(1, n))
    if m_pad != m:
        out = out[:m]
    return out


def _wres_kernel(
    x_ref,  # (bm, K) int8
    qw_ref,  # (K//2, bn) int8 packed (full K)
    scales_ref,  # (16*nsp, bn) int8 replicated
    zeros_ref,  # (16*nsp, bn) int8
    alpha_ref,  # (1, bn) f32
    beta_ref,  # (1, bn) f32
    out_ref,  # (bm, bn) out_dtype
    ws_ref,  # (K, bn) int8 scratch — dequantized weight block
    *,
    nsp: int,
    span: int,
    out_dtype,
):
    i = pl.program_id(1)  # m index, innermost

    @pl.when(i == 0)
    def _():
        half = span // 2
        s_all = scales_ref[:].astype(jnp.int32)
        z_all = zeros_ref[:].astype(jnp.int32)
        for t in range(nsp):
            u = qw_ref[t * half : (t + 1) * half, :].astype(jnp.uint8).astype(jnp.int32)
            hi = u >> 4
            lo = u & 0xF
            r = 16 * t
            ws_ref[t * span : t * span + half, :] = (
                (hi - z_all[r : r + 1, :]) * s_all[r : r + 1, :]
            ).astype(jnp.int8)
            ws_ref[t * span + half : (t + 1) * span, :] = (
                (lo - z_all[r + 8 : r + 9, :]) * s_all[r + 8 : r + 9, :]
            ).astype(jnp.int8)

    acc = jax.lax.dot_general(
        x_ref[:], ws_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * alpha_ref[:].astype(jnp.float32)
    y = y + beta_ref[:].astype(jnp.float32)
    if out_dtype == jnp.int8:
        out_ref[:] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    else:
        out_ref[:] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("groupsize", "span", "bm", "bn", "out_dtype", "interpret",
                     "scales_replicated", "vmem_limit"),
)
def w4a8_matmul_wres(
    x_s8: jax.Array,  # (M, K) int8
    qweight: jax.Array,  # (K//2, N) int8, span layout
    wscales: jax.Array,  # (G, N) int8 (or (8G, N) with scales_replicated)
    wzeros: jax.Array,
    alpha: jax.Array,  # (N,) f32
    beta: Optional[jax.Array] = None,
    *,
    groupsize: int = 128,
    span: int = 256,
    bm: int = 512,
    bn: int = 512,
    out_dtype=jnp.float32,
    interpret: bool = False,
    scales_replicated: bool = False,
    vmem_limit: Optional[int] = None,
) -> jax.Array:
    """Dequant-ONCE fused GEMM: w-resident variant of w4a8_matmul_packed.

    Grid (N/bn, M/bm) with m innermost: the full-K (K, bn) int8 weight
    block is dequantized into VMEM scratch at the first m step and reused
    by every following m block, so the VPU dequant cost amortizes M/bm-fold
    (the k-blocked kernel re-unpacks per (m, n) tile — its VPU work was the
    gap to roofline at M=2048).  One full-K MXU contraction per step, no
    accumulator carry.  VMEM: x 2 x (bm, K) + packed (K/2, bn) + scratch
    (K, bn) + out 2 x (bm, bn) f32 — bm=512/bn=512/K=4096 ~ 10.5 MB.

    Reference comparison: this is the reference's dequant-then-GEMM split
    (linear.cu:21-51) done right — the INT8 weight block lives in VMEM for
    exactly one N-stripe instead of round-tripping through HBM."""
    m, k = x_s8.shape
    k2, n = qweight.shape
    assert 2 * k2 == k and span == 2 * groupsize
    nsp = k // span
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0, (n, bn)
    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        x_s8 = jnp.pad(x_s8, ((0, m_pad - m), (0, 0)))
    if scales_replicated:
        scales_x, zeros_x = wscales, wzeros
    else:
        scales_x = jnp.repeat(wscales, 8, axis=0)
        zeros_x = jnp.repeat(wzeros, 8, axis=0)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    grid = (n // bn, m_pad // bm)
    out = pl.pallas_call(
        functools.partial(_wres_kernel, nsp=nsp, span=span, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * nsp, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * nsp, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((k, bn), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k * (n // bn) + k2 * n + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_s8, qweight, scales_x, zeros_x, alpha.reshape(1, n), beta.reshape(1, n))
    if m_pad != m:
        out = out[:m]
    return out


def _pipe_kernel(
    x_ref,  # (bm, bk) int8 — block k-1 (one step behind the weight stream)
    qw_ref,  # (bk//2, bn) int8 packed — block k
    scales_ref,  # (16*n_spans, bn) int8 — block k
    zeros_ref,
    alpha_ref,  # (1, bn) f32
    beta_ref,
    out_ref,  # (bm, bn)
    acc_ref,  # (bm, bn) int32 scratch
    ws_a,  # (bk, bn) int8 scratch — dequantized weights, even blocks
    ws_b,  # (bk, bn) int8 scratch — odd blocks
    *,
    nk: int,
    n_spans: int,
    span: int,
    out_dtype,
):
    """Software-pipelined fused dequant-GEMM body.

    The K grid runs nk+1 steps: step k DEQUANTIZES block k (VPU) into the
    k%2 scratch while DOTTING block k-1 (MXU) from the other scratch — the
    two are dataflow-independent within a step, so Mosaic can overlap them,
    hiding the dequant that runs serially in the plain kernel (measured
    ~25% of the step at bk=1024 in a clean window)."""
    k = pl.program_id(2)
    half = span // 2

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def deq(tgt_ref):
        s_all = scales_ref[:].astype(jnp.int32)
        z_all = zeros_ref[:].astype(jnp.int32)
        for t in range(n_spans):
            byte = qw_ref[t * half : (t + 1) * half, :].astype(jnp.int32) & 0xFF
            hi = byte >> 4
            lo = byte & 0xF
            r = 16 * t
            tgt_ref[t * span : t * span + half, :] = (
                (hi - z_all[r : r + 1, :]) * s_all[r : r + 1, :]
            ).astype(jnp.int8)
            tgt_ref[t * span + half : (t + 1) * span, :] = (
                (lo - z_all[r + 8 : r + 9, :]) * s_all[r + 8 : r + 9, :]
            ).astype(jnp.int8)

    def dot_from(src_ref):
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], src_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # dot block k-1 (resident in ws[(k-1) % 2]); dequant block k into ws[k % 2]
    @pl.when((k >= 1) & ((k - 1) % 2 == 0))
    def _():
        dot_from(ws_a)

    @pl.when((k >= 1) & ((k - 1) % 2 == 1))
    def _():
        dot_from(ws_b)

    @pl.when((k < nk) & (k % 2 == 0))
    def _():
        deq(ws_a)

    @pl.when((k < nk) & (k % 2 == 1))
    def _():
        deq(ws_b)

    @pl.when(k == nk)
    def _():
        y = acc_ref[:].astype(jnp.float32) * alpha_ref[:].astype(jnp.float32)
        y = y + beta_ref[:].astype(jnp.float32)
        if out_dtype == jnp.int8:
            out_ref[:] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
        else:
            out_ref[:] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("groupsize", "span", "bm", "bn", "bk", "out_dtype",
                     "interpret", "scales_replicated", "vmem_limit"),
)
def w4a8_matmul_pipe(
    x_s8: jax.Array,  # (M, K) int8
    qweight: jax.Array,  # (K//2, N) int8, span layout
    wscales: jax.Array,  # (G, N) int8
    wzeros: jax.Array,
    alpha: jax.Array,  # (N,) f32
    beta: Optional[jax.Array] = None,
    *,
    groupsize: int = 128,
    span: int = 256,
    bm: int = 2048,
    bn: int = 256,
    bk: Optional[int] = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
    scales_replicated: bool = False,
    vmem_limit: Optional[int] = None,
) -> jax.Array:
    """Pipelined fused W4A8 dequant-GEMM (see _pipe_kernel).  Semantics
    identical to w4a8_matmul_packed; K grid has one extra drain step."""
    m, k = x_s8.shape
    k2, n = qweight.shape
    assert 2 * k2 == k and span == 2 * groupsize
    bk = bk or span
    assert bk % span == 0 and k % bk == 0, (k, bk, span)
    n_spans = bk // span
    nk = k // bk
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0, (n, bn)

    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        x_s8 = jnp.pad(x_s8, ((0, m_pad - m), (0, 0)))
    if scales_replicated:
        scales_x, zeros_x = wscales, wzeros
    else:
        scales_x = jnp.repeat(wscales, 8, axis=0)
        zeros_x = jnp.repeat(wzeros, 8, axis=0)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    last = nk - 1
    grid = (m_pad // bm, n // bn, nk + 1)
    out = pl.pallas_call(
        functools.partial(
            _pipe_kernel, nk=nk, n_spans=n_spans, span=span, out_dtype=out_dtype
        ),
        grid=grid,
        in_specs=[
            # x one step behind the weight stream (block k-1 at step k)
            pl.BlockSpec((bm, bk),
                         lambda i, j, kk: (i, jnp.maximum(kk - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn),
                         lambda i, j, kk: (jnp.minimum(kk, last), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * n_spans, bn),
                         lambda i, j, kk: (jnp.minimum(kk, last), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * n_spans, bn),
                         lambda i, j, kk: (jnp.minimum(kk, last), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.VMEM((bk, bn), jnp.int8),
            pltpu.VMEM((bk, bn), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k + k2 * n + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_s8, qweight, scales_x, zeros_x, alpha.reshape(1, n), beta.reshape(1, n))
    if m_pad != m:
        out = out[:m]
    return out


def _rp_deq(qw_ref, scales_ref, zeros_ref, tgt_ref, n_groups: int, gs: int,
            interpret: bool):
    """Dequantize a rowpair-shifted packed block into int8 in VMEM.

    The bitcast yields the (gs, bn) s4 code view directly (zero shift/mask
    work — the span layout's unpack chain is gone); dequant is one
    subtract + multiply per element in the integer domain:
    (c4 - (z - 8)) * s == (c - z) * s exactly."""
    from dgq_tpu.ops.fused_decode import _bitcast_rows_s4

    hb = gs // 2
    s_all = scales_ref[:].astype(jnp.int32)
    z_all = zeros_ref[:].astype(jnp.int32)
    for g in range(n_groups):
        w4 = _bitcast_rows_s4(qw_ref[g * hb : (g + 1) * hb, :], interpret)
        r = 8 * g  # scales replicated 8x per group
        z4 = z_all[r : r + 1, :] - 8
        tgt_ref[g * gs : (g + 1) * gs, :] = (
            (w4.astype(jnp.int32) - z4) * s_all[r : r + 1, :]
        ).astype(jnp.int8)


def _rp_pipe_kernel(
    x_ref,  # (bm, bk) int8 — block k-1 (one step behind the weight stream)
    qw_ref,  # (bk//2, bn) int8 rowpair-shifted — block k
    scales_ref,  # (8*n_groups, bn) int8 replicated — block k
    zeros_ref,
    alpha_ref,  # (1, bn) f32
    beta_ref,
    out_ref,  # (bm, bn)
    acc_ref,  # (bm, bn) int32 scratch
    ws_a,  # (bk, bn) int8 scratch — dequantized weights, even blocks
    ws_b,
    *,
    nk: int,
    n_groups: int,
    gs: int,
    out_dtype,
    interpret: bool,
):
    """_pipe_kernel on the ROWPAIR-SHIFTED layout (pack_rowpair_s4): the
    software pipeline is identical, but the VPU dequant that overlaps the
    MXU dot shrinks from unpack(shift/mask)+dequant to bitcast+dequant."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def dot_from(src_ref):
        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], src_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @pl.when((k >= 1) & ((k - 1) % 2 == 0))
    def _():
        dot_from(ws_a)

    @pl.when((k >= 1) & ((k - 1) % 2 == 1))
    def _():
        dot_from(ws_b)

    @pl.when((k < nk) & (k % 2 == 0))
    def _():
        _rp_deq(qw_ref, scales_ref, zeros_ref, ws_a, n_groups, gs, interpret)

    @pl.when((k < nk) & (k % 2 == 1))
    def _():
        _rp_deq(qw_ref, scales_ref, zeros_ref, ws_b, n_groups, gs, interpret)

    @pl.when(k == nk)
    def _():
        y = acc_ref[:].astype(jnp.float32) * alpha_ref[:].astype(jnp.float32)
        y = y + beta_ref[:].astype(jnp.float32)
        if out_dtype == jnp.int8:
            out_ref[:] = jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
        else:
            out_ref[:] = y.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("groupsize", "bm", "bn", "bk", "out_dtype",
                     "interpret", "scales_replicated", "vmem_limit"),
)
def w4a8_matmul_rp_pipe(
    x_s8: jax.Array,  # (M, K) int8
    qw_rp: jax.Array,  # (K//2, N) int8, ROWPAIR-SHIFTED layout
    wscales: jax.Array,  # (G, N) int8
    wzeros: jax.Array,
    alpha: jax.Array,  # (N,) f32
    beta: Optional[jax.Array] = None,
    *,
    groupsize: int = 128,
    bm: int = 2048,
    bn: int = 256,
    bk: Optional[int] = None,
    out_dtype=jnp.float32,
    interpret: bool = False,
    scales_replicated: bool = False,
    vmem_limit: Optional[int] = None,
) -> jax.Array:
    """Pipelined fused W4A8 dequant-GEMM on the rowpair-shifted layout
    (native-s4 storage; see ops/fused_decode.pack_rowpair_s4).  Bit-
    identical to w4a8_matmul_pipe on the same quantized layer; the weight
    bytes bitcast to the s4 code matrix in VMEM with zero unpack work."""
    m, k = x_s8.shape
    k2, n = qw_rp.shape
    assert 2 * k2 == k and k % groupsize == 0
    bk = bk or 2 * groupsize
    assert bk % groupsize == 0 and k % bk == 0, (k, bk, groupsize)
    n_groups = bk // groupsize
    nk = k // bk
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0, (n, bn)

    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        x_s8 = jnp.pad(x_s8, ((0, m_pad - m), (0, 0)))
    if scales_replicated:
        scales_x, zeros_x = wscales, wzeros
    else:
        scales_x = jnp.repeat(wscales, 8, axis=0)
        zeros_x = jnp.repeat(wzeros, 8, axis=0)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    last = nk - 1
    grid = (m_pad // bm, n // bn, nk + 1)
    out = pl.pallas_call(
        functools.partial(
            _rp_pipe_kernel, nk=nk, n_groups=n_groups, gs=groupsize,
            out_dtype=out_dtype, interpret=interpret,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk),
                         lambda i, j, kk: (i, jnp.maximum(kk - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn),
                         lambda i, j, kk: (jnp.minimum(kk, last), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * n_groups, bn),
                         lambda i, j, kk: (jnp.minimum(kk, last), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * n_groups, bn),
                         lambda i, j, kk: (jnp.minimum(kk, last), j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32),
            pltpu.VMEM((bk, bn), jnp.int8),
            pltpu.VMEM((bk, bn), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            **({"vmem_limit_bytes": vmem_limit} if vmem_limit else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k + k2 * n + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_s8, qw_rp, scales_x, zeros_x, alpha.reshape(1, n), beta.reshape(1, n))
    if m_pad != m:
        out = out[:m]
    return out


def unpack_rowpair_s4(qw_rp: jax.Array) -> jax.Array:
    """(K//2, N) rowpair-shifted bytes -> (K, N) int8 SHIFTED codes
    (c - 8) in [-8, 7] — the XLA-fallback unpack of pack_rowpair_s4."""
    u = jax.lax.bitcast_convert_type(qw_rp, jnp.uint8).astype(jnp.int32)
    lo = ((u & 0xF) ^ 8) - 8
    hi = ((u >> 4) ^ 8) - 8
    k2, n = qw_rp.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * k2, n).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("groupsize", "out_dtype"))
def w4a8_matmul_rp_xla(
    x_s8: jax.Array,
    qw_rp: jax.Array,
    wscales: jax.Array,  # (G, N) int8 compact
    wzeros: jax.Array,
    alpha: jax.Array,
    beta: Optional[jax.Array] = None,
    *,
    groupsize: int = 128,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Kernel-free rowpair GEMM (CPU / odd-shape fallback): dequant fusion
    + XLA s8 GEMM, numerics identical to w4a8_matmul_rp_pipe."""
    k2, n = qw_rp.shape
    k = 2 * k2
    c4 = unpack_rowpair_s4(qw_rp).astype(jnp.int32)
    z4 = jnp.repeat(wzeros.astype(jnp.int32) - 8, groupsize, axis=0)
    s = jnp.repeat(wscales.astype(jnp.int32), groupsize, axis=0)
    w_s8 = ((c4 - z4) * s).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_s8, w_s8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * alpha.reshape(1, n)
    if beta is not None:
        y = y + beta.reshape(1, n)
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    return y.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("groupsize", "span", "out_dtype")
)
def w4a8_matmul_twopass(
    x_s8: jax.Array,  # (M, K) int8
    qweight: jax.Array,  # (K//2, N) int8, span layout
    wscales: jax.Array,  # (G, N) int8
    wzeros: jax.Array,
    alpha: jax.Array,  # (N,) f32
    beta: Optional[jax.Array] = None,
    *,
    groupsize: int = 128,
    span: int = 256,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Two-pass fused dequant-GEMM: an XLA elementwise dequant fusion
    materializes the INT8 weight, then XLA's own s8 x s8 -> s32 GEMM runs the
    contraction, with the per-channel f32 epilogue fused after.

    This is the reference's own structure (separate dequant launch before
    the CUTLASS GEMM, linear.cu:21-51), kept as a kernel-free fallback and
    a design-space datapoint.  Measured on v5e (round 3, same-window
    matrix): ~117-145 TOPS — SLOWER than the fused Pallas kernels, because
    XLA widens the dequant fusion to int32 and materializes multi-hundred-MB
    intermediates (codes/scales/zeros each (K, N) int32) where the Pallas
    kernels unpack per-block in VMEM.  Use w4a8_matmul_wres /
    w4a8_matmul_pipe / w4a8_matmul_packed on TPU.  Semantics identical to
    w4a8_matmul_packed."""
    from dgq_tpu.quant.packing import unpack_nibbles

    k2, n = qweight.shape
    codes = unpack_nibbles(qweight, span).astype(jnp.int32)
    scales_k = jnp.repeat(wscales.astype(jnp.int32), groupsize, axis=0)
    zeros_k = jnp.repeat(wzeros.astype(jnp.int32), groupsize, axis=0)
    w8 = ((codes - zeros_k) * scales_k).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_s8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * alpha[None, :]
    if beta is not None:
        y = y + beta[None, :].astype(jnp.float32)
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def quantize_static_int8(x: jax.Array, amax: jax.Array) -> jax.Array:
    """Static symmetric int8 activation quantization (scale = amax/127).
    reference: quant_linear.py:66-71, integer output variant."""
    scale = amax.astype(jnp.float32) / 127.0
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


def w4a8_matmul(
    x: jax.Array,  # (..., K) fp activations
    lin: PackedLinear,
    *,
    out_dtype=jnp.float32,
    bm: int = 256,
    bn: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Full W4A8 linear: static int8 act quant -> fused dequant GEMM ->
    per-channel fp epilogue (+bias).  The engine-path equivalent of the
    reference's W4A8BF32OF32Linear.forward (models/linear.py:76-85)."""
    assert lin.w4w8 and lin.span == 2 * lin.groupsize, "kernel needs span-packed w4w8 weights"
    x2 = x.reshape(-1, x.shape[-1])
    x_s8 = quantize_static_int8(x2, lin.amax)
    input_scale = lin.amax.astype(jnp.float32) / 127.0
    alpha = lin.wscales8.astype(jnp.float32) * input_scale
    y = w4a8_matmul_packed(
        x_s8,
        lin.qweight,
        lin.wscales,
        lin.wzeros,
        alpha,
        # fused epilogue bias; int8-out callers scale their own beta
        lin.bias if out_dtype != jnp.int8 else None,
        groupsize=lin.groupsize,
        span=lin.span,
        bm=bm,
        bn=bn,
        out_dtype=jnp.float32 if out_dtype != jnp.int8 else jnp.int8,
        interpret=interpret,
    )
    y = y.astype(out_dtype) if out_dtype != jnp.int8 else y
    return y.reshape(*x.shape[:-1], lin.out_features)


def w4a8_matmul_xla(
    x: jax.Array,
    lin: PackedLinear,
    *,
    out_dtype=jnp.float32,
) -> jax.Array:
    """XLA reference path (golden model for the kernel, and fallback for
    non-span layouts): dequantize to int8, s8xs8->s32 dot, fp epilogue."""
    x2 = x.reshape(-1, x.shape[-1])
    x_s8 = quantize_static_int8(x2, lin.amax)
    w_s8 = dequantize_to_int8(lin)  # (K, N)
    acc = jax.lax.dot_general(
        x_s8,
        w_s8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    input_scale = lin.amax.astype(jnp.float32) / 127.0
    alpha = lin.wscales8.astype(jnp.float32) * input_scale
    y = acc.astype(jnp.float32) * alpha[None, :]
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8).reshape(
            *x.shape[:-1], lin.out_features
        )
    if lin.bias is not None:
        y = y + lin.bias
    return y.astype(out_dtype).reshape(*x.shape[:-1], lin.out_features)


def _fpscale_kernel(
    x_ref,  # (bm, bk) int8, bk = n_spans * span
    qw_ref,  # (bk//2, bn) int8 span-packed raw codes
    scales_ref,  # (16*n_spans, bn) f32 group scales, 8x-replicated rows
    zeros_ref,  # (16*n_spans, bn) f32
    alpha_ref,  # (1, bn) f32
    beta_ref,  # (1, bn) f32
    out_ref,  # (bm, bn) f32
    acc_ref,  # (bm, bn) f32 scratch
    *,
    nk: int,
    n_spans: int,
    span: int,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    half = span // 2
    s_all = scales_ref[:]
    z_all = zeros_ref[:]

    acc = acc_ref[:]
    for t in range(n_spans):
        byte = qw_ref[t * half : (t + 1) * half, :].astype(jnp.int32) & 0xFF
        hi = (byte >> 4).astype(jnp.int8)
        lo = (byte & 0xF).astype(jnp.int8)
        x_hi = x_ref[:, t * span : t * span + half]
        x_lo = x_ref[:, t * span + half : (t + 1) * span]
        d_hi = jax.lax.dot_general(
            x_hi, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        d_lo = jax.lax.dot_general(
            x_lo, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        cs_hi = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        cs_lo = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.float32)
        r = 16 * t
        s_h, z_h = s_all[r : r + 1, :], z_all[r : r + 1, :]
        s_l, z_l = s_all[r + 8 : r + 9, :], z_all[r + 8 : r + 9, :]
        acc = acc + s_h * (d_hi.astype(jnp.float32) - z_h * cs_hi)
        acc = acc + s_l * (d_lo.astype(jnp.float32) - z_l * cs_lo)
    acc_ref[:] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:] * alpha_ref[:] + beta_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("groupsize", "span", "bm", "bn", "bk", "interpret"),
)
def w4a8_fpscale_matmul_packed(
    x_s8: jax.Array,  # (M, K) int8
    qweight: jax.Array,  # (K//2, N) int8, span layout
    wscales: jax.Array,  # (G, N) f32 per-group FP scales
    wzeros: jax.Array,  # (G, N) f32
    alpha: jax.Array,  # (N,) f32 (typically input_scale per channel)
    beta: Optional[jax.Array] = None,
    *,
    groupsize: int = 128,
    span: int = 256,
    bm: int = 256,
    bn: int = 256,
    bk: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused W4A8 GEMM for *fp-group-scale* weights — the engine path for
    w4w8 fallback layers (BASELINE config 3).

    Since fp scales cannot ride the INT8 MXU mainloop, the dot is decomposed
    per group:  y = sum_g s_g * (x_g . q_g  -  z_g * sum_k x_g)
    — MXU dots on the raw 4-bit codes, fp scaling applied to the (bm, bn)
    partial outputs, zero correction via a column-sum outer product.  Exact
    (no fp inside the integer contraction)."""
    m, k = x_s8.shape
    k2, n = qweight.shape
    assert 2 * k2 == k and span == 2 * groupsize
    bk = bk or span
    assert bk % span == 0 and k % bk == 0
    n_spans = bk // span
    nk = k // bk
    if n % bn != 0:
        bn = n if n < bn else 128
    assert n % bn == 0

    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        x_s8 = jnp.pad(x_s8, ((0, m_pad - m), (0, 0)))

    scales_x = jnp.repeat(wscales.astype(jnp.float32), 8, axis=0)
    zeros_x = jnp.repeat(wzeros.astype(jnp.float32), 8, axis=0)
    if beta is None:
        beta = jnp.zeros((n,), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_fpscale_kernel, nk=nk, n_spans=n_spans, span=span),
        grid=(m_pad // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * n_spans, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * n_spans, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_s8, qweight, scales_x, zeros_x, alpha.reshape(1, n), beta.reshape(1, n))
    if m_pad != m:
        out = out[:m]
    return out
