"""DGQ search-based weight quantization (the "--wt_fun search" path).

Re-implements the two-stage grid search of the reference
(reference: dgq/quant/quantizer_helper.py:116-200) as pure jitted functions:

  Stage 1 — per-group asymmetric INT4 params: a 20-point clip-ratio grid
  (1.009 -> 0.80) per group, scored by the layer-output MSE against the last
  calibration batch (reference keeps only the final add_batch input as
  ``self.inp1``; quantizer_helper.py:52).  The reference's cumulative
  ``W_t = W_t.clamp(...)`` inside the grid loop is replicated exactly.

  Stage 2 (w4w8) — per-output-row INT8 re-scaling: an 80-point grid
  (1.01 -> 0.20) over the row absmax choosing ``scale8 = absmax*r/127``;
  the group scale becomes the integer ``round(scale4/scale8).clamp(min=1)``
  and zeros are clamped to the int8-represented range
  ``[zero - floor(127/scale), zero + floor(127/scale)] ∩ [0, 15]`` so that
  ``(q - zero) * scale`` always fits int8 (the property the fused Pallas GEMM
  relies on).

Also provides the naive per-group min/max quantizer
(reference: quantizer_helper.py:96-114).

Deviations from the reference (documented, all strictly-better numerics):
  * math in f32 instead of bf16 (stage-1 scales are bf16-rounded between the
    stages to match the reference's bf16 buffers),
  * zero-valued groups get an epsilon scale guard instead of NaN.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.quant.quantizer import find_params_weight_grouped, quantize_with


class SearchResult(NamedTuple):
    scale: jax.Array  # (N, G) — integer-valued if w4w8 else fp group scale
    zero: jax.Array  # (N, G) integer-valued
    scale8: jax.Array  # (N,) fp per-channel scale (zeros if not w4w8)
    qweight_fp: jax.Array  # (N, K) dequantized fake-quant weight


def _bf16_round(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _stage1_group(W_t0, X_t, maxq: int, grid: int = 20):
    """One group's 20-point grid. W_t0 (N, gs), X_t (T, gs).

    reference: quantizer_helper.py:135-154
    """
    org_out = X_t @ W_t0.T  # (T, N)
    w_max = jnp.max(W_t0, axis=-1, keepdims=True)
    w_min = jnp.min(W_t0, axis=-1, keepdims=True)
    n = W_t0.shape[0]

    def body(i, st):
        W_t, best, bscale, bzero = st
        ratio = 1.02 - (i + 1).astype(jnp.float32) / grid * 0.22
        # cumulative clamp, exactly as the reference mutates W_t in-place
        W_t = jnp.clip(W_t, w_min * ratio, w_max * ratio)
        qscale = (w_max * ratio - w_min * ratio) / maxq
        qscale = jnp.where(qscale == 0, 1e-8, qscale)
        qzero = jnp.round(-w_min * ratio / qscale)
        qtensor = jnp.clip(jnp.round(W_t / qscale) + qzero, 0, maxq)
        W_qt = qscale * (qtensor - qzero)
        out = X_t @ W_qt.T
        mse = jnp.mean(jnp.square(org_out - out), axis=0)  # (N,)
        better = best > mse
        return (
            W_t,
            jnp.where(better, mse, best),
            jnp.where(better, qscale[:, 0], bscale),
            jnp.where(better, qzero[:, 0], bzero),
        )

    init = (
        W_t0,
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), jnp.float32),
    )
    _, _, bscale, bzero = jax.lax.fori_loop(0, grid, body, init)
    return bscale, bzero


def _w4w8_requant(W, scale1, zero1, s8, groupsize):
    """Re-quantize W under a candidate per-row scale8. Returns the
    dequantized weight and the integer group scale / clamp bounds.

    reference: quantizer_helper.py:171-185 (grid body) and 191-198 (final).
    """
    n, k = W.shape
    g = k // groupsize
    qs = jnp.clip(jnp.round(scale1 / s8[:, None]), 1.0, None)  # (N, G)
    int_max = jnp.floor(127.0 / qs)
    upper = jnp.clip(zero1 + int_max, None, 15.0)
    lower = jnp.clip(zero1 - int_max, 0.0, None)
    qsq = qs * s8[:, None]
    w_max = 127.0 * s8[:, None]
    Wc = jnp.clip(W, -w_max, w_max).reshape(n, g, groupsize)
    codes = jnp.clip(
        jnp.round(Wc / qsq[:, :, None]) + zero1[:, :, None],
        lower[:, :, None],
        upper[:, :, None],
    )
    W_q = (qsq[:, :, None] * (codes - zero1[:, :, None])).reshape(n, k)
    return W_q, qs


@partial(jax.jit, static_argnames=("bits", "groupsize", "w4w8", "grid1",
                                   "grid2", "with_fallback"))
def search_quantize(
    W: jax.Array,
    inp1: jax.Array,
    *,
    bits: int = 4,
    groupsize: int = 128,
    w4w8: bool = True,
    grid1: int = 20,
    grid2: int = 80,
    with_fallback: bool = False,
):
    """Full DGQ search on a weight W (N=out, K=in) with calibration
    activations inp1 (T, K).  reference: quantizer_helper.py:116-200.

    ``with_fallback=True`` (w4w8 only) additionally returns the PLAIN
    fp-group-scale result and both layer-output MSEs from the SAME search —
    stage 1 is shared between the two representations, so the w4w8-fallback
    decision (BASELINE config 3) costs two extra matmuls instead of a
    second full grid search.  Returns
    ``(res_w4w8, res_plain, err_w4w8, err_plain)``."""
    maxq = 2**bits - 1
    W = W.astype(jnp.float32)
    inp1 = inp1.astype(jnp.float32)
    n, k = W.shape
    if groupsize <= 0:
        groupsize = k
    assert k % groupsize == 0, f"in_features {k} % groupsize {groupsize} != 0"
    g = k // groupsize

    # ---- stage 1: per-group grid, scanned over groups (memory-bounded) ----
    Wg = W.reshape(n, g, groupsize).transpose(1, 0, 2)  # (G, N, gs)
    Xg = inp1.reshape(-1, g, groupsize).transpose(1, 0, 2)  # (G, T, gs)

    def scan_group(_, wx):
        w_t, x_t = wx
        bs, bz = _stage1_group(w_t, x_t, maxq, grid1)
        return None, (bs, bz)

    _, (scales_gn, zeros_gn) = jax.lax.scan(scan_group, None, (Wg, Xg))
    scale1 = _bf16_round(scales_gn.T)  # (N, G), bf16-rounded like the reference buffers
    zero1 = _bf16_round(zeros_gn.T)

    def _plain() -> SearchResult:
        wg = W.reshape(-1, groupsize)
        q = jnp.clip(jnp.round(wg / scale1.reshape(-1, 1)) + zero1.reshape(-1, 1), 0, maxq)
        qweight_fp = (scale1.reshape(-1, 1) * (q - zero1.reshape(-1, 1))).reshape(n, k)
        return SearchResult(scale1, zero1, jnp.zeros((n,), jnp.float32), qweight_fp)

    if not w4w8:
        assert not with_fallback, "with_fallback requires w4w8=True"
        return _plain()

    # ---- stage 2: per-row int8 rescale grid ----
    org_out = inp1 @ W.T  # (T, N)
    row_absmax = jnp.max(jnp.abs(W), axis=-1)  # (N,)

    def body2(i, st):
        best, bs8 = st
        ratio = 1.02 - (i + 1).astype(jnp.float32) / grid2 * 0.82
        s8 = row_absmax * ratio / 127.0
        s8 = jnp.where(s8 == 0, 1e-8, s8)
        W_q, _ = _w4w8_requant(W, scale1, zero1, s8, groupsize)
        out = inp1 @ W_q.T
        mse = jnp.mean(jnp.square(org_out - out), axis=0)
        better = best > mse
        return jnp.where(better, mse, best), jnp.where(better, s8, bs8)

    init2 = (jnp.full((n,), jnp.inf, jnp.float32), jnp.full((n,), 1e-8, jnp.float32))
    _, scale8 = jax.lax.fori_loop(0, grid2, body2, init2)

    # bf16-round scale8 to its checkpoint storage precision *before* the final
    # requant, so packing the fake-quant weight reproduces identical codes
    # (reference stores scales8 as bf16 in packW4W8; quant_linear.py:139).
    scale8 = _bf16_round(scale8)
    qweight_fp, qs = _w4w8_requant(W, scale1, zero1, scale8, groupsize)
    res = SearchResult(qs, zero1, scale8, qweight_fp)
    if not with_fallback:
        return res
    plain = _plain()
    err_w4w8 = jnp.mean(jnp.square(inp1 @ qweight_fp.T - org_out))
    err_plain = jnp.mean(jnp.square(inp1 @ plain.qweight_fp.T - org_out))
    return res, plain, err_w4w8, err_plain


@partial(jax.jit, static_argnames=("bits", "groupsize"))
def naive_quantize(W: jax.Array, *, bits: int = 4, groupsize: int = 128) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-group min/max quantization (the "--wt_fun naive" path).

    reference: quantizer_helper.py:96-114.  Returns (scale (N,G), zero (N,G),
    fake-quant weight (N,K)).
    """
    W = W.astype(jnp.float32)
    n, k = W.shape
    if groupsize <= 0:
        groupsize = k
    g = k // groupsize
    params = find_params_weight_grouped(W, bits, groupsize, sym=False, mse=False)
    wg = W.reshape(-1, groupsize)
    qw = quantize_with(
        params._replace(scale=params.scale[:, None], zero=params.zero[:, None]), wg
    ).reshape(n, k)
    return params.scale.reshape(n, g), params.zero.reshape(n, g), qw
