"""Uniform affine quantizer math.

Functional re-design of the reference scalar quantizer
(reference: dgq/quant/quantizer.py:7-130): min/max scale/zero search with an
optional MSE grid-shrink, plus the affine quantize/dequantize primitive.  The
reference is a stateful nn.Module; here every operation is a pure jnp function
returning a :class:`QuantParams` pytree, so it jits, vmaps, and shards.

Numerics are kept bit-faithful to the reference (SURVEY §7 "hard parts"):
zero-range handling (xmin==xmax==0 -> [-1, 1]), symmetric mirroring, the
``p = 1 - i/grid`` shrink schedule, and ``zero = round(-xmin/scale)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantParams(NamedTuple):
    """Per-row affine quantization parameters (scale, zero, maxq)."""

    scale: jax.Array  # (rows,) or broadcastable
    zero: jax.Array  # (rows,) float (rounded integer values)
    maxq: int  # 2**bits - 1, python int (static)


def affine_quantize_values(x, scale, zero, maxq: int):
    """Integer codes: clamp(round(x/scale) + zero, 0, maxq).

    reference: dgq/quant/quantizer.py:31
    """
    return jnp.clip(jnp.round(x / scale) + zero, 0, maxq)


def affine_quantize(x, scale, zero, maxq: int):
    """Fake-quantize: scale * (q - zero). reference: quantizer.py:28-32."""
    q = affine_quantize_values(x, scale, zero, maxq)
    return scale * (q - zero)


def _minmax_params(x2d, maxq: int, sym: bool):
    """Per-row min/max scale+zero for a 2D (rows, elems) view.

    reference: dgq/quant/quantizer.py:53-74
    """
    xmin = jnp.minimum(jnp.min(x2d, axis=1), 0.0)
    xmax = jnp.maximum(jnp.max(x2d, axis=1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)

    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)
    return xmin, xmax, scale, zero


def find_params(
    x2d: jax.Array,
    bits: int,
    *,
    sym: bool = False,
    mse: bool = False,
    norm: float = 2.4,
    grid: int = 100,
    maxshrink: float = 0.8,
) -> QuantParams:
    """Per-row quantization parameters for a 2D (rows, elems) array.

    The caller is responsible for the reshape that defines "rows": flattened
    weight rows for per-channel weight quant, per-group rows for grouped
    quant, a single row for per-tensor.  This replaces the reference's
    shape-juggling branches (reference: quantizer.py:39-51, 94-115) with an
    explicit caller contract.

    With ``mse=True``, runs the reference's shrink grid search
    (reference: quantizer.py:76-93): p = 1 - i/grid for
    i in [0, maxshrink*grid), minimizing sum |q(x) - x|^norm per row.
    """
    maxq = 2**bits - 1
    x2d = x2d.astype(jnp.float32)
    xmin, xmax, scale, zero = _minmax_params(x2d, maxq, sym)

    if not mse:
        return QuantParams(scale=scale, zero=zero, maxq=maxq)

    nsteps = int(maxshrink * grid)
    ps = 1.0 - jnp.arange(nsteps, dtype=jnp.float32) / grid

    def step(carry, p):
        best, bscale, bzero = carry
        xmin1 = p * xmin
        xmax1 = p * xmax
        scale1 = (xmax1 - xmin1) / maxq
        zero1 = zero if sym else jnp.round(-xmin1 / scale1)
        q = affine_quantize(x2d, scale1[:, None], zero1[:, None], maxq)
        err = jnp.sum(jnp.abs(q - x2d) ** norm, axis=1)
        better = err < best
        return (
            jnp.where(better, err, best),
            jnp.where(better, scale1, bscale),
            jnp.where(better, zero1, bzero),
        ), None

    init = (jnp.full((x2d.shape[0],), jnp.inf, dtype=jnp.float32), scale, zero)
    (best, scale, zero), _ = jax.lax.scan(step, init, ps)
    del best
    return QuantParams(scale=scale, zero=zero, maxq=maxq)


def quantize_with(params: QuantParams, x: jax.Array) -> jax.Array:
    """Fake-quantize ``x`` with broadcastable params."""
    return affine_quantize(x, params.scale, params.zero, params.maxq)


def find_params_weight_grouped(w: jax.Array, bits: int, groupsize: int, *, sym: bool = False, mse: bool = False) -> QuantParams:
    """Grouped per-(row, group) params for a 2D weight (out, in).

    Returns params with scale/zero of shape (out * in//groupsize,), matching
    the reference's ``view(-1, groupsize)`` flattening
    (reference: quantizer_helper.py:103-107).
    """
    out_f, in_f = w.shape
    if groupsize <= 0:
        groupsize = in_f
    wg = w.reshape(-1, groupsize)
    return find_params(wg, bits, sym=sym, mse=mse)
