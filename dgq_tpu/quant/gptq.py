"""GPTQ weight quantization in JAX.

Re-implements the reference's GPTQ path
(reference: dgq/quant/quantizer_helper.py:202-302) functionally:

  * Hessian accumulation H = 2/n * sum X X^T as a running update
    (reference: quantizer_helper.py:63-66),
  * dead-column handling, damped Cholesky inverse
    (H -> chol -> inverse -> upper chol; quantizer_helper.py:218-238),
  * column-sequential quantization with error propagation, blocked at 128
    columns: within-block rank-1 updates ride the upper-triangular structure
    of Hinv (columns < i have zero coefficients), the cross-block update is a
    single GEMM (quantizer_helper.py:245-279),
  * per-group scale/zero refreshed from the *block-propagated* weight at each
    group boundary, exactly where the reference calls find_params
    (quantizer_helper.py:259-266),
  * optional activation ordering (act_order) by descending Hessian diagonal.

The column loop is a lax.fori_loop with a carried block; blocks are a
lax.scan carrying the full W (SURVEY §7: "GPTQ in JAX: sequential column
updates are a lax.scan with carried error matrix").

With ``act_order=True`` the Hessian ordering is used for error propagation
but the returned scales/zeros are re-derived on contiguous groups of the
final fake-quant weight, because the packed-linear schema stores contiguous
groups (the reference's act_order+groupsize interplay is broken anyway —
SURVEY §7 "reference quirks").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dgq_tpu.quant.quantizer import find_params


class GPTQResult(NamedTuple):
    scale: jax.Array  # (N, G)
    zero: jax.Array  # (N, G)
    qweight_fp: jax.Array  # (N, K) dequantized fake-quant weight
    error: jax.Array  # scalar sum of losses


def init_hessian(k: int) -> tuple[jax.Array, jax.Array]:
    """Fresh (H, nsamples) accumulator state."""
    return jnp.zeros((k, k), jnp.float32), jnp.zeros((), jnp.float32)


@partial(jax.jit, static_argnames=("batches",))
def update_hessian(H: jax.Array, nsamples: jax.Array, inp: jax.Array,
                   batches: int = 1):
    """Running Hessian update for activations inp (..., K).

    reference: quantizer_helper.py:49-66 — H *= n/(n+b); H += 2/(n+b) X X^T.
    The reference counts batches (leading dim), one per call; a chunked
    caller (dp-sharded calibration) passes ``batches`` = samples in inp so
    the weighted running average stays exactly the sequential one.
    """
    x = inp.reshape(-1, inp.shape[-1]).astype(jnp.float32)
    b = jnp.asarray(float(batches), jnp.float32)
    new_n = nsamples + b
    H = H * (nsamples / new_n)
    x = jnp.sqrt(2.0 / new_n) * x
    return H + x.T @ x, new_n


def _find_params_cols(Wg: jax.Array, maxq: int):
    """Per-row asymmetric min/max params for a (N, g) column group —
    matches quantizer.find_params(x, weight=True) with perchannel, asym."""
    p = find_params(Wg, bits=_bits_of(maxq), sym=False, mse=False)
    return p.scale, p.zero


def _bits_of(maxq: int) -> int:
    return int(maxq).bit_length()


@partial(jax.jit, static_argnames=("bits", "groupsize", "blocksize", "act_order"))
def gptq_quantize(
    W: jax.Array,
    H: jax.Array,
    *,
    bits: int = 4,
    groupsize: int = 128,
    blocksize: int = 128,
    percdamp: float = 0.01,
    act_order: bool = False,
) -> GPTQResult:
    W = W.astype(jnp.float32)
    H = H.astype(jnp.float32)
    n, k = W.shape
    maxq = 2**bits - 1
    if groupsize <= 0:
        groupsize = k
    blocksize = min(blocksize, k)
    if k % blocksize != 0:
        import math as _math

        blocksize = _math.gcd(k, blocksize)
    assert k % groupsize == 0 and k % blocksize == 0
    g = k // groupsize

    diag = jnp.diag(H)
    dead = diag == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = jnp.where(dead[None, :], 0.0, W)

    if act_order:
        perm = jnp.argsort(-jnp.diag(H))
        W = W[:, perm]
        H = H[perm][:, perm]

    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(k, dtype=jnp.float32)
    # Hinv = upper-Cholesky of H^{-1}  (reference: quantizer_helper.py:235-238)
    L = jnp.linalg.cholesky(H)
    Hfullinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(k, dtype=jnp.float32))
    Hinv = jnp.linalg.cholesky(Hfullinv, upper=True)

    nblocks = k // blocksize

    def block_step(carry, b):
        W_cur, Q, losses, scales, zeros = carry
        i1 = b * blocksize
        W1 = jax.lax.dynamic_slice(W_cur, (0, i1), (n, blocksize))
        Hinv_rows = jax.lax.dynamic_slice(Hinv, (i1, 0), (blocksize, k))
        Hinv1 = jax.lax.dynamic_slice(Hinv_rows, (0, i1), (blocksize, blocksize))

        def col_step(i, st):
            W1_, Q1, Err1, L1, sc, sz, cur_scale, cur_zero = st
            gidx = (i1 + i) // groupsize

            def refresh(_):
                Wgrp = jax.lax.dynamic_slice(W_cur, (0, (i1 + i) // groupsize * groupsize), (n, groupsize))
                p = find_params(Wgrp, bits, sym=False, mse=False)
                return p.scale, p.zero

            at_boundary = (i1 + i) % groupsize == 0
            cur_scale, cur_zero = jax.lax.cond(
                at_boundary, refresh, lambda _: (cur_scale, cur_zero), None
            )
            sc = jax.lax.cond(
                at_boundary,
                lambda s: jax.lax.dynamic_update_slice(s, cur_scale[None, :], (gidx, 0)),
                lambda s: s,
                sc,
            )
            sz = jax.lax.cond(
                at_boundary,
                lambda s: jax.lax.dynamic_update_slice(s, cur_zero[None, :], (gidx, 0)),
                lambda s: s,
                sz,
            )

            w = W1_[:, i]
            d = Hinv1[i, i]
            q = jnp.clip(jnp.round(w / cur_scale) + cur_zero, 0, maxq)
            q = cur_scale * (q - cur_zero)
            err = (w - q) / d
            # Hinv1[i, :i] == 0 (upper triangular) so the full-row update
            # only touches columns >= i, like the reference's W1[:, i:].
            W1_ = W1_ - err[:, None] * Hinv1[i, :][None, :]
            Q1 = Q1.at[:, i].set(q)
            Err1 = Err1.at[:, i].set(err)
            L1 = L1.at[:, i].set((w - q) ** 2 / d**2)
            return W1_, Q1, Err1, L1, sc, sz, cur_scale, cur_zero

        init = (
            W1,
            jnp.zeros_like(W1),
            jnp.zeros_like(W1),
            jnp.zeros_like(W1),
            scales,
            zeros,
            jnp.ones((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
        )
        _, Q1, Err1, L1, scales, zeros, _, _ = jax.lax.fori_loop(0, blocksize, col_step, init)

        Q = jax.lax.dynamic_update_slice(Q, Q1, (0, i1))
        losses = losses + jnp.sum(L1) / 2.0
        # cross-block propagation; columns < i1 see zero coefficients
        # (upper-tri), columns in [i1, i1+B) are never read again.
        W_cur = W_cur - Err1 @ Hinv_rows
        return (W_cur, Q, losses, scales, zeros), None

    carry0 = (
        W,
        jnp.zeros_like(W),
        jnp.zeros((), jnp.float32),
        jnp.zeros((g, n), jnp.float32),
        jnp.zeros((g, n), jnp.float32),
    )
    (W_fin, Q, losses, scales, zeros), _ = jax.lax.scan(
        block_step, carry0, jnp.arange(nblocks)
    )
    del W_fin

    if act_order:
        invperm = jnp.argsort(perm)
        Q = Q[:, invperm]
        # re-derive contiguous-group params from the fake-quant weight (see
        # module docstring).
        p = find_params(Q.reshape(-1, groupsize), bits, sym=False, mse=False)
        scales = p.scale.reshape(n, g).T
        zeros = p.zero.reshape(n, g).T

    return GPTQResult(scale=scales.T, zero=zeros.T, qweight_fp=Q, error=losses)
