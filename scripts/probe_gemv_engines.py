"""Raw GEMV engine rates at decode shapes (M=8), measured via dedicated
Pallas kernels:

  * mxu: plain int8 dot_general per (K, bn) block — no dequant at all.
    Gives the true MXU stationary-feed cap.
  * vpu: broadcast-MAC formulation sum_k x[k] * W[k, :] as sublane
    mul + reduce — no MXU involvement.  Gives the VPU GEMV cap.
  * mix: columns split between the two paths in the same kernel —
    tests whether the engines overlap.

Rates in G elem/s of weight material consumed; decode is weight-element
feed-bound so elem/s is the figure of merit.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

K, N, B = 4096, 12288, 8


def _mxu_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _vpu_kernel(x_ref, w_ref, o_ref, *, nk):
    # y[n] = sum_k x[k] w[k, n] with x arranged (K/8, 8) so each k-chunk is
    # a sublane-broadcast multiply of an (8, bn) vreg row block
    acc = jnp.zeros(o_ref.shape, jnp.int32)
    ck = K // nk
    for i in range(nk):
        w = w_ref[i * ck : (i + 1) * ck, :].astype(jnp.int32)  # (ck, bn)
        xs = x_ref[0, i * ck : (i + 1) * ck].astype(jnp.int32)  # (ck,)
        acc += jnp.sum(xs[:, None] * w, axis=0, keepdims=True)
    o_ref[:] = acc


def mxu_gemv(x, w, bn=512):
    return pl.pallas_call(
        _mxu_kernel,
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
    )(x, w)


def vpu_gemv(x, w, bn=512, nk=8):
    return pl.pallas_call(
        functools.partial(_vpu_kernel, nk=nk),
        grid=(N // bn,),
        in_specs=[
            pl.BlockSpec((1, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
    )(x[:1], w)


def _mix_kernel(x_ref, wm_ref, wv_ref, om_ref, ov_ref, *, nk):
    om_ref[:] = jax.lax.dot_general(
        x_ref[:], wm_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    _vpu_kernel(x_ref[:1].reshape(1, K), wv_ref, ov_ref, nk=nk)


class _Ref:
    def __init__(self, v):
        self.v = v

    def __getitem__(self, s):
        return self.v[s]


def mix_gemv(x, w, bn=512, nk=8, frac=0.5):
    nm = int(N * frac / 256) * 256

    def kern(x_ref, wm_ref, wv_ref, om_ref, ov_ref):
        om_ref[:] = jax.lax.dot_general(
            x_ref[:], wm_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = jnp.zeros(ov_ref.shape, jnp.int32)
        ck = K // nk
        for i in range(nk):
            wv = wv_ref[i * ck : (i + 1) * ck, :].astype(jnp.int32)
            xs = x_ref[0, i * ck : (i + 1) * ck].astype(jnp.int32)
            acc += jnp.sum(xs[:, None] * wv, axis=0, keepdims=True)
        ov_ref[:] = acc

    bm_n = nm // (N // bn) if nm else 0  # per-step mxu columns
    bv_n = (N - nm) // (N // bn)
    grid = N // bn
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bm_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bv_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, bm_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nm), jnp.int32),
            jax.ShapeDtypeStruct((1, N - nm), jnp.int32),
        ],
    )(x, w[:, :nm], w[:, nm:])


def main():
    r = np.random.default_rng(0)
    w = jnp.asarray(r.integers(-127, 127, (K, N)), jnp.int8)
    x = jnp.asarray(r.integers(-127, 127, (B, K)), jnp.int8)

    def fb(out, xin):
        lead = out[0] if isinstance(out, (list, tuple)) else out
        return (lead[:1, :K].astype(jnp.int32) & 0x7F).astype(jnp.int8) * jnp.int8(1) + xin * jnp.int8(0)

    cands = (
        ("mxu bn=512 ", lambda a: mxu_gemv(a, w)),
        ("vpu nk=8   ", lambda a: vpu_gemv(a, w)),
        ("mix 50/50  ", lambda a: mix_gemv(a, w)),
        ("mix 2/3 mxu", lambda a: mix_gemv(a, w, frac=0.67)),
    )
    # interleaved reps: tunnel windows drift over minutes, so only
    # same-round-robin-pass comparisons are meaningful
    for rep in range(3):
        for name, f in cands:
            try:
                t = device_time(f, x, feedback=fb, iters=48, base_iters=12,
                                repeats=2)
                print(f"[{rep}] {name}: {t*1e6:7.1f} us -> {K*N/t/1e9:6.0f} G elem/s",
                      flush=True)
            except Exception as e:
                print(f"[{rep}] {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
