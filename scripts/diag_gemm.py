"""Diagnose fused-GEMM perf: compare XLA int8 GEMM, XLA bf16, Pallas plain
int8 GEMM, and the fused dequant GEMM."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, iters=30, warmup=5):
    for _ in range(warmup):
        fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def plain_int8_pallas(x, w, bm, bn, bk):
    m, k = x.shape
    _, n = w.shape
    nk = k // bk

    def kern(x_ref, w_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(kk == nk - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kern,
        grid=(m // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x, w)


def main():
    m, n, k = 2048, 4096, 4096
    flops = 2 * m * n * k
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    f_xla8 = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    dt = bench(lambda: f_xla8(x8, w8))
    print(f"XLA s8s8s32:      {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TOPS")

    f_xlabf = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    dt = bench(lambda: f_xlabf(xb, wb))
    print(f"XLA bf16:         {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TFLOPS")

    for bm, bn, bk in [(512, 512, 256), (512, 1024, 256), (1024, 512, 256), (512, 512, 512), (512, 512, 1024), (1024, 1024, 512)]:
        try:
            f = jax.jit(functools.partial(plain_int8_pallas, bm=bm, bn=bn, bk=bk))
            dt = bench(lambda: f(x8, w8))
            print(f"pallas s8 bm={bm} bn={bn} bk={bk}: {dt*1e6:8.1f} us  {flops/dt/1e12:6.1f} TOPS")
        except Exception as e:
            print(f"pallas bm={bm} bn={bn} bk={bk}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
