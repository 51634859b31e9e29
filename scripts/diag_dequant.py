"""Isolate the cost of in-kernel INT4 dequant strategies.

Variants benchmarked at M=2048, N=K=4096, g=128, span=256:
  A: current — unpack/dequant in int32, concat, cast to int8, one dot
  B: all-int8 lane arithmetic (shift/mask/sub/mul in int8), two half-dots
     (no sublane concat)
  C: decomposed — MXU dots on raw nibble codes per plane, scale applied to
     the (bm, bn) int32 partial output, zero correction via column-sum outer
     product
  D: no dequant at all (upper bound: plain int8 dot on packed-as-is data)
"""

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


M, N, K, G = 2048, 4096, 4096, 128
SPAN = 256
NKDEF = K // SPAN


def make_inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)
    return x, qw, ws, wz, al


def specs(bm, bn, bk):
    return dict(
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * (bk // SPAN), bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * (bk // SPAN), bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )


def run_variant(kernel, bm, bn, bk, label):
    x, qw, ws, wz, al = make_inputs()
    ws8 = jnp.repeat(ws, 8, axis=0)
    wz8 = jnp.repeat(wz, 8, axis=0)
    nk = K // bk
    sp = specs(bm, bn, bk)
    f = jax.jit(
        lambda x_, qw_, ws_, wz_, al_: pl.pallas_call(
            functools.partial(kernel, nk=nk),
            grid=(M // bm, N // bn, nk),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            **sp,
        )(x_, qw_, ws_, wz_, al_)
    )
    try:
        dt = bench(lambda: f(x, qw, ws8, wz8, al.reshape(1, N)))
        tops = 2 * M * N * K / dt / 1e12
        print(f"{label} bm={bm} bn={bn} bk={bk}: {dt*1e6:8.1f} us  {tops:6.1f} TOPS ({100*tops/394.7:.1f}% peak)")
    except Exception as e:
        print(f"{label} bm={bm} bn={bn} bk={bk}: FAIL {type(e).__name__}: {str(e)[:200]}")


def kern_a(x_ref, qw_ref, s_ref, z_ref, a_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    byte = qw_ref[:].astype(jnp.int32) & 0xFF
    hi = byte >> 4
    lo = byte & 0xF
    s = s_ref[:].astype(jnp.int32)
    z = z_ref[:].astype(jnp.int32)
    w_hi = (hi - z[0:1, :]) * s[0:1, :]
    w_lo = (lo - z[8:9, :]) * s[8:9, :]
    w = jnp.concatenate([w_hi, w_lo], axis=0).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * a_ref[:]


def kern_b(x_ref, qw_ref, s_ref, z_ref, a_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    byte = qw_ref[:]  # int8
    hi = (byte >> 4) & jnp.int8(0xF)
    lo = byte & jnp.int8(0xF)
    s = s_ref[:]
    z = z_ref[:]
    w_hi = (hi - z[0:1, :]) * s[0:1, :]  # int8 lanes, fits by construction
    w_lo = (lo - z[8:9, :]) * s[8:9, :]
    half = x_ref.shape[1] // 2
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, :half], w_hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, half:], w_lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * a_ref[:]


def kern_c(x_ref, qw_ref, s_ref, z_ref, a_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    byte = qw_ref[:]
    hi = (byte >> 4) & jnp.int8(0xF)  # raw codes
    lo = byte & jnp.int8(0xF)
    half = x_ref.shape[1] // 2
    x_hi = x_ref[:, :half]
    x_lo = x_ref[:, half:]
    d_hi = jax.lax.dot_general(x_hi, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    d_lo = jax.lax.dot_general(x_lo, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    cs_hi = jnp.sum(x_hi.astype(jnp.int32), axis=1, keepdims=True)
    cs_lo = jnp.sum(x_lo.astype(jnp.int32), axis=1, keepdims=True)
    s = s_ref[:].astype(jnp.int32)
    z = z_ref[:].astype(jnp.int32)
    acc_ref[:] += s[0:1, :] * d_hi - (s[0:1, :] * z[0:1, :]) * cs_hi
    acc_ref[:] += s[8:9, :] * d_lo - (s[8:9, :] * z[8:9, :]) * cs_lo

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * a_ref[:]


def kern_d(x_ref, qw_ref, s_ref, z_ref, a_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    byte = qw_ref[:]
    half = x_ref.shape[1] // 2
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, :half], byte, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:, half:], byte, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * a_ref[:]


def main():
    for bm, bn, bk in [(512, 512, 256), (1024, 512, 256), (512, 1024, 256)]:
        run_variant(kern_a, bm, bn, bk, "A int32-math ")
        run_variant(kern_b, bm, bn, bk, "B int8-math  ")
        run_variant(kern_c, bm, bn, bk, "C decomposed ")
        run_variant(kern_d, bm, bn, bk, "D no-dequant ")


if __name__ == "__main__":
    main()
