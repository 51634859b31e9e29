"""Verify in-kernel pltpu.bitcast(int8 -> int4) semantics on the chip:
shape produced, nibble order, signedness — then a paired rotated A/B of
the bitcast-s4 dot vs the production plane kernel at the qkv GEMV shape.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dgq_tpu.ops.fused_decode import fused_norm_gemv  # noqa: E402
from dgq_tpu.utils.benchmarking import device_time  # noqa: E402


def numerics():
    K, N2 = 256, 128  # (K, N2) int8 bytes -> (K, 2*N2) s4?
    r = np.random.default_rng(1)
    wb_np = r.integers(-128, 128, (K, N2)).astype(np.int8)
    wb = jnp.asarray(wb_np)
    x_np = r.integers(-8, 8, (8, K)).astype(np.int8)
    x = jnp.asarray(x_np)

    def kern(x_ref, wb_ref, o_ref, shp_ref):
        w4 = pltpu.bitcast(wb_ref[:], jnp.int4)
        shp_ref[0, 0] = w4.shape[0]
        shp_ref[0, 1] = w4.shape[1] if w4.ndim > 1 else -1
        shp_ref[0, 2] = w4.ndim
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.int4), w4.reshape(K, -1),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    out, shp = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((8, 2 * N2), jnp.int32),
                   jax.ShapeDtypeStruct((1, 4), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
    )(x, wb)
    print("bitcast result shape reported by kernel:", np.asarray(shp)[0].tolist(),
          flush=True)

    # golden A: [lo, hi] interleaved on the minor dim (XLA bitcast order)
    u = wb_np.astype(np.uint8)
    lo = ((u & 0xF) ^ 8).astype(np.int32) - 8
    hi = (u >> 4).astype(np.int32)
    hi = ((hi ^ 8) - 8)
    inter = np.stack([lo, hi], axis=-1).reshape(K, 2 * N2)
    # golden B: [all-lo | all-hi] split halves (sublane-style order)
    halves = np.concatenate([lo, hi], axis=1)
    got = np.asarray(out)
    ga = x_np.astype(np.int32) @ inter
    gb = x_np.astype(np.int32) @ halves
    print("matches [lo,hi]-interleaved:", np.array_equal(got, ga), flush=True)
    print("matches [lo|hi]-halves     :", np.array_equal(got, gb), flush=True)
    if not (np.array_equal(got, ga) or np.array_equal(got, gb)):
        # probe column mapping with a one-hot byte
        wb1 = np.zeros((K, N2), np.int8)
        wb1[0, 0] = 0x21  # lo=1 hi=2
        out1 = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((8, 2 * N2), jnp.int32),
                       jax.ShapeDtypeStruct((1, 4), jnp.int32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
        )(jnp.asarray(np.eye(8, K, dtype=np.int8)), jnp.asarray(wb1))[0]
        nz = np.nonzero(np.asarray(out1)[0])[0]
        print("one-hot byte (k=0,j=0,val=0x21) lands at columns:", nz.tolist(),
              "values:", np.asarray(out1)[0, nz].tolist(), flush=True)


def paired_ab():
    K, N = 4096, 12288
    B = 8
    r = np.random.default_rng(0)
    wb = jnp.asarray(r.integers(-128, 128, (K, N // 2)), jnp.int8)
    x4_8 = jnp.asarray(r.integers(-8, 8, (2 * B, K)), jnp.int8)
    x8 = jnp.asarray(r.integers(-127, 127, (B, K)), jnp.int8)
    qw = jnp.asarray(r.integers(-128, 128, (K // 2, N)), jnp.int8)
    g = K // 128
    sh, sl = (jnp.asarray(r.integers(1, 4, (g // 2, N)), jnp.int8) for _ in range(2))
    zh, zl = (jnp.asarray(r.integers(0, 16, (g // 2, N)), jnp.int8) for _ in range(2))
    al = jnp.asarray(r.random(N), jnp.float32) * 1e-4
    lnw = jnp.ones((K,), jnp.float32)

    bn = 512

    def _k(x_ref, wb_ref, o_ref):
        w4 = pltpu.bitcast(wb_ref[:], jnp.int4)
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.int4), w4.reshape(K, -1),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @jax.jit
    def pl_bitcast(x, wbytes):
        return pl.pallas_call(
            _k,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((2 * B, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn // 2), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * B, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * B, N), jnp.int32),
        )(x, wbytes)

    def fbp(out, x):
        return ((out[:, :K] & 0x7) - 4).astype(jnp.int8)

    def kern(x, *args):
        return fused_norm_gemv(x.astype(jnp.float32), lnw, None, *args)

    def fbk(out, x):
        return (out[:, :K].astype(jnp.int32) & 0x7F).astype(jnp.int8)

    ratios = []
    for rep in range(6):
        order = [0, 1] if rep % 2 == 0 else [1, 0]
        ts = {}
        for o in order:
            if o == 0:
                ts["s4"] = device_time(pl_bitcast, x4_8, wb, feedback=fbp,
                                       iters=48, base_iters=12)
            else:
                ts["pk"] = device_time(kern, x8, qw, sh, sl, zh, zl, al,
                                       feedback=fbk, iters=48, base_iters=12)
        ratio = ts["pk"] / ts["s4"]
        ratios.append(ratio)
        print(f"[{rep}] s4-bitcast {ts['s4']*1e6:7.1f} us "
              f"({K*N/ts['s4']/1e9:5.0f} G) | plane-kern {ts['pk']*1e6:7.1f} us "
              f"({K*N/ts['pk']/1e9:5.0f} G) | pk/s4 = {ratio:5.2f}", flush=True)
    ratios.sort()
    print(f"median pk/s4 ratio over {len(ratios)} rotated pairs: "
          f"{ratios[len(ratios)//2]:.3f}", flush=True)


if __name__ == "__main__":
    numerics()
    paired_ab()
