"""Honest fused-dequant measurements with the on-device chained harness."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
from dgq_tpu.utils.benchmarking import device_time

M, N, K, G = 2048, 4096, 4096, 128
PEAK = 394.7


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)

    # reference: plain XLA s8 GEMM (w already int8, K x N)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)

    def xla_s8(x_, w_):
        return jax.lax.dot_general(
            x_, w_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)

    dt = device_time(xla_s8, x, w8, iters=48, base_iters=16)
    print(f"XLA s8 GEMM:        {dt*1e6:8.1f} us  {2*M*N*K/dt/1e12:6.1f} TOPS ({100*2*M*N*K/dt/1e12/PEAK:.0f}%)", flush=True)

    for bm, bn in [(512, 512), (512, 1024), (1024, 512), (256, 1024), (1024, 1024), (2048, 512), (512, 2048)]:
        try:
            fn = functools.partial(w4a8_matmul_packed, bm=bm, bn=bn)
            dt = device_time(fn, x, qw, ws, wz, al, iters=48, base_iters=16)
            tops = 2 * M * N * K / dt / 1e12
            print(f"fused bm={bm:4d} bn={bn:4d}: {dt*1e6:8.1f} us  {tops:6.1f} TOPS ({100*tops/PEAK:.0f}%)", flush=True)
        except Exception as e:
            print(f"fused bm={bm} bn={bn}: FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
