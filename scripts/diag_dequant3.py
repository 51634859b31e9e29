"""Fused-dequant GEMM vs XLA s8 baseline with direct-feedback chained
timing (same feedback pass in both, min over repeats)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
from dgq_tpu.utils.benchmarking import gemm_tops

M, N, K, G = 2048, 4096, 4096, 128
PEAK = 394.7


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)

    def xla_s8(x_, w_):
        return jax.lax.dot_general(
            x_, w_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    dt, tops = gemm_tops(xla_s8, (x, w8), M, N, K)
    print(f"XLA s8 GEMM:          {dt*1e6:8.1f} us  {tops:6.1f} TOPS ({100*tops/PEAK:.0f}%)", flush=True)

    for bm, bn in [(512, 512), (512, 1024), (1024, 512), (2048, 512), (512, 2048), (1024, 1024)]:
        fn = functools.partial(w4a8_matmul_packed, bm=bm, bn=bn)
        try:
            dt, tops = gemm_tops(fn, (x, qw, ws, wz, al), M, N, K)
            print(f"fused bm={bm:4d} bn={bn:4d}: {dt*1e6:8.1f} us  {tops:6.1f} TOPS ({100*tops/PEAK:.0f}%)", flush=True)
        except Exception as e:
            print(f"fused bm={bm} bn={bn}: FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
