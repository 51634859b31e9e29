"""Fused dequant-GEMM block-shape sweep with the honest chained harness.

Finds the best (bm, bn, bk) for the bench.py headline shape (ROADMAP item:
GEMM >= 90% of the INT8 roofline).  block_until_ready lies through the axon
tunnel, so every config is timed with the dependency-chained method
(dgq_tpu/utils/benchmarking.py); OOM configs are caught and skipped.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
from dgq_tpu.utils.benchmarking import gemm_tops

PEAK = 394.7e12  # v5e int8


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=2048)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--iters", type=int, default=48)
    p.add_argument("--base-iters", type=int, default=12)
    args = p.parse_args()
    m, n, k, g = args.m, args.n, args.k, 128

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)

    configs = [
        (2048, 512, 256),   # round-1 sweep winner (339.8 TOPS / 86.1%)
        (2048, 512, 256),   # repeat (tunnel-noise check)
        (2048, 256, 256),
        (2048, 256, 512),
        (2048, 512, 512),
        (2048, 128, 256),
        (1024, 1024, 256),  # bench.py previous default, for reference
    ]
    results = []
    for bm, bn, bk in configs:
        if n % bn or k % bk or m % bm:
            continue
        fused = functools.partial(w4a8_matmul_packed, bm=bm, bn=bn, bk=bk)
        try:
            dt, tops = gemm_tops(
                fused, (x, qw, ws, wz, al), m, n, k,
                iters=args.iters, base_iters=args.base_iters, repeats=1,
            )
        except Exception as e:  # OOM / mosaic legalization
            print(f"bm={bm} bn={bn} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        frac = tops * 1e12 / PEAK
        results.append((frac, bm, bn, bk, tops))
        print(f"bm={bm} bn={bn} bk={bk}: {tops:.1f} TOPS ({frac:.1%} roofline)",
              flush=True)
    results.sort(reverse=True)
    print("\ntop configs:")
    for frac, bm, bn, bk, tops in results[:3]:
        print(f"  bm={bm} bn={bn} bk={bk}: {tops:.1f} TOPS ({frac:.1%})")


if __name__ == "__main__":
    main()
