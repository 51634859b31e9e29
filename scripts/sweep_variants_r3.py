"""Same-window interleaved GEMM-variant matrix (VERDICT r2 next-round #1a).

Round-robins ALL variants inside one session, several reps each, so tunnel
window drift hits every variant equally and "which kernel is fastest" is
decided by same-window data instead of cross-window folklore (r2: wres
measured 381 TOPS in one window and 132.5 in the driver's).

Variants: wres (dequant-once w-resident), packed concat bk={256,512},
packed split-dots bk={256,512}, XLA s8 dense reference.

Usage: python scripts/sweep_variants_r3.py [--reps 3] [--m 2048]
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dgq_tpu.ops.quant_matmul import (
        w4a8_matmul_packed,
        w4a8_matmul_pipe,
        w4a8_matmul_wres,
    )
    from dgq_tpu.utils.benchmarking import gemm_tops

    m, n, k, g = args.m, args.n, args.k, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    peak = 394.7  # v5e INT8 TOPS

    def xla_s8(x_, w_):
        return jax.lax.dot_general(x_, w_, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    variants = [
        ("wres", functools.partial(w4a8_matmul_wres, bm=min(512, m), bn=512),
         (x, qw, ws, wz, al)),
        ("packed_c256", functools.partial(w4a8_matmul_packed, bm=min(2048, m),
                                          bn=512, bk=256), (x, qw, ws, wz, al)),
        ("packed_c512", functools.partial(w4a8_matmul_packed, bm=min(2048, m),
                                          bn=256, bk=512), (x, qw, ws, wz, al)),
        ("packed_s256", functools.partial(w4a8_matmul_packed, bm=min(2048, m),
                                          bn=256, bk=256, split_dots=True),
         (x, qw, ws, wz, al)),
        ("packed_s512", functools.partial(w4a8_matmul_packed, bm=min(2048, m),
                                          bn=256, bk=512, split_dots=True),
         (x, qw, ws, wz, al)),
        ("packed_s256b", functools.partial(w4a8_matmul_packed, bm=1024,
                                           bn=512, bk=256, split_dots=True),
         (x, qw, ws, wz, al)),
        ("pipe_1024", functools.partial(w4a8_matmul_pipe, bm=min(2048, m),
                                        bn=256, bk=1024), (x, qw, ws, wz, al)),
        ("wres_n1024", functools.partial(w4a8_matmul_wres, bm=min(512, m),
                                         bn=1024,
                                         vmem_limit=128 * 1024 * 1024),
         (x, qw, ws, wz, al)),
        ("wres_m256", functools.partial(w4a8_matmul_wres, bm=min(256, m),
                                        bn=512), (x, qw, ws, wz, al)),
        ("xla_s8", xla_s8, (x, w8)),
    ]
    kw = dict(iters=args.iters, base_iters=args.iters // 4, repeats=1,
              peak_tops=peak)

    matrix = {name: [] for name, _, _ in variants}
    for rep in range(args.reps):
        for name, fn, fargs in variants:
            try:
                dt, tops = gemm_tops(fn, fargs, m, n, k, **kw)
                matrix[name].append(round(tops, 1))
            except Exception as e:  # noqa: BLE001
                matrix[name].append(f"ERR {repr(e)[:80]}")
            print(json.dumps({"rep": rep, "variant": name,
                              "tops": matrix[name][-1]}), flush=True)
    summary = {}
    for name, vals in matrix.items():
        ok = [v for v in vals if isinstance(v, float)]
        if ok:
            summary[name] = {"best": max(ok), "median": sorted(ok)[len(ok) // 2],
                             "frac_best": round(max(ok) / peak, 4)}
    print(json.dumps({"matrix": matrix, "summary": summary,
                      "shape": [m, n, k]}, indent=2), flush=True)


if __name__ == "__main__":
    main()
