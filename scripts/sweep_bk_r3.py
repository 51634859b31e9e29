"""Focused same-window sweep along the bk axis for the packed kernel
(round-3 finding: bk=512/bn=256 dominated bk=256/bn=512 by ~1.7x median in
the same degraded window — deeper K blocks give Mosaic more VPU dequant to
overlap under each MXU contraction).

Usage: python scripts/sweep_bk_r3.py [--reps 4]
"""

import argparse
import functools
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--iters", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
    from dgq_tpu.utils.benchmarking import gemm_tops

    m, n, k, g = 2048, 4096, 4096, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    peak = 394.7

    def xla_s8(x_, w_):
        return jax.lax.dot_general(x_, w_, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def pk(**kw):
        return functools.partial(w4a8_matmul_packed, **kw)

    variants = [
        ("c512_n256", pk(bm=2048, bn=256, bk=512), (x, qw, ws, wz, al)),
        ("c1024_n256", pk(bm=2048, bn=256, bk=1024), (x, qw, ws, wz, al)),
        ("c1024_n128", pk(bm=2048, bn=128, bk=1024), (x, qw, ws, wz, al)),
        ("c2048_n128", pk(bm=2048, bn=128, bk=2048), (x, qw, ws, wz, al)),
        ("c512_n512", pk(bm=2048, bn=512, bk=512,
                         vmem_limit=100 * 1024 * 1024), (x, qw, ws, wz, al)),
        ("s512_n256", pk(bm=2048, bn=256, bk=512, split_dots=True),
         (x, qw, ws, wz, al)),
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
                matrix[name].append(f"ERR {repr(e)[:90]}")
            print(json.dumps({"rep": rep, "variant": name,
                              "tops": matrix[name][-1]}), flush=True)
    summary = {}
    for name, vals in matrix.items():
        ok = [v for v in vals if isinstance(v, float)]
        if ok:
            summary[name] = {"best": max(ok), "median": sorted(ok)[len(ok) // 2],
                             "frac_best": round(max(ok) / peak, 4)}
    print(json.dumps({"matrix": matrix, "summary": summary}, indent=2),
          flush=True)


if __name__ == "__main__":
    main()
