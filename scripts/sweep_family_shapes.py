"""On-chip block-shape sweep for the 13B/30B/65B engine GEMM shapes
(VERDICT r3 #9): measure the candidate kernels/blocks per shape at M=2048
and write the winners into dgq_tpu/ops/autotune_defaults.json, replacing
the heuristic-derived entries so larger configs don't inherit 7B choices.

Run (one TPU process at a time, ~1-2 min per shape):
  python scripts/sweep_family_shapes.py --fams 13b 30b [--update]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAMS = {
    "7b": dict(h=4096, f=11264),
    "13b": dict(h=5120, f=14336),
    "30b": dict(h=6656, f=17920),
    "65b": dict(h=8192, f=22528),
}
GROUPSIZE = 128
DEVICE = "TPU_v5_lite"


def gemm_shapes(h, f):
    return [(3 * h, h), (h, h), (2 * f, h), (h, f)]  # qkv, o, gate_up, down


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fams", nargs="+", default=["13b", "30b"])
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--update", action="store_true",
                    help="write winners into autotune_defaults.json")
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    import jax.numpy as jnp

    from dgq_tpu.ops.quant_matmul import (
        w4a8_matmul_packed, w4a8_matmul_pipe, w4a8_matmul_wres,
    )
    from dgq_tpu.utils.benchmarking import gemm_tops

    g, m = GROUPSIZE, args.m
    rng = np.random.default_rng(0)
    results = {}
    shapes = sorted({(n, k) for fam in args.fams
                     for (n, k) in gemm_shapes(**FAMS[fam])})
    for n, k in shapes:
        x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
        ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
        wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
        al = jnp.asarray(rng.random(n), jnp.float32)
        bkp = 1024 if k % 1024 == 0 else 512
        cands = {
            "wres(512,512,-1)": (
                lambda x_: w4a8_matmul_wres(x_, qw, ws, wz, al, bm=512, bn=512),
                [512, 512, -1]),
            "packed(2048,512,256)": (
                lambda x_: w4a8_matmul_packed(x_, qw, ws, wz, al, bm=2048,
                                              bn=512, bk=256),
                [2048, 512, 256]),
            f"pipe(2048,256,{bkp})": (
                lambda x_: w4a8_matmul_pipe(x_, qw, ws, wz, al, bm=2048,
                                            bn=256, bk=bkp),
                [2048, 256, bkp]),
        }
        best_name, best_tops, best_blocks = None, -1.0, None
        rows = []
        for name, (fn, blocks) in cands.items():
            try:
                _, tops = gemm_tops(fn, (x,), m, n, k, iters=args.iters,
                                    base_iters=args.iters // 4, repeats=1)
            except Exception as e:  # noqa: BLE001
                rows.append(f"{name}: FAIL {type(e).__name__}")
                continue
            rows.append(f"{name}: {tops:6.1f} TOPS")
            if tops > best_tops:
                best_name, best_tops, best_blocks = name, tops, blocks
        print(f"{n}x{k}: " + " | ".join(rows) + f"  -> {best_name}",
              flush=True)
        results[f"{DEVICE}:{m}:{n}x{k}g{g}"] = best_blocks
        del x, qw, ws, wz, al

    if args.update:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "dgq_tpu", "ops",
            "autotune_defaults.json")
        cur = json.load(open(path))
        cur.update(results)
        with open(path, "w") as fh:
            json.dump(cur, fh, indent=1, sort_keys=True)
        print(f"updated {path} with {len(results)} measured entries",
              flush=True)


if __name__ == "__main__":
    main()
