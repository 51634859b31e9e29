"""On-chip block-shape sweep for the engine GEMM shapes
(VERDICT r3 #9, r4 weak #7): measure the candidate kernels/blocks per
shape and write the winners into dgq_tpu/ops/autotune_defaults.json,
replacing the heuristic-derived entries so larger configs don't inherit
7B choices — and so serving-prefill M (128/256/512 after prefill_pad)
gets measured entries instead of heuristics.

Run (one TPU process at a time, ~1-2 min per shape):
  python scripts/sweep_family_shapes.py --fams 13b 30b [--update]
  python scripts/sweep_family_shapes.py --fams 7b --m 256 [--update]
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
# device_kind -> INT8 TOPS (mirrors bench.py PEAK_INT8_OPS; used only to
# clamp/reject physically impossible readings from degraded tunnel windows)
PEAK_INT8_TOPS = {"TPU_v5_lite": 394.7, "TPU_v5": 918.0, "TPU_v4": 275.0,
                  "TPU_v6_lite": 1836.0}


def gemm_shapes(h, f):
    return [(3 * h, h), (h, h), (2 * f, h), (h, f)]  # qkv, o, gate_up, down


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fams", nargs="+", default=["13b", "30b"])
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--update", action="store_true",
                    help="write winners into autotune_defaults.json")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--reps", type=int, default=3,
                    help="rotated round-robin reps per candidate (median wins)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from dgq_tpu.ops.fused_decode import pack_rowpair_s4
    from dgq_tpu.ops.quant_matmul import (
        w4a8_matmul_packed, w4a8_matmul_pipe, w4a8_matmul_rp_pipe,
        w4a8_matmul_wres,
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
        qw_rp = pack_rowpair_s4(jnp.asarray(qw), 2 * g)
        ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
        wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
        al = jnp.asarray(rng.random(n), jnp.float32)
        bkp = 1024 if k % 1024 == 0 else 512
        # bm never exceeds the (pow2-padded) problem M: the kernels pad M
        # up to bm, so a 2048 block at M=256 would do 8x wasted rows —
        # exactly the serving-prefill shapes this sweep now covers
        bmc = min(2048, max(128, 1 << (m - 1).bit_length()))
        cands = {
            f"wres({min(512, bmc)},512,-1)": (
                lambda x_: w4a8_matmul_wres(x_, qw, ws, wz, al,
                                            bm=min(512, bmc), bn=512),
                [min(512, bmc), 512, -1]),
            f"packed({bmc},512,256)": (
                lambda x_: w4a8_matmul_packed(x_, qw, ws, wz, al, bm=bmc,
                                              bn=512, bk=256),
                [bmc, 512, 256]),
            f"pipe({bmc},256,{bkp})": (
                lambda x_: w4a8_matmul_pipe(x_, qw, ws, wz, al, bm=bmc,
                                            bn=256, bk=bkp),
                [bmc, 256, bkp]),
            f"rp_pipe({bmc},256,{bkp})": (
                lambda x_: w4a8_matmul_rp_pipe(x_, qw_rp, ws, wz, al,
                                               groupsize=g, bm=bmc, bn=256,
                                               bk=bkp),
                [bmc, 256, bkp]),
        }
        # rotated round-robin so every candidate samples every tunnel
        # window; median per candidate, super-roofline readings rejected
        # (gemm_tops clamps dt to the physical floor via peak_tops, and
        # anything still >1.02x peak is a window-crossing artifact)
        import jax

        peak = PEAK_INT8_TOPS.get(
            jax.devices()[0].device_kind.replace(" ", "_"), 394.7)
        samples = {name: [] for name in cands}
        failed = set()
        for _ in range(args.reps):
            for name, (fn, blocks) in cands.items():
                if name in failed:
                    continue
                try:
                    _, tops = gemm_tops(fn, (x,), m, n, k, iters=args.iters,
                                        base_iters=args.iters // 4,
                                        repeats=1, peak_tops=peak)
                except Exception:  # noqa: BLE001
                    failed.add(name)
                    continue
                if tops <= peak * 1.02:
                    samples[name].append(tops)
        best_name, best_tops, best_blocks = None, -1.0, None
        rows = []
        for name, (fn, blocks) in cands.items():
            vals = sorted(samples[name])
            if not vals:
                rows.append(f"{name}: FAIL" if name in failed
                            else f"{name}: all readings rejected")
                continue
            med = vals[len(vals) // 2]
            rows.append(f"{name}: {med:6.1f} TOPS (n={len(vals)})")
            if med > best_tops:
                best_name, best_tops, best_blocks = name, med, blocks
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
