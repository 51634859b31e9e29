"""Block sweep for w4a8_matmul_rp_pipe at the bench GEMM shape.

Round-5 observation (bench variant_matrix): rp_pipe inherits pipe's
(2048, 256, 1024) blocks and sustains a stable 254-279 TOPS across tunnel
windows while pipe swings 76-321 — the rowpair kernel's block shape has
never been tuned for itself.  This sweep rotates candidate (bm, bn, bk)
round-robin (every candidate samples every window) interleaved with an
XLA dense-s8 control, takes per-candidate medians, rejects super-roofline
readings, and optionally writes the winner into the M=2048 defaults used
by bench.py's rp_pipe row.

Run:  python scripts/sweep_rp_pipe.py [--m 2048] [--reps 3] [--update]
"""
import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_INT8_TOPS = {"TPU_v5_lite": 394.7, "TPU_v5": 918.0, "TPU_v4": 275.0,
                  "TPU_v6_lite": 1836.0}
G = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--cands", type=str, default=None,
                    help="comma-separated bm:bn:bk triples to sweep "
                         "(default: the built-in grid)")
    ap.add_argument("--update", action="store_true",
                    help="write the winner to .autotune_cache.json under an"
                         " rp-specific key (informational; engine blocks"
                         " stay shared)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dgq_tpu.ops.fused_decode import pack_rowpair_s4
    from dgq_tpu.ops.quant_matmul import w4a8_matmul_rp_pipe
    from dgq_tpu.utils.benchmarking import gemm_tops

    m, n, k = args.m, args.n, args.k
    peak = PEAK_INT8_TOPS.get(
        jax.devices()[0].device_kind.replace(" ", "_"), 394.7)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    qw_rp = pack_rowpair_s4(qw, 2 * G)
    ws = jnp.repeat(jnp.asarray(rng.integers(1, 4, (k // G, n)), jnp.int8), 8, axis=0)
    wz = jnp.repeat(jnp.asarray(rng.integers(0, 16, (k // G, n)), jnp.int8), 8, axis=0)
    al = jnp.asarray(rng.random(n), jnp.float32)
    xb = jnp.asarray(rng.integers(-128, 128, (k, n)), jnp.int8)

    if args.cands:
        cand = [tuple(int(v) for v in c.split(":"))
                for c in args.cands.split(",")]
    else:
        cand = [(bm, bn, bk) for bm in (2048, 1024)
                for (bn, bk) in ((256, 1024), (256, 512), (512, 512),
                                 (512, 1024), (256, 2048), (128, 2048))
                if n % bn == 0 and k % bk == 0]

    def rp_fn(bm, bn, bk):
        return functools.partial(
            w4a8_matmul_rp_pipe, qw_rp=qw_rp, wscales=ws, wzeros=wz,
            alpha=al, groupsize=G, bm=bm, bn=bn, bk=bk,
            scales_replicated=True)

    def xla_s8(x_):
        return jax.lax.dot_general(
            x_, xb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    names = [f"rp({bm},{bn},{bk})" for bm, bn, bk in cand] + ["xla_s8"]
    fns = [lambda x_, c=c: rp_fn(*c)(x_) for c in cand] + [xla_s8]
    samples = {nm: [] for nm in names}
    for rep in range(args.reps):
        for nm, fn in zip(names, fns):
            try:
                _, tops = gemm_tops(fn, (x,), m, n, k, iters=args.iters,
                                    base_iters=args.iters // 4, repeats=1,
                                    peak_tops=peak)
            except Exception as e:  # noqa: BLE001
                print(f"  rep{rep} {nm}: FAIL {type(e).__name__}", flush=True)
                continue
            if tops <= peak * 1.02:
                samples[nm].append(tops)
        print(f"rep {rep}: " + " ".join(
            f"{nm}={samples[nm][-1]:.0f}" for nm in names if samples[nm]),
            flush=True)

    print("\nmedians (sorted):", flush=True)
    meds = []
    for nm in names:
        vals = sorted(samples[nm])
        if not vals:
            continue
        meds.append((vals[len(vals) // 2], max(vals), nm))
    for med, mx, nm in sorted(meds, reverse=True):
        print(f"  {nm:22s} median {med:6.1f}  best {mx:6.1f} TOPS", flush=True)

    rp_meds = [t for t in meds if t[2] != "xla_s8"]
    if rp_meds and args.update:
        best = max(rp_meds)
        bm, bn, bk = cand[names.index(best[2])]
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".autotune_cache.json")
        try:
            cur = json.load(open(path))
        except Exception:  # noqa: BLE001
            cur = {}
        cur[f"rp:{m}:{n}x{k}g{G}"] = [bm, bn, bk]
        json.dump(cur, open(path, "w"), indent=1, sort_keys=True)
        print(f"winner {best[2]} median {best[0]:.1f} -> {path}", flush=True)


if __name__ == "__main__":
    main()
