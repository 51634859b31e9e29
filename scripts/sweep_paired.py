"""Paired-ratio GEMM sweep: candidate vs control measured back-to-back.

The tunnel's absolute throughput drifts by minutes-long windows (2x+ swings
observed), so single measurements are not comparable across time.  This
protocol measures (control, candidate) immediately adjacent, repeats the
pair N times, and scores each candidate by the MEDIAN of per-pair ratios —
slow drift cancels, leaving the config effect.

Run: timeout 2400 python scripts/sweep_paired.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed, w4a8_matmul_wres
from dgq_tpu.utils.benchmarking import gemm_tops

M, N, K, G = 2048, 4096, 4096, 128
PEAK = 394.7

CONTROL = (512, 512, 4096, None)  # round-2 stored winner (autotune_defaults)
# (bm, bn, bk, vmem_limit); bk="wres" selects the dequant-once w-resident
# kernel (w4a8_matmul_wres) — vmem_limit None keeps Mosaic's default budget
CANDIDATES = [
    (512, 512, "wres", None),   # dequant amortized 4x over m blocks
    (1024, 512, "wres", None),  # dequant amortized 2x, fatter dot
    (512, 256, "wres", None),
    (2048, 512, 256, None),     # round-1 fat-M winner (for the record)
    (512, 512, 4096, 100 * 2**20),  # raised Mosaic VMEM budget
]
PAIRS = 4


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)
    args = (x, qw, ws, wz, al)
    kw = dict(iters=96, base_iters=24, repeats=5)

    def run(cfg):
        bm, bn, bk = cfg[:3]
        vmem = cfg[3] if len(cfg) > 3 else None
        if bk == "wres":
            fn = functools.partial(w4a8_matmul_wres, bm=bm, bn=bn, vmem_limit=vmem)
        else:
            fn = functools.partial(w4a8_matmul_packed, bm=bm, bn=bn, bk=bk, vmem_limit=vmem)
        _, tops = gemm_tops(fn, args, M, N, K, **kw)
        return tops

    # warm all compiles once
    for cfg in [CONTROL] + CANDIDATES:
        try:
            run(cfg)
        except Exception as e:  # noqa: BLE001
            print(f"compile-warm {cfg} FAILED {repr(e)[:100]}", flush=True)

    ratios = {c: [] for c in CANDIDATES}
    absolutes = {c: [] for c in [CONTROL] + CANDIDATES}
    for p in range(PAIRS):
        for cand in CANDIDATES:
            try:
                t_ctrl = run(CONTROL)
                t_cand = run(cand)
            except Exception as e:  # noqa: BLE001
                print(f"pair {p} {cand} failed {repr(e)[:80]}", flush=True)
                continue
            ratios[cand].append(t_cand / t_ctrl)
            absolutes[CONTROL].append(t_ctrl)
            absolutes[cand].append(t_cand)
            print(f"pair {p} {cand}: cand {t_cand:6.1f} ctrl {t_ctrl:6.1f} "
                  f"ratio {t_cand/t_ctrl:.3f}", flush=True)

    print("\n== median paired ratio (vs control) ==")
    for cand, rs in ratios.items():
        if rs:
            med = sorted(rs)[len(rs) // 2]
            best_abs = max(absolutes[cand])
            print(f"{cand}: {med:.3f}x  (n={len(rs)}, spread "
                  f"{min(rs):.3f}-{max(rs):.3f}, best abs {best_abs:.1f} TOPS "
                  f"= {100*best_abs/PEAK:.1f}%)")
    if absolutes[CONTROL]:
        print(f"control best abs: {max(absolutes[CONTROL]):.1f} TOPS "
              f"({100*max(absolutes[CONTROL])/PEAK:.1f}%)")


if __name__ == "__main__":
    main()
