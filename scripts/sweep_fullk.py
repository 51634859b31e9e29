"""Sweep full-K "resident-x" GEMM configs vs the round-1 fat-M winner.

Rationale: at (bm=2048, bn=512, bk=256) the x operand is re-streamed from
HBM once per N block (64 MB for the 7B M=2048 shape) and total HBM traffic
(~104 MB, ~127 us) is close to the MXU compute floor (174 us), so pipeline
bubbles cap the kernel at ~86% roofline.  With bk = K the x block's index
map is constant across the inner N steps — Pallas re-fetches only on index
change, so x loads ONCE per M block (8 MB total) and the kernel becomes
purely compute-bound.

All configs measured in one process, interleaved with the round-1 winner as
the same-window control (tunnel absolutes swing 40%+; only same-window
relatives are meaningful).

Run: timeout 1800 python scripts/sweep_fullk.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
from dgq_tpu.utils.benchmarking import gemm_tops

M, N, K, G = 2048, 4096, 4096, 128
PEAK = 394.7  # v5e int8 TOPS

# (bm, bn, bk); control first, then full-K candidates by VMEM estimate
CONFIGS = [
    (2048, 512, 256),   # round-1 winner (control)
    (1024, 256, 4096),  # first-sweep best (1.52x control in degraded window)
    (512, 256, 4096),
    (2048, 256, 4096),
    (1024, 128, 4096),
    (1024, 256, 2048),
    (512, 512, 4096),
]


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)

    results = {}
    for rnd in range(2):
        for bm, bn, bk in CONFIGS:
            tag = f"({bm},{bn},{bk})"
            fn = functools.partial(w4a8_matmul_packed, bm=bm, bn=bn, bk=bk)
            try:
                _, tops = gemm_tops(fn, (x, qw, ws, wz, al), M, N, K,
                                    iters=64, base_iters=16, repeats=2)
            except Exception as e:  # noqa: BLE001
                print(f"round{rnd} {tag}: FAILED {repr(e)[:120]}", flush=True)
                results.setdefault(tag, []).append(None)
                continue
            results.setdefault(tag, []).append(tops)
            print(f"round{rnd} {tag}: {tops:.1f} TOPS ({100*tops/PEAK:.1f}% roofline)",
                  flush=True)

    print("\n== best per config ==")
    ctrl = max(t for t in results.get("(2048,512,256)", [0]) if t) or 1.0
    for tag, ts in results.items():
        good = [t for t in ts if t]
        if good:
            b = max(good)
            print(f"{tag}: {b:.1f} TOPS  {100*b/PEAK:.1f}%  vs-control {b/ctrl:.3f}x")
        else:
            print(f"{tag}: all failed")


if __name__ == "__main__":
    main()
