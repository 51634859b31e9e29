"""Block-shape autotuning for the fused dequant-GEMM.

The TPU counterpart of the reference's vendored-but-unused CUTLASS tile
heuristic (reference: dgq/kernels/cutlass_extensions/cutlass_heuristic.h:26,
SURVEY §2.2 — "TPU equivalent of the heuristic = Pallas block-size autotune
sweep").  Measures candidate (bm, bn) tiles with the tunnel-safe chained
harness and caches results per (M, N, K, groupsize, device) in-process and
on disk.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CACHE: Dict[tuple, Tuple[int, int]] = {}
_CACHE_PATH = os.path.join(os.path.dirname(__file__), "..", "..", ".autotune_cache.json")

DEFAULT_CANDIDATES = ((1024, 1024), (1024, 512), (512, 1024), (512, 512), (256, 512))


def _key(m: int, n: int, k: int, groupsize: int) -> str:
    dev = jax.devices()[0].device_kind.replace(" ", "_")
    return f"{dev}:{m}x{n}x{k}g{groupsize}"


def _load_disk_cache() -> dict:
    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_disk_cache(cache: dict):
    try:
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1)
    except Exception:
        pass


def autotune_w4a8(
    m: int,
    n: int,
    k: int,
    groupsize: int = 128,
    *,
    candidates=DEFAULT_CANDIDATES,
    measure: bool = True,
) -> Tuple[int, int]:
    """Best (bm, bn) for the fused GEMM at this shape.

    With measure=False (or on CPU) returns a static heuristic: the largest
    candidate that divides/pads the problem without excess waste.
    """
    key = _key(m, n, k, groupsize)
    if key in _CACHE:
        return _CACHE[key]
    disk = _load_disk_cache()
    if key in disk:
        _CACHE[key] = tuple(disk[key])
        return _CACHE[key]

    def feasible(bm, bn):
        return n % bn == 0 or n < bn

    cands = [c for c in candidates if feasible(*c)] or [(256, 128)]

    if not measure or jax.default_backend() == "cpu":
        # heuristic: prefer big M tiles (amortize per-tile dequant), bn that
        # divides N
        best = max(cands, key=lambda c: (min(c[0], m), c[1] if n % c[1] == 0 else 0))
        _CACHE[key] = best
        return best

    from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
    from dgq_tpu.utils.benchmarking import gemm_tops

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // groupsize, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // groupsize, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)

    best, best_tops = cands[0], -1.0
    for bm, bn in cands:
        fn = functools.partial(w4a8_matmul_packed, bm=bm, bn=bn, groupsize=groupsize, span=2 * groupsize)
        try:
            _, tops = gemm_tops(fn, (x, qw, ws, wz, al), m, n, k, iters=48, base_iters=16, repeats=3)
        except Exception:
            continue
        if tops > best_tops:
            best, best_tops = (bm, bn), tops
    _CACHE[key] = best
    disk[key] = list(best)
    _save_disk_cache(disk)
    return best
