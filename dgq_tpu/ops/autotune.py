"""Block-shape selection for the fused dequant-GEMM — ONE source of truth.

The TPU counterpart of the reference's vendored-but-unused CUTLASS tile
heuristic (reference: dgq/kernels/cutlass_extensions/cutlass_heuristic.h:26,
SURVEY §2.2 — "TPU equivalent of the heuristic = Pallas block-size autotune
sweep").  Unlike the reference, this one is actually wired in: the engine's
``_linear_s8``, ``bench.py``, and the sweep scripts all resolve block shapes
through :func:`get_blocks`.

Resolution order (all trace-time safe — pure dict lookups, no measuring):
  1. in-process cache (autotune_w4a8 results from this run),
  2. user disk cache ``.autotune_cache.json`` (repo root, written by
     autotune_w4a8 / scripts/sweep_gemm.py),
  3. the in-tree defaults ``autotune_defaults.json`` (pre-populated for the
     LLaMA 7B/13B/30B/65B engine GEMM shapes; regenerate with
     scripts/gen_autotune_defaults.py),
  4. the measured heuristic (fat-M prefill tiles / fat-NK decode tiles —
     scripts/sweep_gemm.py found (bm=2048, bn=512, bk=256) at 339.8 TOPS vs
     (1024, 1024) at 209.5 in the same tunnel window, ~1.6x reproduced).

``autotune_w4a8(m, n, k, measure=True)`` measures candidate (bm, bn, bk)
tiles with the tunnel-safe chained harness and persists the winner to the
disk cache.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional, Tuple

import jax

_CACHE: Dict[str, Tuple[int, int, int]] = {}
_CACHE_PATH = os.path.join(os.path.dirname(__file__), "..", "..", ".autotune_cache.json")
_DEFAULTS_PATH = os.path.join(os.path.dirname(__file__), "autotune_defaults.json")

# candidate (bm, bn) prefill tiles, fat-M first (sweep-found winner leads);
# bk is derived per-candidate by the same VMEM rule the heuristic uses
DEFAULT_CANDIDATES = (
    (2048, 512),
    (2048, 256),
    (1024, 1024),
    (1024, 512),
    (512, 1024),
    (512, 512),
    (256, 512),
)

# VMEM budgets for the in-kernel int32 unpack temporaries (hard 16 MB/core;
# keep per-kernel temp allocations well under — round-1 measured
# bm=1024,bn=1024,bk=512 OOM at 17.66 MB)
_DECODE_TEMP_BUDGET = 1 << 23
_PREFILL_TEMP_BUDGET = 1 << 22

# sentinel bk: use the dequant-once w-resident kernel (w4a8_matmul_wres)
WRES_BK = -1


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def decode_blocks(n: int, k: int, span: int) -> Tuple[int, int]:
    """Fat (bn, bk) for skinny-M GEMVs: decode is HBM/overhead-bound, so
    fewer, fatter grid steps win (a 7B step otherwise runs ~100k tiny grid
    iterations).  Constraints: bn | N, bk | K with bk a span multiple, and
    the int32 unpack temporary (bk x bn x 4B) bounded."""
    bn = next((c for c in (2048, 1024, 512, 256, 128) if n % c == 0), n)
    bk = next(
        (c for c in (2048, 1024, 512, 256)
         if c % span == 0 and k % c == 0 and c * bn * 4 <= _DECODE_TEMP_BUDGET),
        span,
    )
    return bn, bk


def prefill_blocks(m: int, n: int, k: int, span: int, bm_hint: int = 256) -> Tuple[int, int, int]:
    """(bm, bn, bk) for prefill GEMMs.  bk == -1 selects the dequant-once
    w-resident kernel (w4a8_matmul_wres).

    Preferred: the dequant-once w-resident tiling (bm=512, bn=512,
    bk=WRES_BK): grid (N, M) with m innermost, the dequantized (K, bn)
    int8 block held in VMEM scratch across all m steps — VPU dequant
    amortizes M/bm-fold.  Round-2 paired sweep (scripts/sweep_paired.py):
    1.09x median over the resident-x (512, 512, bk=K) tiling with the
    highest absolute ever recorded (381.1 TOPS = 96.5% of the v5e INT8
    roofline, M=2048 7B shape).

    Second choice: full-K "resident-x" tiling (bm=512, bn=512, bk=K) — x
    fetched once per M block (round-2 sweeps: 1.13-1.27x the round-1
    fat-M winner).  Falls back to the round-1 fat-M rule when full-K
    doesn't fit VMEM or shapes misalign."""
    if m >= 512 and k % span == 0 and n % 512 == 0:
        # wres VMEM estimate: x 2x(bm,k) + scratch (k,bn) + packed 2x(k/2,bn)
        # + out 2x(bm,bn)x4B; keep under ~13 MB of the 16 MB core budget
        vmem = 2 * 512 * k + 2 * k * 512 + 2 * 512 * 512 * 4
        if vmem <= (13 << 20):
            return 512, 512, WRES_BK
        if 512 * k <= (4 << 20):
            return 512, 512, k
    bm = min(2048, max(bm_hint, _next_pow2(m)))
    bn = next((c for c in (512, 256, 128) if n % c == 0), n)
    if bm >= 1024:
        bk = span  # bigger K blocks at fat M blow the VMEM budget
    else:
        bk = next(
            (c for c in (512, 256)
             if c % span == 0 and k % c == 0 and c * bn * 4 <= _PREFILL_TEMP_BUDGET),
            span,
        )
    return bm, bn, bk


def heuristic_blocks(
    m: int, n: int, k: int, span: int = 256, *, bm_hint: int = 256
) -> Tuple[int, int, int]:
    if m <= 32:
        bn, bk = decode_blocks(n, k, span)
        return bm_hint, bn, bk  # caller's decode bm (grid has one M step)
    return prefill_blocks(m, n, k, span, bm_hint)


def _m_bucket(m: int) -> str:
    return "d" if m <= 32 else str(min(2048, _next_pow2(max(m, 256))))


def _device_tag() -> str:
    try:
        return jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        return "unknown"


def _key(m: int, n: int, k: int, groupsize: int) -> str:
    return f"{_device_tag()}:{_m_bucket(m)}:{n}x{k}g{groupsize}"


def _load_json(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_disk_cache(cache: dict):
    try:
        with open(_CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except Exception:
        pass


@functools.lru_cache(maxsize=1)
def _defaults() -> dict:
    return _load_json(_DEFAULTS_PATH)


def _as_triple(v, m: int, n: int, k: int, span: int) -> Tuple[int, int, int]:
    v = list(v)
    if len(v) == 2:  # legacy (bm, bn) entries: derive bk with the VMEM rule
        bm, bn = v
        bk = prefill_blocks(m, n, k, span, bm)[2] if m > 32 else decode_blocks(n, k, span)[1]
        return int(bm), int(bn), int(bk)
    return int(v[0]), int(v[1]), int(v[2])


def get_blocks(
    m: int, n: int, k: int, *, groupsize: int = 128, bm_hint: int = 256
) -> Tuple[int, int, int]:
    """The (bm, bn, bk) the engine/bench should use at this shape.

    Pure lookups + heuristic — safe to call at trace time.
    """
    span = 2 * groupsize
    key = _key(m, n, k, groupsize)
    if key in _CACHE:
        bm, bn, bk = _CACHE[key]
    else:
        hit = _load_json(_CACHE_PATH).get(key) or _defaults().get(key)
        if hit is not None:
            bm, bn, bk = _as_triple(hit, m, n, k, span)
            _CACHE[key] = (bm, bn, bk)
        else:
            return heuristic_blocks(m, n, k, span, bm_hint=bm_hint)
    # cached bm is the bucket-level choice; never exceed the padded problem
    if m > 32:
        bm = min(bm, max(_next_pow2(m), 256))
    if n % bn != 0:
        bn = next((c for c in (512, 256, 128) if n % c == 0), n)
    if bk == WRES_BK:
        if k % span != 0:  # wres dequants whole spans
            bk = span
    elif k % bk != 0 or bk % span != 0:
        bk = span
    return bm, bn, bk


def autotune_w4a8(
    m: int,
    n: int,
    k: int,
    groupsize: int = 128,
    *,
    candidates=DEFAULT_CANDIDATES,
    measure: bool = True,
) -> Tuple[int, int]:
    """Measure candidate tiles at this shape; persist the best to the disk
    cache so subsequent get_blocks calls (this process or later ones) use it.

    Returns (bm, bn) for backward compatibility; the full (bm, bn, bk)
    triple lands in the cache.
    """
    span = 2 * groupsize
    key = _key(m, n, k, groupsize)
    if key in _CACHE:
        return _CACHE[key][:2]

    if not measure or jax.default_backend() == "cpu":
        bm, bn, bk = get_blocks(m, n, k, groupsize=groupsize)
        return bm, bn

    import numpy as np
    import jax.numpy as jnp

    from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
    from dgq_tpu.utils.benchmarking import gemm_tops

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // groupsize, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // groupsize, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)

    best: Optional[Tuple[int, int, int]] = None
    best_tops = -1.0
    for bm, bn in candidates:
        if n % bn != 0 and n >= bn:
            continue
        bk = prefill_blocks(m, n, k, span, bm)[2] if m > 32 else decode_blocks(n, k, span)[1]
        fn = functools.partial(
            w4a8_matmul_packed, bm=bm, bn=bn, bk=bk,
            groupsize=groupsize, span=span,
        )
        try:
            _, tops = gemm_tops(fn, (x, qw, ws, wz, al), m, n, k,
                                iters=48, base_iters=16, repeats=3)
        except Exception:
            continue
        if tops > best_tops:
            best, best_tops = (bm, bn, bk), tops
    if best is None:
        best = heuristic_blocks(m, n, k, span)
    _CACHE[key] = best
    disk = _load_json(_CACHE_PATH)
    disk[key] = list(best)
    _save_disk_cache(disk)
    return best[:2]
