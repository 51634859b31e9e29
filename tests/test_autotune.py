"""Block-shape source of truth: get_blocks lookups, defaults file,
heuristics (measurement runs only on real TPU)."""

import json
import os

from dgq_tpu.ops import autotune
from dgq_tpu.ops.autotune import (
    DEFAULT_CANDIDATES,
    autotune_w4a8,
    decode_blocks,
    get_blocks,
    heuristic_blocks,
    prefill_blocks,
)


def test_heuristic_path_on_cpu():
    bm, bn = autotune_w4a8(2048, 4096, 4096, measure=False)
    assert 4096 % bn == 0


def test_heuristic_small_n():
    bm, bn = autotune_w4a8(128, 256, 512, measure=False)
    assert 256 % bn == 0 or 256 < bn


def test_cache_hit_is_stable():
    a = autotune_w4a8(2048, 4096, 4096, measure=False)
    b = autotune_w4a8(2048, 4096, 4096, measure=False)
    assert a == b


def test_get_blocks_decode_is_fat_nk():
    # 7B down_proj GEMV: fat bn/bk, caller bm preserved
    bm, bn, bk = get_blocks(1, 4096, 11264, groupsize=128, bm_hint=128)
    assert bm == 128
    assert 4096 % bn == 0 and bn >= 512
    assert bk % 256 == 0 and 11264 % bk == 0
    assert bk * bn * 4 <= (1 << 23)


def test_get_blocks_prefill_wres_winner():
    # 7B prefill shapes: dequant-once w-resident kernel (r2 sweep winner,
    # 381 TOPS = 96.5% roofline; WRES_BK sentinel)
    from dgq_tpu.ops.autotune import WRES_BK

    bm, bn, bk = get_blocks(2048, 4096, 4096, groupsize=128)
    assert (bm, bn, bk) == (512, 512, WRES_BK)
    # K too big for the wres VMEM budget but fine for resident-x
    bm, bn, bk = get_blocks(2048, 4096, 6656, groupsize=128)
    assert (bm, bn, bk) == (512, 512, 6656)


def test_get_blocks_prefill_fat_m_fallback():
    # K too large for a resident x block -> round-1 fat-M rule
    bm, bn, bk = get_blocks(2048, 4096, 11264, groupsize=128)
    assert bm == 2048 and 4096 % bn == 0 and bk == 256


def test_get_blocks_always_legal():
    # every (bm, bn, bk) must satisfy the kernel's divisibility contract
    from dgq_tpu.ops.autotune import WRES_BK

    for m in (1, 8, 33, 200, 2048, 4096):
        for n, k in ((4096, 4096), (12288, 4096), (4096, 11264), (768, 768)):
            bm, bn, bk = get_blocks(m, n, k, groupsize=128)
            if bk == WRES_BK:  # w-resident kernel: needs whole spans only
                assert k % 256 == 0, (m, n, k, bm, bn, bk)
            else:
                assert bk % 256 == 0 and k % bk == 0, (m, n, k, bm, bn, bk)
            assert n % bn == 0 or n < bn, (m, n, k, bm, bn, bk)


def test_defaults_file_covers_llama_family():
    path = os.path.join(os.path.dirname(autotune.__file__), "autotune_defaults.json")
    with open(path) as f:
        d = json.load(f)
    # 4 fams x 4 GEMMs x 2 buckets
    assert len(d) >= 32
    assert "TPU_v5_lite:2048:12288x4096g128" in d
    for key, v in d.items():
        assert len(v) == 3 and all(isinstance(x, int) for x in v), (key, v)


def test_legacy_two_element_cache_entries_upgrade():
    from dgq_tpu.ops.autotune import WRES_BK

    triple = autotune._as_triple([1024, 512], 2048, 4096, 4096, 256)
    # legacy (bm, bn) entries re-derive bk from the current heuristic, which
    # may pick the wres sentinel at shapes where the w-resident kernel wins
    assert triple[:2] == (1024, 512)
    assert triple[2] == WRES_BK or triple[2] % 256 == 0
    # a shape too big for the wres VMEM budget still derives a real bk
    triple = autotune._as_triple([1024, 512], 2048, 4096, 17920, 256)
    assert triple[2] != WRES_BK and triple[2] % 256 == 0
