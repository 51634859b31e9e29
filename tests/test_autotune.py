"""Autotune heuristic path (measurement runs only on real TPU)."""

from dgq_tpu.ops.autotune import DEFAULT_CANDIDATES, autotune_w4a8


def test_heuristic_path_on_cpu():
    bm, bn = autotune_w4a8(2048, 4096, 4096, measure=False)
    assert (bm, bn) in DEFAULT_CANDIDATES
    assert 4096 % bn == 0


def test_heuristic_small_n():
    bm, bn = autotune_w4a8(128, 256, 512, measure=False)
    assert 256 % bn == 0 or 256 < bn


def test_cache_hit_is_stable():
    a = autotune_w4a8(2048, 4096, 4096, measure=False)
    b = autotune_w4a8(2048, 4096, 4096, measure=False)
    assert a == b
