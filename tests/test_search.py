"""Tests for the DGQ two-stage search quantizer."""

import numpy as np
import jax.numpy as jnp

from dgq_tpu.quant.search import naive_quantize, search_quantize


def _mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_search_beats_naive_on_layer_output():
    rng = np.random.default_rng(0)
    n, k, g = 16, 256, 64
    w = rng.normal(size=(n, k)).astype(np.float32)
    # outlier channels to make clipping matter
    w[:, :4] *= 8
    x = rng.normal(size=(128, k)).astype(np.float32)
    ref_out = x @ w.T

    _, _, w_naive = naive_quantize(jnp.asarray(w), groupsize=g)
    res = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=False)

    err_naive = _mse(x @ np.asarray(w_naive).T, ref_out)
    err_search = _mse(x @ np.asarray(res.qweight_fp).T, ref_out)
    assert err_search <= err_naive * 1.001


def test_w4w8_scales_are_integer_and_clamped():
    rng = np.random.default_rng(1)
    n, k, g = 8, 256, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(64, k)).astype(np.float32)
    res = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True)
    s = np.asarray(res.scale)
    assert (s >= 1.0).all()
    np.testing.assert_array_equal(s, np.round(s))  # integer-valued
    assert (s <= 127).all()


def test_w4w8_codes_fit_int8_after_group_scale():
    """(q - zero) * int_scale must fit [-127, 127] — the property the fused
    INT8 GEMM depends on (reference: quantizer_helper.py:176-183)."""
    rng = np.random.default_rng(2)
    n, k, g = 8, 512, 128
    w = (rng.normal(size=(n, k)) * (1 + 10 * rng.random((n, 1)))).astype(np.float32)
    x = rng.normal(size=(64, k)).astype(np.float32)
    res = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True)
    qs = np.asarray(res.scale)  # (N, G) integer
    zero = np.asarray(res.zero)
    s8 = np.asarray(res.scale8)
    wq = np.asarray(res.qweight_fp).reshape(n, k // g, g)
    qsq = qs * s8[:, None]
    codes = np.round(wq / qsq[:, :, None]) + zero[:, :, None]
    prod = (codes - zero[:, :, None]) * qs[:, :, None]
    assert np.abs(prod).max() <= 127 + 1e-6


def test_w4w8_close_to_stage1_accuracy():
    """The dual-grained factorization (stage 2) must cost little accuracy on
    top of the plain per-group INT4 search (stage 1)."""
    rng = np.random.default_rng(3)
    n, k, g = 32, 512, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(128, k)).astype(np.float32)
    res_s1 = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=False)
    res_s2 = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True)
    ref_out = x @ w.T

    def rel(r):
        out = x @ np.asarray(r.qweight_fp).T
        return np.linalg.norm(out - ref_out) / np.linalg.norm(ref_out)

    r1, r2 = rel(res_s1), rel(res_s2)
    # int4 groupwise quant of N(0,1) weights gives ~12% output error; stage 2
    # may add at most a modest factor on top
    assert r1 < 0.2, f"stage-1 error too high: {r1}"
    assert r2 < r1 * 1.35 + 1e-3, f"w4w8 degraded too much: {r2} vs {r1}"


def test_naive_quantize_shapes():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(8, 256)).astype(np.float32)
    scale, zero, wq = naive_quantize(jnp.asarray(w), groupsize=64)
    assert scale.shape == (8, 4) and zero.shape == (8, 4) and wq.shape == (8, 256)


def test_with_fallback_matches_separate_searches():
    """with_fallback=True returns the SAME two results as two separate
    calls (stage 1 is shared), plus their layer-output MSEs."""
    rng = np.random.default_rng(5)
    n, k, g = 16, 256, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(64, k)).astype(np.float32)
    res, res_plain, err_w, err_p = search_quantize(
        jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True,
        with_fallback=True)
    ref_w = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True)
    ref_p = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=False)
    for a, b in zip(res, ref_w):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(res_plain, ref_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ref_out = x @ w.T
    np.testing.assert_allclose(
        float(err_w), _mse(x @ np.asarray(res.qweight_fp).T, ref_out), rtol=1e-4)
    np.testing.assert_allclose(
        float(err_p), _mse(x @ np.asarray(res_plain.qweight_fp).T, ref_out), rtol=1e-4)


def test_w4w8_fallback_triggers_on_pathological_layer():
    """A layer whose rows mix a huge-amplitude group with tiny groups breaks
    the dual-grained int8-scale constraint (round(scale1/scale8) clamps to
    >= 1, so tiny groups inherit ~scale8 resolution); the calibration-loop
    fallback must actually fire and emit a PLAIN fp-group-scale linear."""
    from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
    from dgq_tpu.quant.calibrate import _quantize_linear

    rng = np.random.default_rng(6)
    n, k, g = 8, 256, 128
    w = rng.normal(size=(n, k)).astype(np.float32) * 1e-3
    w[:, :g] *= 1e5  # group 0 amplitude ~100, group 1 amplitude ~0.001
    x = rng.normal(size=(64, k)).astype(np.float32)
    # activations anti-correlated with the weight amplitudes: the OUTPUT is
    # driven by the tiny group, whose resolution under w4w8 is capped at
    # scale8 >= row_absmax*0.2/127 ~ 0.16 (the grid's lowest ratio) — far
    # coarser than the group's ~1e-3 range, so its codes collapse — while
    # plain fp group scales resolve it fine
    x[:, :g] = 0.0

    res, res_plain, err_w, err_p = search_quantize(
        jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True,
        with_fallback=True)
    assert float(err_w) > 4.0 * float(err_p), (float(err_w), float(err_p))

    qcfg = QuantConfig(act_quant=ActQuantConfig(),
                       wt_quant=WtQuantConfig(groupsize=g, w4w8=True,
                                              w4w8_fallback_ratio=4.0))
    lin = {"weight": jnp.asarray(w)}
    pl_ = _quantize_linear(lin, jnp.asarray(x), None, qcfg,
                           amax=jnp.float32(1.0))
    assert not pl_.w4w8, "fallback did not fire on the pathological layer"
    # sane layer with the same config stays dual-grained
    w_ok = rng.normal(size=(n, k)).astype(np.float32)
    pl_ok = _quantize_linear({"weight": jnp.asarray(w_ok)}, jnp.asarray(x),
                             None, qcfg, amax=jnp.float32(1.0))
    assert pl_ok.w4w8
