"""Golden tests for the affine quantizer core against independent numpy
implementations (the reference's golden-model test pattern, SURVEY §4)."""

import numpy as np
import jax.numpy as jnp

from dgq_tpu.quant.quantizer import (
    affine_quantize,
    find_params,
    find_params_weight_grouped,
    quantize_with,
)


def np_affine(x, scale, zero, maxq):
    q = np.clip(np.round(x / scale) + zero, 0, maxq)
    return scale * (q - zero)


def test_affine_quantize_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(16, 32)).astype(np.float32)
    scale, zero, maxq = 0.1, 7.0, 15
    got = np.asarray(affine_quantize(jnp.asarray(x), scale, zero, maxq))
    np.testing.assert_allclose(got, np_affine(x, scale, zero, maxq), rtol=1e-6)


def test_find_params_asym_ranges():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 64)).astype(np.float32) * 3
    p = find_params(jnp.asarray(x), bits=4, sym=False)
    scale, zero = np.asarray(p.scale), np.asarray(p.zero)
    xmin = np.minimum(x.min(axis=1), 0)
    xmax = np.maximum(x.max(axis=1), 0)
    np.testing.assert_allclose(scale, (xmax - xmin) / 15, rtol=1e-5)
    np.testing.assert_allclose(zero, np.round(-xmin / ((xmax - xmin) / 15)), rtol=1e-5)


def test_find_params_sym_zero_is_midpoint():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 32)).astype(np.float32)
    p = find_params(jnp.asarray(x), bits=8, sym=True)
    np.testing.assert_allclose(np.asarray(p.zero), np.full(4, 128.0))
    xabs = np.abs(x).max(axis=1)
    np.testing.assert_allclose(np.asarray(p.scale), 2 * xabs / 255, rtol=1e-5)


def test_find_params_degenerate_row():
    x = jnp.zeros((2, 16))
    p = find_params(x, bits=4, sym=False)
    # xmin/xmax forced to [-1, 1] (reference: quantizer.py:62-64)
    np.testing.assert_allclose(np.asarray(p.scale), np.full(2, 2 / 15), rtol=1e-6)


def test_quantization_error_bounded_by_scale():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 128)).astype(np.float32)
    p = find_params(jnp.asarray(x), bits=4, sym=False)
    xq = np.asarray(quantize_with(p._replace(scale=p.scale[:, None], zero=p.zero[:, None]), jnp.asarray(x)))
    err = np.abs(xq - x)
    assert (err <= np.asarray(p.scale)[:, None] * 0.5 + 1e-6).all()


def test_mse_shrink_improves_or_matches():
    rng = np.random.default_rng(4)
    # heavy-tailed data: shrinking the range should help
    x = rng.standard_t(df=2, size=(4, 256)).astype(np.float32)
    p0 = find_params(jnp.asarray(x), bits=4, sym=False, mse=False)
    p1 = find_params(jnp.asarray(x), bits=4, sym=False, mse=True, norm=2.4)

    def err(p):
        xq = np_affine(x, np.asarray(p.scale)[:, None], np.asarray(p.zero)[:, None], 15)
        return np.sum(np.abs(xq - x) ** 2.4, axis=1)

    assert (err(p1) <= err(p0) + 1e-4).all()


def test_grouped_params_shape():
    rng = np.random.default_rng(5)
    w = rng.normal(size=(8, 256)).astype(np.float32)
    p = find_params_weight_grouped(jnp.asarray(w), bits=4, groupsize=64)
    assert p.scale.shape == (8 * 4,)
