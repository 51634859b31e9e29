"""Activation quantizer tests vs. independent numpy goldens."""

import numpy as np
import jax.numpy as jnp

from dgq_tpu.quant.act_quant import (
    make_act_quant_fn,
    quantize_activation_per_tensor_absmax,
    quantize_activation_per_token_absmax,
    quantize_activation_static,
)


def test_static_quant_golden():
    rng = np.random.default_rng(0)
    t = rng.normal(size=(4, 16)).astype(np.float32)
    absmax = jnp.asarray(2.0)
    got = np.asarray(quantize_activation_static(jnp.asarray(t), absmax))
    scale = 2.0 / 127
    want = np.clip(np.round(t / scale), -127, 127) * scale
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_static_quant_clips_outliers():
    t = jnp.asarray([[100.0, -100.0, 0.5]])
    got = np.asarray(quantize_activation_static(t, jnp.asarray(1.0)))
    assert got[0, 0] <= 1.0 and got[0, 1] >= -1.0


def test_per_token_rowwise_scales():
    rng = np.random.default_rng(1)
    t = rng.normal(size=(8, 64)).astype(np.float32)
    t[3] *= 100
    got = np.asarray(quantize_activation_per_token_absmax(jnp.asarray(t)))
    # each row quantized to its own scale: error bounded by row absmax/127
    err = np.abs(got - t)
    bound = np.abs(t).max(axis=1, keepdims=True) / 127 * 0.51 + 1e-6
    assert (err <= bound).all()


def test_per_tensor_robust_clip():
    rng = np.random.default_rng(2)
    t = rng.normal(size=(32, 64)).astype(np.float32)
    t[0, 0] = 1000.0  # single outlier channel
    got = np.asarray(quantize_activation_per_tensor_absmax(jnp.asarray(t)))
    # robust scale = min(2*10th-largest, largest): the bulk is preserved
    bulk_err = np.abs(got[1:] - t[1:]).mean()
    assert bulk_err < 0.5


def test_dispatch():
    f = make_act_quant_fn(None)
    x = jnp.ones((2, 4))
    np.testing.assert_array_equal(np.asarray(f(x)), np.ones((2, 4)))
    for m in ("static", "per_tensor", "per_token", "per_tensor_asym"):
        f = make_act_quant_fn(m)
        y = f(x, jnp.asarray(1.0))
        assert y.shape == x.shape
