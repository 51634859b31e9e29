"""Quantization metrics and report tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama, ptq
from dgq_tpu.utils.datautils import synthetic_stream
from dgq_tpu.utils.metrics import QuantReport, snr_error, weight_quant_metrics
from dgq_tpu.quant.smooth import smooth_att_qk, smooth_ov
import pytest

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def test_snr_error_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32)).astype(np.float32))
    assert float(snr_error(x, x)) == 0.0


def test_snr_error_scales_with_noise():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    n1 = y + 0.01 * jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    n2 = y + 0.1 * jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    assert float(snr_error(n1, y)) < float(snr_error(n2, y))


def test_ptq_emits_report():
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=1)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=32))
    report = QuantReport()
    ptq(params, cfg, calib, qcfg, verbose=False, report=report)
    assert len(report.records) == 7  # 7 linears per llama layer
    s = report.summary()
    assert s["n_linears"] == 7
    assert 0 < s["mean_weight_snr"] < 1.0  # quantization error present but sane
    assert report.to_json().startswith("[")


def test_smooth_att_qk_preserves_qk_product():
    rng = np.random.default_rng(2)
    d = 32
    qw = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    kw = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    qs = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32) + 0.1)
    ks = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32) + 0.1)
    nq, nk = smooth_att_qk(qw, kw, qs, ks)
    x = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    # per-channel products q_c * k_c preserved (so q.k^T is preserved)
    np.testing.assert_allclose(
        np.asarray((nq @ x) * (nk @ x)), np.asarray((qw @ x) * (kw @ x)), rtol=1e-4
    )


def test_smooth_ov_preserves_function():
    rng = np.random.default_rng(3)
    d = 64
    vw = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    ow = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    act = jnp.asarray(np.abs(rng.normal(size=(d,))).astype(np.float32) + 0.1)
    nv, _, no = smooth_ov(vw, None, ow, act)
    x = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(no @ (nv @ x)), np.asarray(ow @ (vw @ x)), rtol=1e-3, atol=1e-3
    )
