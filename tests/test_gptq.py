"""GPTQ correctness tests: Hessian accumulation and error-compensated
quantization vs. naive rounding."""

import numpy as np
import jax.numpy as jnp

from dgq_tpu.quant.gptq import gptq_quantize, init_hessian, update_hessian
from dgq_tpu.quant.search import naive_quantize


def test_hessian_accumulation_matches_numpy():
    rng = np.random.default_rng(0)
    k = 32
    H, n = init_hessian(k)
    xs = [rng.normal(size=(1, 16, k)).astype(np.float32) for _ in range(4)]
    for x in xs:
        H, n = update_hessian(H, n, jnp.asarray(x))
    # reference recurrence: H *= n/(n+1); H += 2/(n+1) X X^T per batch
    Hn = np.zeros((k, k), dtype=np.float32)
    cnt = 0.0
    for x in xs:
        flat = x.reshape(-1, k)
        Hn *= cnt / (cnt + 1)
        cnt += 1
        Hn += (2.0 / cnt) * flat.T @ flat
    np.testing.assert_allclose(np.asarray(H), Hn, rtol=1e-4, atol=1e-4)


def test_gptq_beats_naive_rounding():
    rng = np.random.default_rng(1)
    n, k, g = 16, 256, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(512, k)).astype(np.float32)
    # correlated inputs make error propagation matter
    x[:, 1::2] = 0.7 * x[:, 0::2] + 0.3 * x[:, 1::2]
    H = (2.0 / x.shape[0]) * x.T @ x

    res = gptq_quantize(jnp.asarray(w), jnp.asarray(H), groupsize=g)
    _, _, w_naive = naive_quantize(jnp.asarray(w), groupsize=g)

    ref_out = x @ w.T
    err_gptq = np.mean((x @ np.asarray(res.qweight_fp).T - ref_out) ** 2)
    err_naive = np.mean((x @ np.asarray(w_naive).T - ref_out) ** 2)
    assert err_gptq < err_naive


def test_gptq_scales_cover_groups():
    rng = np.random.default_rng(2)
    n, k, g = 8, 256, 64
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(128, k)).astype(np.float32)
    H = (2.0 / x.shape[0]) * x.T @ x
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(H), groupsize=g)
    assert res.scale.shape == (n, k // g)
    assert (np.asarray(res.scale) > 0).all()
    assert np.isfinite(float(res.error))


def test_gptq_act_order_runs():
    rng = np.random.default_rng(3)
    n, k, g = 8, 256, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(128, k)).astype(np.float32) * np.linspace(0.1, 4, k)
    H = (2.0 / x.shape[0]) * x.T @ x
    res = gptq_quantize(jnp.asarray(w), jnp.asarray(H), groupsize=g, act_order=True)
    ref_out = x @ w.T
    rel = np.linalg.norm(x @ np.asarray(res.qweight_fp).T - ref_out) / np.linalg.norm(ref_out)
    assert rel < 0.1
