"""Mixtral MoE INT8 engine tests: fake-quant agreement, decode==prefill,
kernel-path parity, routing equality between engine and eval paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState
from dgq_tpu.models.mixtral import (
    init_mixtral_params,
    mixtral_apply,
    tiny_mixtral_config,
)
from dgq_tpu.models.mixtral_engine import (
    MixtralEngineConfig,
    from_ptq_mixtral,
    init_mixtral_kv_cache,
    mixtral_engine_forward,
)
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def mixtral_engine_setup():
    cfg = tiny_mixtral_config(hidden_size=256, intermediate_size=512,
                              num_attention_heads=4, num_key_value_heads=2)
    params = init_mixtral_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=128),
        smoothquant=True,
        kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="mixtral", verbose=False)
    eng = from_ptq_mixtral(res.params, res.kv_scales, cfg)
    return cfg, params, res, eng


def test_mixtral_engine_prefill_agrees_with_fake_quant(mixtral_engine_setup):
    cfg, params, res, eng = mixtral_engine_setup
    ecfg = MixtralEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 24, seed=9).reshape(1, 24))
    cache = init_mixtral_kv_cache(cfg, 1, 48)
    logits, cache2 = mixtral_engine_forward(ecfg, eng, ids, cache)
    assert logits.shape == (1, 24, cfg.vocab_size)
    assert int(cache2.length) == 24
    assert bool(jnp.isfinite(logits).all())

    qs = QuantState(actq=True, wtq=True, kv=True)
    fq_logits = mixtral_apply(res.params, ids, cfg, qs, res.kv_scales)
    agree = (np.asarray(jnp.argmax(logits[0], -1))
             == np.asarray(jnp.argmax(fq_logits[0], -1))).mean()
    assert agree > 0.75, f"mixtral engine/fake-quant agreement too low: {agree}"


def test_mixtral_engine_decode_matches_prefill(mixtral_engine_setup):
    cfg, params, res, eng = mixtral_engine_setup
    ecfg = MixtralEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 10, seed=5).reshape(1, 10))
    cache = init_mixtral_kv_cache(cfg, 1, 16)
    logits_all, _ = mixtral_engine_forward(ecfg, eng, ids, cache)

    cache = init_mixtral_kv_cache(cfg, 1, 16)
    step_logits = []
    for t in range(10):
        lg, cache = mixtral_engine_forward(ecfg, eng, ids[:, t : t + 1], cache)
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(step_logits), rtol=2e-3, atol=2e-3
    )


def test_mixtral_engine_kernel_path_matches_xla(mixtral_engine_setup):
    """Pallas (interpret) kernels vs the XLA golden path — same contract the
    dense engines hold (tests/test_engine.py)."""
    cfg, params, res, eng = mixtral_engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=3).reshape(1, 8))

    e_x = MixtralEngineConfig(cfg=cfg, use_kernel=False)
    e_k = MixtralEngineConfig(cfg=cfg, use_kernel=True, interpret=True)
    lx, cx = mixtral_engine_forward(e_x, eng, ids, init_mixtral_kv_cache(cfg, 1, 16))
    lk, ck = mixtral_engine_forward(e_k, eng, ids, init_mixtral_kv_cache(cfg, 1, 16))
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lk), rtol=2e-3, atol=2e-3)

    # one decode step on each path from the same cache
    nxt = jnp.argmax(lx[:, -1:], -1)
    dx, _ = mixtral_engine_forward(e_x, eng, nxt, cx)
    dk, _ = mixtral_engine_forward(e_k, eng, nxt, ck)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dk), rtol=2e-3, atol=2e-3)


def test_mixtral_engine_greedy_matches_fake_quant_greedy(mixtral_engine_setup):
    """Greedy continuation: engine tokens == fake-quant tokens (routing and
    argmax decisions line up across the two execution modes)."""
    cfg, params, res, eng = mixtral_engine_setup
    ecfg = MixtralEngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray(synthetic_stream(cfg.vocab_size, 12, seed=7).reshape(1, 12))
    qs = QuantState(actq=True, wtq=True, kv=True)

    cache = init_mixtral_kv_cache(cfg, 1, 32)
    lg, cache = mixtral_engine_forward(ecfg, eng, prompt, cache)
    eng_toks = [int(jnp.argmax(lg[0, -1]))]
    for _ in range(5):
        lg, cache = mixtral_engine_forward(
            ecfg, eng, jnp.asarray([[eng_toks[-1]]]), cache
        )
        eng_toks.append(int(jnp.argmax(lg[0, -1])))

    ids = prompt
    fq_toks = []
    for _ in range(6):
        logits = mixtral_apply(res.params, ids, cfg, qs, res.kv_scales)
        t = int(jnp.argmax(logits[0, -1]))
        fq_toks.append(t)
        ids = jnp.concatenate([ids, jnp.asarray([[t]])], axis=1)

    assert eng_toks == fq_toks, (eng_toks, fq_toks)
