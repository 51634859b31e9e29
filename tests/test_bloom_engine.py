"""BLOOM INT8 engine (no reference counterpart — its engine is absent)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.bloom import bloom_apply, init_bloom_params, tiny_bloom_config
from dgq_tpu.models.bloom_engine import (
    BloomEngineConfig,
    bloom_engine_forward,
    from_ptq_bloom,
    init_bloom_kv_cache,
)
from dgq_tpu.models.llama import QuantState
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def bloom_engine_setup():
    cfg = tiny_bloom_config(hidden_size=256, num_attention_heads=4)
    params = init_bloom_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
        smoothquant=True, kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="bloom", verbose=False)
    eng = from_ptq_bloom(res.params, res.kv_scales, cfg)
    return cfg, params, res, eng


def test_bloom_engine_prefill_close_to_fake_quant(bloom_engine_setup):
    cfg, params, res, eng = bloom_engine_setup
    ecfg = BloomEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 24, seed=9).reshape(1, 24))
    cache = init_bloom_kv_cache(cfg, 1, 48)
    logits, cache2 = bloom_engine_forward(ecfg, eng, ids, cache)
    assert logits.shape == (1, 24, cfg.vocab_size)
    assert int(cache2.length) == 24
    assert bool(jnp.isfinite(logits).all())

    qs = QuantState(actq=True, wtq=True, kv=True)
    fq_logits = bloom_apply(res.params, ids, cfg, qs, res.kv_scales)
    agree = (
        np.asarray(jnp.argmax(logits[0], -1)) == np.asarray(jnp.argmax(fq_logits[0], -1))
    ).mean()
    assert agree > 0.7, f"bloom engine/fake-quant agreement too low: {agree}"


def test_bloom_engine_decode_matches_prefill(bloom_engine_setup):
    cfg, params, res, eng = bloom_engine_setup
    ecfg = BloomEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=5).reshape(1, 8))
    cache = init_bloom_kv_cache(cfg, 1, 16)
    logits_all, _ = bloom_engine_forward(ecfg, eng, ids, cache)

    cache = init_bloom_kv_cache(cfg, 1, 16)
    step_logits = []
    for t in range(8):
        lg, cache = bloom_engine_forward(ecfg, eng, ids[:, t : t + 1], cache)
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(step_logits), rtol=3e-3, atol=3e-3
    )


def test_bloom_engine_kernel_matches_xla(bloom_engine_setup):
    cfg, params, res, eng = bloom_engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=3).reshape(1, 8))
    cache = init_bloom_kv_cache(cfg, 1, 16)
    lx, _ = bloom_engine_forward(BloomEngineConfig(cfg=cfg, use_kernel=False), eng, ids, cache)
    lk, _ = bloom_engine_forward(
        BloomEngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                          bm_prefill=128, bm_decode=128),
        eng, ids, cache,
    )
    agree = (np.asarray(jnp.argmax(lx[0], -1)) == np.asarray(jnp.argmax(lk[0], -1))).mean()
    assert agree > 0.9


def test_bloom_engine_alibi_decode_kernel_matches_xla(bloom_engine_setup):
    """The decode step runs the Pallas attention kernel with in-kernel
    ALiBi (interpret mode); logits must match the XLA einsum path."""
    cfg, params, res, eng = bloom_engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=3).reshape(1, 8))
    outs = {}
    for name, ecfg in (
        ("x", BloomEngineConfig(cfg=cfg, use_kernel=False)),
        ("k", BloomEngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                                bm_prefill=128, bm_decode=128)),
    ):
        cache = init_bloom_kv_cache(cfg, 1, 16)
        lg, cache = bloom_engine_forward(ecfg, eng, ids, cache)
        tok = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
        lg2, _ = bloom_engine_forward(ecfg, eng, tok, cache)  # s=1: kernel path
        outs[name] = np.asarray(lg2)
    np.testing.assert_allclose(outs["k"], outs["x"], rtol=2e-3, atol=2e-3)


def test_bloom_engine_alibi_flash_prefill_matches_xla(bloom_engine_setup):
    """s > 8 with a 128-multiple cache engages the flash kernel with
    in-kernel ALiBi; logits must match the XLA score-materializing path."""
    cfg, params, res, eng = bloom_engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 12, seed=4).reshape(1, 12))
    lg_x, _ = bloom_engine_forward(
        BloomEngineConfig(cfg=cfg, use_kernel=False), eng, ids,
        init_bloom_kv_cache(cfg, 1, 128),
    )
    lg_k, _ = bloom_engine_forward(
        BloomEngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                          bm_prefill=128, bm_decode=128),
        eng, ids, init_bloom_kv_cache(cfg, 1, 128),
    )
    np.testing.assert_allclose(np.asarray(lg_k), np.asarray(lg_x),
                               rtol=2e-3, atol=2e-3)


def test_bloom_engine_checkpoint_roundtrip(bloom_engine_setup, tmp_path):
    from dgq_tpu.utils.checkpoint import load_engine, save_engine

    cfg, params, res, eng = bloom_engine_setup
    path = str(tmp_path / "bloom_engine.safetensors")
    save_engine(path, eng, cfg, arch="bloom")
    eng2, cfg2 = load_engine(path)
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(eng), jax.tree_util.tree_leaves(eng2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
