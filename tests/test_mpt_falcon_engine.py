"""MPT and Falcon INT8 engines (no reference counterpart: the reference
ships only block-dispatch plumbing for these archs, modelutils.py:39-52).
Same bar as the bloom engine tests: engine/fake-quant agreement, decode ==
prefill, INT8 cache, kernel-vs-XLA parity, checkpoint round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState
from dgq_tpu.models.falcon import falcon_apply, init_falcon_params, tiny_falcon_config
from dgq_tpu.models.falcon_engine import (
    FalconEngineConfig,
    falcon_engine_forward,
    from_ptq_falcon,
    init_falcon_kv_cache,
)
from dgq_tpu.models.mpt import init_mpt_params, mpt_apply, tiny_mpt_config
from dgq_tpu.models.mpt_engine import (
    MPTEngineConfig,
    from_ptq_mpt,
    init_mpt_kv_cache,
    mpt_engine_forward,
)
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.utils.datautils import synthetic_stream


def _qcfg():
    return QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)


@pytest.fixture(scope="module")
def mpt_setup():
    cfg = tiny_mpt_config(d_model=256, n_heads=4)
    params = init_mpt_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    res = ptq(params, cfg, calib, _qcfg(), arch="mpt", verbose=False)
    return cfg, res, from_ptq_mpt(res.params, res.kv_scales, cfg)


@pytest.fixture(scope="module")
def falcon_setup():
    cfg = tiny_falcon_config(hidden_size=256, num_attention_heads=4, num_kv_heads=2)
    params = init_falcon_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    res = ptq(params, cfg, calib, _qcfg(), arch="falcon", verbose=False)
    return cfg, res, from_ptq_falcon(res.params, res.kv_scales, cfg)


def test_mpt_engine_close_to_fake_quant(mpt_setup):
    cfg, res, eng = mpt_setup
    ecfg = MPTEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 24, seed=9).reshape(1, 24))
    cache = init_mpt_kv_cache(cfg, 1, 48)
    logits, cache2 = mpt_engine_forward(ecfg, eng, ids, cache)
    assert logits.shape == (1, 24, cfg.vocab_size)
    assert int(cache2.length) == 24 and bool(jnp.isfinite(logits).all())

    qs = QuantState(actq=True, wtq=True, kv=True)
    fq = mpt_apply(res.params, ids, cfg, qs, res.kv_scales)
    agree = (np.asarray(jnp.argmax(logits[0], -1)) == np.asarray(jnp.argmax(fq[0], -1))).mean()
    assert agree > 0.7, f"mpt engine/fake-quant agreement too low: {agree}"


def test_falcon_engine_close_to_fake_quant(falcon_setup):
    cfg, res, eng = falcon_setup
    ecfg = FalconEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 24, seed=9).reshape(1, 24))
    cache = init_falcon_kv_cache(cfg, 1, 48)
    logits, cache2 = falcon_engine_forward(ecfg, eng, ids, cache)
    assert logits.shape == (1, 24, cfg.vocab_size)
    assert int(cache2.length) == 24 and bool(jnp.isfinite(logits).all())

    qs = QuantState(actq=True, wtq=True, kv=True)
    fq = falcon_apply(res.params, ids, cfg, qs, res.kv_scales)
    agree = (np.asarray(jnp.argmax(logits[0], -1)) == np.asarray(jnp.argmax(fq[0], -1))).mean()
    assert agree > 0.7, f"falcon engine/fake-quant agreement too low: {agree}"


@pytest.mark.parametrize("family", ["mpt", "falcon"])
def test_engine_decode_matches_prefill(family, mpt_setup, falcon_setup):
    if family == "mpt":
        cfg, _, eng = mpt_setup
        ecfg = MPTEngineConfig(cfg=cfg, use_kernel=False)
        fwd, mk_cache = mpt_engine_forward, init_mpt_kv_cache
    else:
        cfg, _, eng = falcon_setup
        ecfg = FalconEngineConfig(cfg=cfg, use_kernel=False)
        fwd, mk_cache = falcon_engine_forward, init_falcon_kv_cache
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=5).reshape(1, 8))
    lg_all, _ = fwd(ecfg, eng, ids, mk_cache(cfg, 1, 16))
    cache = mk_cache(cfg, 1, 16)
    steps = []
    for i in range(8):
        lg, cache = fwd(ecfg, eng, ids[:, i:i + 1], cache)
        steps.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.asarray(lg_all[0]), np.stack(steps),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("family", ["mpt", "falcon"])
def test_engine_kernel_matches_xla(family, mpt_setup, falcon_setup):
    if family == "mpt":
        cfg, _, eng = mpt_setup
        mk = lambda **kw: MPTEngineConfig(cfg=cfg, **kw)  # noqa: E731
        fwd, mk_cache = mpt_engine_forward, init_mpt_kv_cache
    else:
        cfg, _, eng = falcon_setup
        mk = lambda **kw: FalconEngineConfig(cfg=cfg, **kw)  # noqa: E731
        fwd, mk_cache = falcon_engine_forward, init_falcon_kv_cache
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=6).reshape(1, 8))
    outs = {}
    for name, ecfg in (("k", mk(use_kernel=True, interpret=True, bm_prefill=128)),
                       ("x", mk(use_kernel=False))):
        lg, cache = fwd(ecfg, eng, ids, mk_cache(cfg, 1, 16))
        # decode step exercises the Pallas decode-attention kernel path
        # (with in-kernel ALiBi for MPT) in interpret mode
        tok = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
        lg2, _ = fwd(ecfg, eng, tok, cache)
        outs[name] = (np.asarray(lg), np.asarray(lg2))
    np.testing.assert_allclose(outs["k"][0], outs["x"][0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(outs["k"][1], outs["x"][1], rtol=2e-3, atol=2e-3)


def test_mpt_kv_cache_is_int8(mpt_setup):
    cfg, _, eng = mpt_setup
    ecfg = MPTEngineConfig(cfg=cfg, use_kernel=False)
    cache = init_mpt_kv_cache(cfg, 1, 16)
    _, cache = mpt_engine_forward(ecfg, eng, jnp.zeros((1, 4), jnp.int32), cache)
    assert cache.k.dtype == jnp.int8 and cache.v.dtype == jnp.int8


@pytest.mark.parametrize("family", ["mpt", "falcon"])
def test_engine_checkpoint_round_trip(family, mpt_setup, falcon_setup, tmp_path):
    from dgq_tpu.utils.checkpoint import load_engine, save_engine

    if family == "mpt":
        cfg, _, eng = mpt_setup
        ecfg = MPTEngineConfig(cfg=cfg, use_kernel=False)
        fwd, mk_cache = mpt_engine_forward, init_mpt_kv_cache
    else:
        cfg, _, eng = falcon_setup
        ecfg = FalconEngineConfig(cfg=cfg, use_kernel=False)
        fwd, mk_cache = falcon_engine_forward, init_falcon_kv_cache
    path = str(tmp_path / f"{family}.safetensors")
    save_engine(path, eng, cfg, arch=family)
    eng2, cfg2 = load_engine(path)
    assert cfg2 == cfg
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 6, seed=2).reshape(1, 6))
    lg1, _ = fwd(ecfg, eng, ids, mk_cache(cfg, 1, 8))
    lg2, _ = fwd(ecfg, eng2, ids, mk_cache(cfg, 1, 8))
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), rtol=1e-6, atol=1e-6)
