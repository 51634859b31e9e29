"""OPT INT8 engine tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState
from dgq_tpu.models.opt import init_opt_params, opt_apply, tiny_opt_config
from dgq_tpu.models.opt_engine import (
    OPTEngineConfig,
    from_ptq_opt,
    init_opt_kv_cache,
    opt_engine_forward,
)
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def opt_engine_setup():
    cfg = tiny_opt_config(hidden_size=256, ffn_dim=512, num_attention_heads=4)
    params = init_opt_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=128),
        smoothquant=True,
        kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="opt", verbose=False)
    eng = from_ptq_opt(res.params, res.kv_scales, cfg)
    return cfg, params, res, eng


def test_opt_engine_prefill_runs(opt_engine_setup):
    cfg, params, res, eng = opt_engine_setup
    ecfg = OPTEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 24, seed=9).reshape(1, 24))
    cache = init_opt_kv_cache(cfg, 1, 48)
    logits, cache2 = opt_engine_forward(ecfg, eng, ids, cache)
    assert logits.shape == (1, 24, cfg.vocab_size)
    assert int(cache2.length) == 24
    assert bool(jnp.isfinite(logits).all())

    # top-1 agreement with the fake-quant path
    qs = QuantState(actq=True, wtq=True, kv=True)
    fq_logits = opt_apply(res.params, ids, cfg, qs, res.kv_scales)
    agree = (np.asarray(jnp.argmax(logits[0], -1)) == np.asarray(jnp.argmax(fq_logits[0], -1))).mean()
    assert agree > 0.75, f"opt engine/fake-quant agreement too low: {agree}"


def test_opt_engine_decode_matches_prefill(opt_engine_setup):
    cfg, params, res, eng = opt_engine_setup
    ecfg = OPTEngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 10, seed=5).reshape(1, 10))
    cache = init_opt_kv_cache(cfg, 1, 16)
    logits_all, _ = opt_engine_forward(ecfg, eng, ids, cache)

    cache = init_opt_kv_cache(cfg, 1, 16)
    step_logits = []
    for t in range(10):
        lg, cache = opt_engine_forward(ecfg, eng, ids[:, t : t + 1], cache)
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(step_logits), rtol=2e-3, atol=2e-3
    )


def test_ppl_eval_engine_opt(opt_engine_setup):
    """ppl_eval_engine generalizes across engine families via forward/cache fns."""
    from dgq_tpu.utils.evalutils import ppl_eval, ppl_eval_engine

    cfg, params, res, eng = opt_engine_setup
    ecfg = OPTEngineConfig(cfg=cfg, use_kernel=False)
    stream = synthetic_stream(cfg.vocab_size, 2 * 32, seed=11)
    ppl_engine = ppl_eval_engine(
        ecfg, eng, stream, seqlen=32, max_samples=2,
        forward_fn=opt_engine_forward, init_cache_fn=init_opt_kv_cache,
    )
    assert np.isfinite(ppl_engine) and ppl_engine > 1.0
    # must be in the same ballpark as the fake-quant ppl on the same stream
    qs = QuantState(actq=True, wtq=True, kv=True)
    ppl_fq = ppl_eval(
        lambda p, ids: opt_apply(p, ids, cfg, qs, res.kv_scales),
        res.params, stream, seqlen=32, max_samples=2,
    )
    assert abs(np.log(ppl_engine) - np.log(ppl_fq)) < 0.5, (ppl_engine, ppl_fq)


def test_opt_engine_kernel_matches_xla(opt_engine_setup):
    cfg, params, res, eng = opt_engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=3).reshape(1, 8))
    cache = init_opt_kv_cache(cfg, 1, 16)
    lx, _ = opt_engine_forward(OPTEngineConfig(cfg=cfg, use_kernel=False), eng, ids, cache)
    lk, _ = opt_engine_forward(
        OPTEngineConfig(cfg=cfg, use_kernel=True, interpret=True, bm_prefill=128, bm_decode=128),
        eng, ids, cache,
    )
    # int8-out rounding can differ by 1 code on ties; compare loosely
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lk), rtol=0.1, atol=0.3)
    agree = (np.asarray(jnp.argmax(lx[0], -1)) == np.asarray(jnp.argmax(lk[0], -1))).mean()
    assert agree > 0.9


def test_opt_engine_checkpoint_roundtrip(opt_engine_setup, tmp_path):
    """save_engine/load_engine must round-trip non-LLaMA engine families
    bitwise (arch recorded in the manifest, NamedTuple rebuild)."""
    from dgq_tpu.utils.checkpoint import load_engine, save_engine

    cfg, params, res, eng = opt_engine_setup
    path = str(tmp_path / "opt_engine.safetensors")
    save_engine(path, eng, cfg, arch="opt")
    eng2, cfg2 = load_engine(path)
    assert cfg2 == cfg
    flat1 = jax.tree_util.tree_leaves(eng)
    flat2 = jax.tree_util.tree_leaves(eng2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ecfg = OPTEngineConfig(cfg=cfg2, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=2).reshape(1, 8))
    cache = init_opt_kv_cache(cfg2, 1, 16)
    l1, _ = opt_engine_forward(ecfg, eng, ids, cache)
    l2, _ = opt_engine_forward(ecfg, eng2, ids, cache)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
