"""OPT continuous batching: the family-generic scheduler over the OPT
device-fn namespace (serving/opt_batch_engine.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.opt import init_opt_params, tiny_opt_config
from dgq_tpu.models.opt_engine import (
    OPTEngineConfig,
    from_ptq_opt,
    init_opt_kv_cache,
    opt_engine_forward,
)
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.serving.opt_batch_engine import opt_batcher
from dgq_tpu.serving.scheduler import Request
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def opt_serving_setup():
    cfg = tiny_opt_config(hidden_size=256, ffn_dim=512, num_attention_heads=4)
    params = init_opt_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)
    res = ptq(params, cfg, calib, qcfg, arch="opt", verbose=False)
    eng = from_ptq_opt(res.params, res.kv_scales, cfg)
    ecfg = OPTEngineConfig(cfg=cfg, use_kernel=False)
    return cfg, eng, ecfg


def _sequential_greedy(cfg, eng, ecfg, prompt, n_new, max_len=64):
    """Reference: whole-batch opt_engine_forward, one token at a time."""
    cache = init_opt_kv_cache(cfg, 1, max_len)
    logits, cache = opt_engine_forward(ecfg, eng, jnp.asarray(prompt[None]), cache)
    out = [int(jnp.argmax(logits[0, -1]))]
    for _ in range(n_new - 1):
        logits, cache = opt_engine_forward(
            ecfg, eng, jnp.asarray([[out[-1]]], jnp.int32), cache
        )
        out.append(int(jnp.argmax(logits[0, -1])))
    return out


def test_opt_batcher_matches_sequential(opt_serving_setup):
    cfg, eng, ecfg = opt_serving_setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)
               for n in (6, 9, 4)]

    want = {i: _sequential_greedy(cfg, eng, ecfg, p, 4) for i, p in enumerate(prompts)}

    b = opt_batcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8)
    for i, p in enumerate(prompts):
        b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
    got = {r.uid: r.output_ids for r in b.run()}
    assert got == want, (got, want)


def test_opt_batcher_multi_prefix_and_chunk(opt_serving_setup):
    """decode_steps>1, prefix caching, and chunked prefill all ride the
    generic scheduler over the OPT fns."""
    cfg, eng, ecfg = opt_serving_setup
    rng = np.random.default_rng(7)
    prefix = rng.integers(0, cfg.vocab_size, size=10).astype(np.int32)
    prompts = [
        np.concatenate([prefix, rng.integers(0, cfg.vocab_size, size=4).astype(np.int32)]),
        rng.integers(0, cfg.vocab_size, size=18).astype(np.int32),  # chunked
    ]

    def run(**kw):
        b = opt_batcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=5))
        out = {r.uid: r.output_ids for r in b.run()}
        assert b.prefix_hits == 1
        return out

    base = run()
    assert run(decode_steps=3) == base
    assert run(prefill_chunk=8) == base


def test_opt_batcher_rejects_unsupported(opt_serving_setup):
    cfg, eng, ecfg = opt_serving_setup
    with pytest.raises(ValueError):
        opt_batcher(ecfg, eng, spec_k=2)
    with pytest.raises(ValueError):
        opt_batcher(ecfg, eng, admit_batch=4)
