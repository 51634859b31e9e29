"""Prefix caching (ContinuousBatcher.register_prefix): the shared-prefix
KV is computed once and installed into slots; outputs must be identical to
full-prompt prefill."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, from_ptq
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.serving.scheduler import ContinuousBatcher, Request
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    return cfg, from_ptq(res.params, res.kv_scales, cfg)


def _run(cfg, eng, prompts, max_new, prefix=None, **kw):
    b = ContinuousBatcher(EngineConfig(cfg=cfg, use_kernel=False), eng,
                          num_slots=3, max_len=64, prefill_pad=8, **kw)
    if prefix is not None:
        b.register_prefix(prefix)
    for i, p in enumerate(prompts):
        b.add_request(Request(uid=i, prompt_ids=np.asarray(p, np.int32),
                              max_new_tokens=max_new))
    done = b.run()
    return {r.uid: list(r.output_ids) for r in done}, b


SYS = [9, 4, 2, 7, 1, 8, 3, 6]  # the shared "system prompt"


def test_prefix_cached_matches_plain(engine):
    cfg, eng = engine
    prompts = [SYS + [3, 5, 3, 5], SYS + [7, 7, 2], [1, 2, 3, 4]]
    plain, _ = _run(cfg, eng, prompts, 10)
    cached, b = _run(cfg, eng, prompts, 10, prefix=SYS)
    assert plain == cached
    assert b.prefix_hits == 2  # the third prompt doesn't match the prefix


def test_prefix_equal_prompt_takes_normal_path(engine):
    cfg, eng = engine
    # prompt == prefix exactly: no remainder to produce first-token logits
    # from, so the normal path must serve it
    plain, _ = _run(cfg, eng, [SYS], 6)
    cached, b = _run(cfg, eng, [SYS], 6, prefix=SYS)
    assert plain == cached and b.prefix_hits == 0


def test_prefix_with_speculation(engine):
    cfg, eng = engine
    prompts = [SYS + [3, 5, 3, 5, 3, 5]]
    plain, _ = _run(cfg, eng, prompts, 12)
    cached, b = _run(cfg, eng, prompts, 12, prefix=SYS, spec_k=3)
    assert plain == cached and b.prefix_hits == 1


def test_prefix_with_chunked_remainder(engine):
    """A long remainder after the prefix goes through the chunk machinery
    (one chunk per step, positions absolute over the full prompt) — output
    identical to the unchunked/no-prefix paths."""
    cfg, eng = engine
    long_tail = list(synthetic_stream(cfg.vocab_size, 20, seed=7).astype(int))
    prompts = [SYS + long_tail]
    plain, _ = _run(cfg, eng, prompts, 8)
    cached, b = _run(cfg, eng, prompts, 8, prefix=SYS, prefill_chunk=8)
    assert plain == cached and b.prefix_hits == 1


def test_multiple_prefixes_longest_match(engine):
    cfg, eng = engine
    short, long_ = SYS[:4], SYS  # long_ extends short
    prompts = [SYS + [3, 5], short + [8, 8, 8]]
    plain, _ = _run(cfg, eng, prompts, 8)
    b = ContinuousBatcher(EngineConfig(cfg=cfg, use_kernel=False), eng,
                          num_slots=3, max_len=64, prefill_pad=8)
    b.register_prefix(short)
    b.register_prefix(long_)
    for i, p in enumerate(prompts):
        b.add_request(Request(uid=i, prompt_ids=np.asarray(p, np.int32),
                              max_new_tokens=8))
    cached = {r.uid: list(r.output_ids) for r in b.run()}
    assert plain == cached
    assert b.prefix_hits == 2  # uid 0 via the long prefix, uid 1 via the short


def test_register_prefix_validation(engine):
    cfg, eng = engine
    b = ContinuousBatcher(EngineConfig(cfg=cfg, use_kernel=False), eng,
                          num_slots=2, max_len=16, prefill_pad=8)
    with pytest.raises(ValueError):
        b.register_prefix([])
    with pytest.raises(ValueError):
        b.register_prefix(list(range(16)))
