"""Speculative decoding inside the ContinuousBatcher (spec_k > 0).

The exactness contract (serving/speculative.py): every emitted token is
the greedy argmax of the verification forward; in XLA-fallback mode the
verify and decode paths compute identically, so batcher output with
speculation must equal batcher output without it, token for token.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, from_ptq
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.serving.batch_engine import (
    engine_decode_batched,
    engine_prefill_slot,
    engine_verify_batched,
    init_batched_cache,
)
from dgq_tpu.serving.scheduler import ContinuousBatcher, Request
from dgq_tpu.serving.sampling import SamplingParams
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    return cfg, eng, ecfg


def _run_batcher(cfg, eng, ecfg, prompts, max_new, **kw):
    b = ContinuousBatcher(ecfg, eng, num_slots=3, max_len=64, prefill_pad=16, **kw)
    for i, p in enumerate(prompts):
        b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=max_new))
    done = b.run()
    return {r.uid: list(r.output_ids) for r in done}, b


def test_verify_step_matches_sequential_decode(setup):
    """engine_verify_batched on [tok, d1, d2] must produce, at position i,
    the same greedy token a sequential per-token decode produces after
    feeding the same prefix — the acceptance rule's foundation."""
    cfg, eng, ecfg = setup
    prompt = synthetic_stream(cfg.vocab_size, 8, seed=3).astype(np.int32)

    cache = init_batched_cache(cfg, 2, 64)
    logits, cache = engine_prefill_slot(
        ecfg, eng, jnp.asarray(0, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32), cache,
    )
    tok = int(jnp.argmax(logits))

    # sequential: feed tok, then whatever comes next, twice
    seq_cache = jax.tree_util.tree_map(lambda x: x, cache)
    seq_toks = []
    cur = tok
    active = jnp.asarray([True, False])
    for _ in range(3):
        lg, seq_cache = engine_decode_batched(
            ecfg, eng, jnp.asarray([cur, 0], jnp.int32), seq_cache, active)
        cur = int(jnp.argmax(lg[0]))
        seq_toks.append(cur)

    # verification window [tok, seq_toks[0], seq_toks[1]] — drafts are the
    # true continuations, so all must be accepted and greedy[i] == seq_toks[i]
    ids = np.zeros((2, 3), np.int32)
    ids[0] = [tok, seq_toks[0], seq_toks[1]]
    vlogits, _ = engine_verify_batched(ecfg, eng, jnp.asarray(ids), cache)
    greedy = np.asarray(jnp.argmax(vlogits, axis=-1))[0]
    assert list(greedy) == seq_toks


def test_batcher_spec_matches_plain(setup):
    cfg, eng, ecfg = setup
    # repetitive prompts so prompt-lookup accepts drafts
    p1 = np.asarray([3, 5, 3, 5, 3, 5, 3, 5], np.int32)
    p2 = np.asarray([7, 7, 2, 7, 7, 2, 7, 7], np.int32)
    plain, _ = _run_batcher(cfg, eng, ecfg, [p1, p2], 16)
    spec, b = _run_batcher(cfg, eng, ecfg, [p1, p2], 16, spec_k=3)
    assert plain == spec
    assert b.spec_stats["steps"] > 0
    # random tiny models loop: speculation must actually accept drafts
    assert b.spec_stats["tokens"] > b.spec_stats["steps"], b.spec_stats


def test_batcher_spec_respects_eos_and_max(setup):
    cfg, eng, ecfg = setup
    p = np.asarray([3, 5, 3, 5, 3, 5], np.int32)
    plain, _ = _run_batcher(cfg, eng, ecfg, [p], 9)
    # eos = the 4th plain token: spec run must stop at the same place
    eos = plain[0][3]
    b1 = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16)
    b1.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=9, eos_token_id=eos))
    r_plain = b1.run()[0]
    b2 = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16, spec_k=3)
    b2.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=9, eos_token_id=eos))
    r_spec = b2.run()[0]
    assert r_plain.output_ids == r_spec.output_ids
    assert r_spec.output_ids[-1] == eos


def test_batcher_spec_sampling_slot_falls_back(setup):
    """A sampling request in the batch must disable speculation (greedy
    verification would change its distribution) — the run still completes."""
    cfg, eng, ecfg = setup
    p = np.asarray([3, 5, 3, 5], np.int32)
    b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16, spec_k=3)
    b.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=8))
    b.add_request(Request(uid=1, prompt_ids=p, max_new_tokens=8,
                          sampling=SamplingParams(temperature=0.9)))
    done = b.run()
    assert len(done) == 2 and all(len(r.output_ids) == 8 for r in done)
    assert b.spec_stats["steps"] == 0  # never engaged with a sampling slot live


def test_batcher_spec_multi_matches_plain(setup):
    """spec_k>0 + decode_steps>1 composes: decode_steps on-device
    speculative steps per dispatch (engine_spec_decode_multi), output
    identical to the plain batcher."""
    cfg, eng, ecfg = setup
    p1 = np.asarray([3, 5, 3, 5, 3, 5, 3, 5], np.int32)
    p2 = np.asarray([7, 7, 2, 7, 7, 2, 7, 7], np.int32)
    plain, _ = _run_batcher(cfg, eng, ecfg, [p1, p2], 16)
    spec, b = _run_batcher(cfg, eng, ecfg, [p1, p2], 16, spec_k=3,
                           decode_steps=2)
    assert plain == spec
    assert b.spec_stats["steps"] > 0
    assert b.spec_stats["tokens"] > b.spec_stats["steps"], b.spec_stats


def test_batcher_spec_multi_eos(setup):
    cfg, eng, ecfg = setup
    p = np.asarray([3, 5, 3, 5, 3, 5], np.int32)
    plain, _ = _run_batcher(cfg, eng, ecfg, [p], 12)
    eos = plain[0][4]
    outs = {}
    for kw in ({}, {"spec_k": 3, "decode_steps": 3}):
        b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64,
                              prefill_pad=16, **kw)
        b.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=12,
                              eos_token_id=eos))
        outs[bool(kw)] = b.run()[0].output_ids
    assert outs[False] == outs[True]
    assert outs[True][-1] == eos


def test_batcher_metrics(setup):
    import json

    cfg, eng, ecfg = setup
    b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16,
                          spec_k=3)
    b.add_request(Request(uid=0, prompt_ids=np.asarray([3, 5] * 3, np.int32),
                          max_new_tokens=8))
    b.run()
    m = b.metrics()
    json.dumps(m)  # must be JSON-able
    assert m["requests_finished"] == 1 and m["tokens_generated"] == 8
    assert m["slots_active"] == 0 and m["recoveries"] == 0
    assert m["spec_tokens_per_step"] >= 1.0


def test_batcher_spec_near_capacity_falls_back(setup):
    """Slots without spec headroom force plain decode; output still exact."""
    cfg, eng, ecfg = setup
    p = np.asarray([3, 5, 3, 5, 3, 5, 3, 5], np.int32)
    outs = {}
    for spec_k in (0, 4):
        b = ContinuousBatcher(ecfg, eng, num_slots=1, max_len=16,
                              prefill_pad=8, spec_k=spec_k)
        b.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=12))
        outs[spec_k] = b.run()[0].output_ids
    # speculation engages while there is headroom (8 + 5 < 16), falls back
    # to plain decode at the capacity edge; truncated output identical
    assert outs[0] == outs[4]


def test_spec_adaptive_suspends_on_low_acceptance(setup):
    """The adaptive policy (VERDICT r3 #3) suspends speculation when the
    measured tokens/step EWMA stops covering the verify cost, and
    re-probes after spec_probe_every scheduler steps."""
    cfg, eng, ecfg = setup
    b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16,
                          spec_k=3, spec_cost_ratio=1.35, spec_probe_every=16)
    # drive the policy directly: 8 low-yield dispatches -> suspension
    for _ in range(8):
        b._spec_note(tokens=2, steps=2)  # 1.0 tok/step < 1.35
    assert b._spec_suspended == 16
    # suspended: _spec_paying ticks down and blocks spec
    for i in range(16):
        assert not b._spec_paying(), i
    # probe window over: speculation re-engages with a fresh EWMA
    assert b._spec_paying()
    assert b._spec_ewma is None

    # high-yield dispatches never suspend
    b2 = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16,
                           spec_k=3)
    for _ in range(32):
        b2._spec_note(tokens=4, steps=2)  # 2.0 tok/step > 1.35
    assert b2._spec_suspended == 0 and b2._spec_paying()


def test_spec_adaptive_outputs_stay_exact(setup):
    """Adaptive suspension only changes WHICH path emits tokens — greedy
    outputs stay identical to plain decode."""
    cfg, eng, ecfg = setup
    rng = np.random.default_rng(3)
    # low-acceptance prompts (random text) with a tiny probe period so the
    # run crosses suspend/resume boundaries
    prompts = [rng.integers(0, cfg.vocab_size, 12).astype(np.int32)
               for _ in range(3)]
    plain, _ = _run_batcher(cfg, eng, ecfg, prompts, 10)
    spec, _ = _run_batcher(cfg, eng, ecfg, prompts, 10, spec_k=3,
                           spec_probe_every=4)
    assert plain == spec
