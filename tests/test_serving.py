"""Continuous batching: per-slot cache correctness + scheduler behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.serving.batch_engine import (
    engine_decode_batched,
    engine_prefill_slot,
    init_batched_cache,
)
from dgq_tpu.serving.scheduler import ContinuousBatcher, Request
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def serving_setup():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    return cfg, eng, ecfg


def test_slot_prefill_then_decode_matches_plain_engine(serving_setup):
    """Prefill into slot 1 of a 3-slot cache + batched decode must reproduce
    the plain single-sequence engine."""
    cfg, eng, ecfg = serving_setup
    prompt = synthetic_stream(cfg.vocab_size, 8, seed=3).astype(np.int32)

    # plain engine path
    cache0 = init_kv_cache(cfg, 1, 32)
    logits_plain, cache0 = engine_forward(ecfg, eng, jnp.asarray(prompt[None]), cache0)
    tok_plain = int(jnp.argmax(logits_plain[0, -1]))
    lg2, cache0 = engine_forward(
        ecfg, eng, jnp.asarray([[tok_plain]], jnp.int32), cache0
    )
    tok2_plain = int(jnp.argmax(lg2[0, -1]))

    # slot path (slot 1 of 3, prompt padded to 16)
    cache = init_batched_cache(cfg, 3, 32)
    logits, cache = engine_prefill_slot(
        ecfg, eng, jnp.asarray(1, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32), cache,
    )
    tok = int(jnp.argmax(logits))
    assert tok == tok_plain
    assert int(cache.lengths[1]) == 8 and int(cache.lengths[0]) == 0

    toks = jnp.asarray([0, tok, 0], jnp.int32)
    logits_b, cache = engine_decode_batched(
        ecfg, eng, toks, cache, jnp.asarray([False, True, False])
    )
    tok2 = int(jnp.argmax(logits_b[1]))
    assert tok2 == tok2_plain
    assert int(cache.lengths[1]) == 9
    assert int(cache.lengths[0]) == 0  # inactive slots do not advance


def test_continuous_batcher_serves_multiple_requests(serving_setup):
    cfg, eng, ecfg = serving_setup
    batcher = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=32, prefill_pad=8)
    rng = np.random.default_rng(0)
    reqs = [
        Request(uid=i, prompt_ids=rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32),
                max_new_tokens=4)
        for i, ln in enumerate([5, 7, 3])  # 3 requests, 2 slots
    ]
    for r in reqs:
        batcher.add_request(r)
    finished = batcher.run()
    assert len(finished) == 3
    for r in finished:
        assert r.done and len(r.output_ids) == 4
        assert all(0 <= t < cfg.vocab_size for t in r.output_ids)


def test_batcher_outputs_match_sequential_engine(serving_setup):
    """The interleaved continuous-batching schedule must produce the same
    greedy tokens as running each request alone."""
    cfg, eng, ecfg = serving_setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, size=6).astype(np.int32) for _ in range(3)]

    # sequential reference
    from dgq_tpu.models.engine import generate

    seq_outputs = []
    for p in prompts:
        toks = generate(ecfg, eng, jnp.asarray(p[None]), max_new_tokens=3, max_len=32)
        seq_outputs.append(list(np.asarray(toks[0])))

    batcher = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=32, prefill_pad=8)
    for i, p in enumerate(prompts):
        batcher.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=3))
    finished = sorted(batcher.run(), key=lambda r: r.uid)
    for r, want in zip(finished, seq_outputs):
        assert r.output_ids == want, (r.uid, r.output_ids, want)


def test_sampling_params():
    from dgq_tpu.serving.sampling import SamplingParams, sample_logits

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
    # greedy == argmax
    got = sample_logits(logits, SamplingParams())
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.argmax(logits, -1)))
    # top-k=1 sampling is deterministic argmax regardless of temperature
    got = sample_logits(logits, SamplingParams(temperature=5.0, top_k=1), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.argmax(logits, -1)))
    # top-p tiny keeps only the argmax
    got = sample_logits(logits, SamplingParams(temperature=1.0, top_p=1e-6), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.argmax(logits, -1)))
    # high temperature: samples vary with the key and stay in range
    a = sample_logits(logits, SamplingParams(temperature=2.0), jax.random.PRNGKey(2))
    b = sample_logits(logits, SamplingParams(temperature=2.0), jax.random.PRNGKey(3))
    assert ((np.asarray(a) >= 0) & (np.asarray(a) < 64)).all()


def test_generate_with_sampling(serving_setup):
    from dgq_tpu.models.engine import generate
    from dgq_tpu.serving.sampling import SamplingParams

    cfg, eng, ecfg = serving_setup
    prompt = jnp.asarray(synthetic_stream(cfg.vocab_size, 6, seed=17).reshape(1, 6))
    toks = generate(ecfg, eng, prompt, max_new_tokens=3, max_len=16,
                    sampling=SamplingParams(temperature=1.0, top_k=10),
                    rng_key=jax.random.PRNGKey(7))
    assert toks.shape == (1, 3)
    assert bool((toks >= 0).all()) and bool((toks < cfg.vocab_size).all())


def test_batcher_with_sampled_request(serving_setup):
    from dgq_tpu.serving.sampling import SamplingParams

    cfg, eng, ecfg = serving_setup
    batcher = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=32, prefill_pad=8)
    rng = np.random.default_rng(5)
    batcher.add_request(Request(uid=0, prompt_ids=rng.integers(0, cfg.vocab_size, 5).astype(np.int32),
                                max_new_tokens=3))
    batcher.add_request(Request(uid=1, prompt_ids=rng.integers(0, cfg.vocab_size, 5).astype(np.int32),
                                max_new_tokens=3,
                                sampling=SamplingParams(temperature=1.0, top_k=20)))
    finished = batcher.run()
    assert len(finished) == 2 and all(len(r.output_ids) == 3 for r in finished)


def test_batcher_from_checkpoint_matches_direct(serving_setup, tmp_path):
    """Serving startup from a save_engine checkpoint produces the same
    greedy outputs as constructing the batcher from in-memory params."""
    from dgq_tpu.utils.checkpoint import save_engine

    cfg, eng, ecfg = serving_setup
    path = str(tmp_path / "eng.safetensors")
    save_engine(path, eng, cfg)

    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32) for ln in (4, 6)]

    def run(batcher):
        for i, p in enumerate(prompts):
            batcher.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
        return {r.uid: r.output_ids for r in batcher.run()}

    out_direct = run(ContinuousBatcher(ecfg, eng, num_slots=2, max_len=32, prefill_pad=8))
    out_ckpt = run(ContinuousBatcher.from_checkpoint(
        path, use_kernel=False, num_slots=2, max_len=32, prefill_pad=8))
    assert out_direct == out_ckpt


def test_chunked_prefill_matches_whole_prefill(serving_setup):
    """engine_prefill_chunk piecewise == engine_prefill_slot whole
    (VERDICT r1 #8: chunked prefill)."""
    from dgq_tpu.serving.batch_engine import engine_prefill_chunk

    cfg, eng, ecfg = serving_setup
    prompt = synthetic_stream(cfg.vocab_size, 12, seed=7).astype(np.int32)

    cache_a = init_batched_cache(cfg, 2, 32)
    logits_a, cache_a = engine_prefill_slot(
        ecfg, eng, jnp.asarray(0, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 4))), jnp.asarray(12, jnp.int32), cache_a,
    )

    cache_b = init_batched_cache(cfg, 2, 32)
    c = 8
    padded = np.pad(prompt, (0, 4))  # 16 = 2 chunks of 8
    logits_b = None
    for pos in range(0, 16, c):
        valid = min(12, pos + c) - pos
        logits_b, cache_b = engine_prefill_chunk(
            ecfg, eng, jnp.asarray(0, jnp.int32),
            jnp.asarray(padded[pos:pos + c]), jnp.asarray(pos, jnp.int32),
            jnp.asarray(valid, jnp.int32), cache_b,
        )

    np.testing.assert_allclose(
        np.asarray(logits_b), np.asarray(logits_a), rtol=2e-4, atol=2e-4
    )
    assert int(cache_b.lengths[0]) == 12
    # the written cache regions must agree exactly (int8)
    ka = np.asarray(cache_a.k)[:, 0, :, :, :12]
    kb = np.asarray(cache_b.k)[:, 0, :, :, :12]
    np.testing.assert_array_equal(ka, kb)


def test_batched_prefill_matches_single(serving_setup):
    """engine_prefill_batched over 2 slots == two engine_prefill_slot calls
    (VERDICT r1 #8: batch>1 prefill)."""
    from dgq_tpu.serving.batch_engine import engine_prefill_batched

    cfg, eng, ecfg = serving_setup
    p1 = synthetic_stream(cfg.vocab_size, 8, seed=21).astype(np.int32)
    p2 = synthetic_stream(cfg.vocab_size, 5, seed=22).astype(np.int32)

    cache_a = init_batched_cache(cfg, 3, 32)
    la1, cache_a = engine_prefill_slot(
        ecfg, eng, jnp.asarray(2, jnp.int32),
        jnp.asarray(np.pad(p1, (0, 0))), jnp.asarray(8, jnp.int32), cache_a,
    )
    la2, cache_a = engine_prefill_slot(
        ecfg, eng, jnp.asarray(0, jnp.int32),
        jnp.asarray(np.pad(p2, (0, 3))), jnp.asarray(5, jnp.int32), cache_a,
    )

    cache_b = init_batched_cache(cfg, 3, 32)
    ids = np.zeros((2, 8), np.int32)
    ids[0, :8] = p1
    ids[1, :5] = p2
    logits, cache_b = engine_prefill_batched(
        ecfg, eng, jnp.asarray([2, 0], jnp.int32), jnp.asarray(ids),
        jnp.asarray([8, 5], jnp.int32), cache_b,
    )

    np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(la1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(la2), rtol=2e-4, atol=2e-4)
    assert int(cache_b.lengths[2]) == 8 and int(cache_b.lengths[0]) == 5
    np.testing.assert_array_equal(
        np.asarray(cache_a.k)[:, 2, :, :, :8], np.asarray(cache_b.k)[:, 2, :, :, :8]
    )


def test_scheduler_chunked_prefill_no_hol_stall(serving_setup):
    """A long prompt admitted while others decode advances one chunk per
    step; decode slots keep producing tokens every step (no head-of-line
    stall), and final outputs match the unchunked scheduler."""
    cfg, eng, ecfg = serving_setup

    def mk_reqs():
        return [
            Request(uid=1, prompt_ids=synthetic_stream(cfg.vocab_size, 6, seed=31).astype(np.int32),
                    max_new_tokens=6),
            Request(uid=2, prompt_ids=synthetic_stream(cfg.vocab_size, 20, seed=32).astype(np.int32),
                    max_new_tokens=4),
            Request(uid=3, prompt_ids=synthetic_stream(cfg.vocab_size, 4, seed=33).astype(np.int32),
                    max_new_tokens=6),
        ]

    plain = ContinuousBatcher(ecfg, eng, num_slots=3, max_len=64, prefill_pad=4)
    for r in mk_reqs():
        plain.add_request(r)
    done_plain = {r.uid: r.output_ids for r in plain.run()}

    chunked = ContinuousBatcher(
        ecfg, eng, num_slots=3, max_len=64, prefill_pad=4,
        prefill_chunk=8, admit_batch=2,
    )
    for r in mk_reqs():
        chunked.add_request(r)
    done_chunked = {r.uid: r.output_ids for r in chunked.run()}

    assert done_plain == done_chunked, (done_plain, done_chunked)


def test_batched_decode_fused_kernel_matches_xla(serving_setup):
    """engine_decode_batched with the fused decode kernels (interpret mode)
    matches the XLA fallback path per slot."""
    import dataclasses

    cfg, eng, ecfg = serving_setup
    cache0 = init_batched_cache(cfg, 3, 32)
    p = synthetic_stream(cfg.vocab_size, 8, seed=71).astype(np.int32)
    _, cache0 = engine_prefill_slot(
        ecfg, eng, jnp.asarray(0, jnp.int32), jnp.asarray(p),
        jnp.asarray(8, jnp.int32), cache0,
    )
    _, cache0 = engine_prefill_slot(
        ecfg, eng, jnp.asarray(2, jnp.int32), jnp.asarray(p[::-1].copy()),
        jnp.asarray(8, jnp.int32), cache0,
    )
    toks = jnp.asarray([5, 0, 9], jnp.int32)
    active = jnp.asarray([True, False, True])

    l_xla, c_xla = engine_decode_batched(ecfg, eng, toks, cache0, active)
    kcfg = dataclasses.replace(ecfg, use_kernel=True, interpret=True)
    l_k, c_k = engine_decode_batched(kcfg, eng, toks, cache0, active)
    sel = np.asarray([0, 2])
    np.testing.assert_allclose(
        np.asarray(l_k)[sel], np.asarray(l_xla)[sel], rtol=5e-3, atol=5e-3
    )
    np.testing.assert_array_equal(np.asarray(c_k.lengths), np.asarray(c_xla.lengths))


def test_decode_steps_multi_matches_single(serving_setup):
    """decode_steps=4 (multi-step on-device scan) produces byte-identical
    outputs to per-step dispatch for greedy requests, including EOS
    overshoot discard and max_new_tokens truncation."""
    cfg, eng, ecfg = serving_setup
    rng = np.random.default_rng(11)

    def mk_reqs():
        return [
            Request(uid=i,
                    prompt_ids=rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32),
                    max_new_tokens=mx)
            for i, (ln, mx) in enumerate([(5, 6), (7, 3), (3, 9)])
        ]

    rng = np.random.default_rng(11)
    plain = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8)
    for r in mk_reqs():
        plain.add_request(r)
    done_plain = {r.uid: r.output_ids for r in plain.run()}

    rng = np.random.default_rng(11)
    multi = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8,
                              decode_steps=4)
    for r in mk_reqs():
        multi.add_request(r)
    done_multi = {r.uid: r.output_ids for r in multi.run()}

    assert done_plain == done_multi, (done_plain, done_multi)


def test_decode_multi_runs_under_saturated_queue(serving_setup, monkeypatch):
    """With every slot busy and all active requests wanting >= decode_steps
    more tokens, queued requests no longer force single-step decode — the
    multi-step program fires WHILE the queue is non-empty, and outputs stay
    identical to the per-step scheduler (admission order included)."""
    cfg, eng, ecfg = serving_setup
    rng = np.random.default_rng(13)

    def mk_reqs():
        return [
            Request(uid=i,
                    prompt_ids=rng.integers(0, cfg.vocab_size, size=5 + i).astype(np.int32),
                    max_new_tokens=8)
            for i in range(4)
        ]

    rng = np.random.default_rng(13)
    plain = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8)
    for r in mk_reqs():
        plain.add_request(r)
    done_plain = {r.uid: r.output_ids for r in plain.run()}

    rng = np.random.default_rng(13)
    multi = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8,
                              decode_steps=4)
    fired_with_queue = []
    orig = multi._decode_multi

    def spy(n):
        fired_with_queue.append(bool(multi.queue))
        return orig(n)

    monkeypatch.setattr(multi, "_decode_multi", spy)
    for r in mk_reqs():
        multi.add_request(r)
    done_multi = {r.uid: r.output_ids for r in multi.run()}

    assert done_plain == done_multi, (done_plain, done_multi)
    assert any(fired_with_queue), "multi-step decode never ran while queued"


def test_batcher_recovers_from_device_failure(serving_setup, monkeypatch):
    """A transient device error mid-decode (surfacing lazily, as TPU backend
    errors do) triggers _recover: cache rebuilt, live slots re-prefilled
    from history, and the final outputs match an undisturbed run."""
    import dgq_tpu.serving.scheduler as sched_mod

    cfg, eng, ecfg = serving_setup
    rng = np.random.default_rng(21)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in [5, 7]]

    def mk_reqs():
        return [Request(uid=i, prompt_ids=p.copy(), max_new_tokens=6)
                for i, p in enumerate(prompts)]

    plain = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8)
    for r in mk_reqs():
        plain.add_request(r)
    want = {r.uid: r.output_ids for r in plain.run()}

    # inject: third decode call raises once
    real_decode = sched_mod.engine_decode_batched
    calls = {"n": 0}

    def flaky(*args, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("FAILED_PRECONDITION: device rebooted (injected)")
        return real_decode(*args, **kw)

    monkeypatch.setattr(sched_mod, "engine_decode_batched", flaky)
    flaky_b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8)
    for r in mk_reqs():
        flaky_b.add_request(r)
    got = {r.uid: r.output_ids for r in flaky_b.run()}

    assert calls["n"] > 3  # the failure actually fired and work continued
    assert flaky_b._recoveries == 1
    assert got == want, (got, want)


def test_batcher_cancel_queued_and_active(serving_setup):
    """cancel() finishes a queued request untouched and frees an active
    slot mid-generation; remaining requests are unaffected."""
    cfg, eng, ecfg = serving_setup
    b = ContinuousBatcher(ecfg, eng, num_slots=1, max_len=64, prefill_pad=16)
    p = np.asarray([3, 5, 3, 5], np.int32)
    r0 = Request(uid=0, prompt_ids=p, max_new_tokens=30)
    r1 = Request(uid=1, prompt_ids=p, max_new_tokens=4)  # stays queued (1 slot)
    b.add_request(r0)
    b.add_request(r1)
    b.step()  # r0 admitted + first decode
    assert b.cancel(1)  # cancel while queued
    assert r1.cancelled and r1.done and r1.output_ids == []
    n_before = len(r0.output_ids)
    assert n_before >= 1
    assert b.cancel(0)  # cancel while decoding
    assert r0.cancelled and len(r0.output_ids) == n_before
    assert not b.cancel(0)  # already finished
    assert not b.cancel(99)  # unknown uid
    assert not b.has_work
    assert {r.uid for r in b.finished} == {0, 1}
    assert b.metrics()["requests_finished"] == 2

    # the freed slot serves a new request normally
    ref = ContinuousBatcher(ecfg, eng, num_slots=1, max_len=64, prefill_pad=16)
    ref.add_request(Request(uid=5, prompt_ids=p, max_new_tokens=4))
    want = ref.run()[0].output_ids
    b.add_request(Request(uid=2, prompt_ids=p, max_new_tokens=4))
    got = b.run()
    assert [r for r in got if r.uid == 2][0].output_ids == want


def test_latency_metrics(serving_setup):
    """TTFT / e2e latency stamps and percentile metrics."""
    import time

    cfg, eng, ecfg = serving_setup
    b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16)
    p = np.asarray([3, 5, 3, 5], np.int32)
    t0 = time.time()
    for i in range(3):
        b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
    done = b.run()
    t1 = time.time()
    for r in done:
        assert r.t_submit is not None and t0 <= r.t_submit <= t1
        assert r.t_first is not None and r.t_first >= r.t_submit
        assert r.t_done is not None and r.t_done >= r.t_first
    m = b.metrics()
    assert m["e2e_ms_p50"] > 0 and m["ttft_ms_p50"] > 0
    assert m["e2e_ms_p95"] >= m["e2e_ms_p50"] >= m["ttft_ms_p50"]


def test_stop_sequences(serving_setup):
    """Multi-token stop sequences finish a request as soon as the output
    tail matches (the sequence stays in the output)."""
    cfg, eng, ecfg = serving_setup
    p = np.asarray([3, 5, 3, 5], np.int32)

    # discover the greedy continuation, then stop on a 2-gram from it
    b0 = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16)
    b0.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=10))
    full = b0.run()[0].output_ids
    stop = full[2:4]  # a real 2-gram mid-stream

    b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16)
    b.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=10,
                          stop_sequences=[stop]))
    got = b.run()[0].output_ids
    assert got == full[:4], (got, full, stop)

    # decode_steps>1 path discards overshoot past the stop the same way
    b2 = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16,
                           decode_steps=3)
    b2.add_request(Request(uid=0, prompt_ids=p, max_new_tokens=10,
                           stop_sequences=[stop]))
    got2 = b2.run()[0].output_ids
    assert got2 == full[:4], (got2, full)
