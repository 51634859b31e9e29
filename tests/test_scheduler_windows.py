"""Round-3 scheduler behaviors: host length mirror, clamped multi-step
windows, and decode-dispatch pipelining (VERDICT r2 #2).

The contract under test: none of the dispatch-amortization machinery may
change EMITTED TOKENS — greedy output must be byte-identical to the plain
single-step scheduler — and the host mirror must track device lengths
exactly (the r2 bug class: a zero-copy-aliased upload let an in-place host
mutation corrupt an in-flight device program's input).
"""

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
def setup():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    return cfg, eng, EngineConfig(cfg=cfg, use_kernel=False)


def _requests(cfg, n, max_new):
    reqs = []
    for i in range(n):
        p = synthetic_stream(cfg.vocab_size, 5 + (i % 4), seed=100 + i).astype(np.int32)
        mn = max_new if np.isscalar(max_new) else max_new[i]
        reqs.append(Request(uid=i, prompt_ids=p, max_new_tokens=int(mn)))
    return reqs


def _run(cfg, eng, ecfg, reqs, **kw):
    b = ContinuousBatcher(ecfg, eng, num_slots=4, max_len=64, prefill_pad=8, **kw)
    for r in reqs:
        b.add_request(r)
    done = b.run()
    return {r.uid: r.output_ids for r in done}, b


def test_pipelined_windows_match_single_step(setup):
    """Windows left in flight + device-chained next tokens emit exactly the
    single-step scheduler's tokens (12 requests through 4 slots)."""
    cfg, eng, ecfg = setup
    plain, _ = _run(cfg, eng, ecfg, _requests(cfg, 12, 16))
    multi, b = _run(cfg, eng, ecfg, _requests(cfg, 12, 16), decode_steps=4,
                    admit_batch=2)
    assert plain == multi
    # pipelining actually engaged: multi-window dispatches outnumber syncs
    # is not guaranteed (last window always syncs), but windows ran
    assert b.timings["dispatch:decode_multi"][0] >= 2


def test_window_clamps_under_queue_pressure(setup):
    """Mixed max_new with a saturated queue: windows shrink to the smallest
    remaining headroom instead of collapsing to single-step; output exact."""
    cfg, eng, ecfg = setup
    max_new = [6, 16, 9, 16, 6, 16, 9, 16, 5, 16]
    plain, _ = _run(cfg, eng, ecfg, _requests(cfg, 10, max_new))
    multi, b = _run(cfg, eng, ecfg, _requests(cfg, 10, max_new), decode_steps=8)
    assert plain == multi
    assert b.timings.get("dispatch:decode_multi", [0])[0] >= 2


def test_mirror_tracks_device_lengths(setup):
    """lengths_h == device cache.lengths at completion of a mixed run
    (batched admits, clamped windows, finishes, slot reuse)."""
    cfg, eng, ecfg = setup
    _, b = _run(cfg, eng, ecfg, _requests(cfg, 9, [7, 12, 3, 9, 12, 5, 8, 12, 6]),
                decode_steps=4, admit_batch=3)
    np.testing.assert_array_equal(b.lengths_h, np.asarray(b.cache.lengths))


def test_mirror_tracks_device_lengths_chunked_and_spec(setup):
    """Mirror consistency across chunked prefill and speculative paths."""
    cfg, eng, ecfg = setup
    reqs = _requests(cfg, 6, 10)
    reqs[2].prompt_ids = synthetic_stream(cfg.vocab_size, 30, seed=7).astype(np.int32)
    b = ContinuousBatcher(ecfg, eng, num_slots=3, max_len=64, prefill_pad=8,
                          prefill_chunk=8, spec_k=2)
    for r in reqs:
        b.add_request(r)
    b.run()
    np.testing.assert_array_equal(b.lengths_h, np.asarray(b.cache.lengths))


def test_cancel_during_inflight_window(setup):
    """Cancel a request while its window is un-fetched: remaining requests
    finish with tokens identical to an uncancelled plain run's prefix."""
    cfg, eng, ecfg = setup
    reqs = _requests(cfg, 4, 32)
    b = ContinuousBatcher(ecfg, eng, num_slots=4, max_len=64, prefill_pad=8,
                          decode_steps=4)
    for r in reqs:
        b.add_request(r)
    b.step()  # admit + first window (left in flight: nothing can finish)
    assert b._inflight is not None
    assert b.cancel(2)
    done = b.run()
    assert {r.uid for r in done} == {0, 1, 2, 3}
    cancelled = [r for r in done if r.uid == 2][0]
    assert cancelled.cancelled
    plain, _ = _run(cfg, eng, ecfg, _requests(cfg, 4, 32))
    for r in done:
        if r.uid != 2:
            assert r.output_ids == plain[r.uid]


def test_eos_bounds_window_with_queue(setup):
    """EOS-capable requests under queue pressure cap the window at 4 steps
    (bounded admission delay, ADVICE r2) and output stays exact."""
    cfg, eng, ecfg = setup
    reqs = _requests(cfg, 8, 24)
    for r in reqs:
        r.eos_token_id = 1  # unlikely to fire with synthetic weights
    plain, _ = _run(cfg, eng, ecfg, [Request(uid=r.uid, prompt_ids=r.prompt_ids,
                                             max_new_tokens=r.max_new_tokens,
                                             eos_token_id=1) for r in reqs])
    multi, b = _run(cfg, eng, ecfg, reqs, decode_steps=16)
    assert plain == multi
