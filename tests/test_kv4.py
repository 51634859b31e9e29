"""INT4 KV-cache mode (EngineConfig.kv_bits=4, ops/kv4.py).

Half the cache memory of the reference-parity INT8 KV; quality-gated (the
int4 grid loses precision by design) and exercised through prefill, decode,
generate and the continuous batcher.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.ops.kv4 import pack_nibbles, unpack_nibbles
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.utils.datautils import synthetic_stream


def test_nibble_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-8, 8, (2, 4, 6, 8)), jnp.int8)
    for ax in (-1, 2, 1):
        u = unpack_nibbles(pack_nibbles(x, axis=ax), axis=ax)
        np.testing.assert_array_equal(np.asarray(u), np.asarray(x))


@pytest.fixture(scope="module")
def kv4_setup():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    return cfg, from_ptq(res.params, res.kv_scales, cfg)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_kv4_engine_quality_and_memory(kv4_setup):
    cfg, eng = kv4_setup
    B, S, max_len = 2, 16, 32
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)

    e8 = EngineConfig(cfg=cfg, use_kernel=False)
    e4 = EngineConfig(cfg=cfg, use_kernel=False, kv_bits=4)
    c8 = init_kv_cache(cfg, B, max_len)
    c4 = init_kv_cache(cfg, B, max_len, kv_bits=4)
    assert c4.k.nbytes * 2 == c8.k.nbytes and c4.v.nbytes * 2 == c8.v.nbytes

    l8, c8 = engine_forward(e8, eng, ids, c8)
    l4, c4 = engine_forward(e4, eng, ids, c4)
    # random tiny models are the worst case for int4 KV (attention over
    # random K/V has no peaked structure to hide the grid error); real
    # models land much closer.  ~0.97 observed here; gate at 0.95.
    assert _cos(l8, l4) > 0.95, _cos(l8, l4)

    # decode continues from the packed cache with the same quality
    n8 = jnp.argmax(l8[:, -1:, :], -1).astype(jnp.int32)
    d8, _ = engine_forward(e8, eng, n8, c8)
    d4, _ = engine_forward(e4, eng, n8, c4)
    assert _cos(d8, d4) > 0.95, _cos(d8, d4)


def test_kv4_generate_and_batcher_consistent(kv4_setup):
    """generate() and the ContinuousBatcher agree under kv_bits=4 (the
    whole serving path runs on the packed cache)."""
    from dgq_tpu.models.engine import generate
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    cfg, eng = kv4_setup
    e4 = EngineConfig(cfg=cfg, use_kernel=False, kv_bits=4)
    prompt = np.asarray([3, 5, 3, 5, 3, 5], np.int32)

    toks = generate(e4, eng, jnp.asarray(prompt[None, :]), 6, 64)
    want = [int(t) for t in np.asarray(toks)[0]]  # generate returns new tokens

    b = ContinuousBatcher(e4, eng, num_slots=2, max_len=64, prefill_pad=16)
    assert b.cache.k.shape[3] == cfg.head_dim // 2  # packed pool
    b.add_request(Request(uid=0, prompt_ids=prompt, max_new_tokens=6))
    got = b.run()[0].output_ids
    assert got == want, (got, want)

    # speculative verification also rides the packed cache
    b2 = ContinuousBatcher(e4, eng, num_slots=2, max_len=64, prefill_pad=16,
                           spec_k=3)
    b2.add_request(Request(uid=0, prompt_ids=prompt, max_new_tokens=6))
    got2 = b2.run()[0].output_ids
    assert got2 == want, (got2, want)


def test_kv4_paged_matches_dense_kv4(kv4_setup):
    """kv_bits=4 composes with the page pool (VERDICT r2 #4): nibble pages
    emit exactly the dense kv4 batcher's greedy tokens — with prefix
    sharing and multi-step decode engaged — and the pool really is half
    the INT8 pool's bytes per token."""
    from dgq_tpu.serving.paged import PagedBatcher
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    cfg, eng = kv4_setup
    e4 = EngineConfig(cfg=cfg, use_kernel=False, kv_bits=4)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (6, 9, 12, 4)]
    prefix = prompts[2][:8].copy()
    prompts.append(np.concatenate([prefix, [7, 7, 2]]).astype(np.int32))

    def reqs():
        return [Request(uid=i, prompt_ids=p, max_new_tokens=4)
                for i, p in enumerate(prompts)]

    dense = ContinuousBatcher(e4, eng, num_slots=2, max_len=32, prefill_pad=8,
                              decode_steps=2)
    for r in reqs():
        dense.add_request(r)
    want = {r.uid: r.output_ids for r in dense.run()}

    paged = PagedBatcher(e4, eng, num_slots=2, max_len=32, page_size=8,
                         decode_steps=2)
    paged.register_prefix(prefix)
    for r in reqs():
        paged.add_request(r)
    got = {r.uid: r.output_ids for r in paged.run()}
    assert got == want, (got, want)
    assert paged.prefix_hits > 0
    np.testing.assert_array_equal(paged.lengths_h, np.asarray(paged.cache.lengths))

    # memory stat: nibble pages are half the INT8 pool bytes per token
    paged8 = PagedBatcher(EngineConfig(cfg=cfg, use_kernel=False), eng,
                          num_slots=2, max_len=32, page_size=8)
    assert paged.kv_bytes_per_token * 2 == paged8.kv_bytes_per_token
    m = paged.metrics()
    assert m["kv_bits"] == 4
    assert m["tokens_per_hbm_gib"] == 2 * paged8.metrics()["tokens_per_hbm_gib"]


def test_kv4_paged_preempt_and_recover(kv4_setup):
    """Recompute preemption and device-failure recovery work on nibble
    pages: a pool too small for both requests preempts and still finishes
    with the unconstrained batcher's tokens."""
    from dgq_tpu.serving.paged import PagedBatcher
    from dgq_tpu.serving.scheduler import Request

    cfg, eng = kv4_setup
    e4 = EngineConfig(cfg=cfg, use_kernel=False, kv_bits=4)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (9, 12)]

    def run(num_pages):
        b = PagedBatcher(e4, eng, num_slots=2, max_len=32, page_size=8,
                         num_pages=num_pages)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=6))
        out = {r.uid: r.output_ids for r in b.run()}
        return out, b

    want, _ = run(None)  # dense-equivalent pool: no pressure
    got, b = run(5)      # 4 usable pages: forces preemption
    assert got == want, (got, want)
    assert b.preemptions > 0
