"""Cross-path exactness contracts, parametrized over quant_pv (VERDICT r4
#1): a quant_pv default flip must never again silently break the
paged/prefix/chunked-prefill equalities.

The rule under test: quant_pv applies ONE path-invariant quantization
(int8 exp-weight codes against the GLOBAL row max,
ops/attention._quantize_exp) to decode/verify windows on INT8-KV paths;
prefill windows are always fp p @ V whatever their chunking; INT4-KV paths
are fp everywhere.  Consequently every dispatch/storage variant — dense
slot cache, paged pool, prefix-cached, chunked-prefill, speculative —
emits identical tokens at either flag value.
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
def tiny_engine():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(),
                       wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    return cfg, from_ptq(res.params, res.kv_scales, cfg)


def _batch_run(cfg, eng, prompts, max_new, quant_pv, **kw):
    ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=quant_pv)
    b = ContinuousBatcher(ecfg, eng, num_slots=3, max_len=64,
                          prefill_pad=8, **kw)
    for i, p in enumerate(prompts):
        b.add_request(Request(uid=i, prompt_ids=np.asarray(p, np.int32),
                              max_new_tokens=max_new))
    return {r.uid: list(r.output_ids) for r in b.run()}


SYS = [9, 4, 2, 7, 1, 8, 3, 6]


@pytest.mark.parametrize("quant_pv", [False, True])
def test_paged_decode_matches_dense(tiny_engine, quant_pv):
    """paged_decode_batched == engine_decode_batched logits at BOTH flag
    values (the round-4 break: paged quantized, dense serving did not)."""
    from dgq_tpu.serving.batch_engine import (
        engine_decode_batched, engine_prefill_slot, init_batched_cache)
    from dgq_tpu.serving.paged import (
        init_paged_cache, paged_decode_batched, paged_prefill)

    cfg, eng = tiny_engine
    ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=quant_pv)
    prompt = synthetic_stream(cfg.vocab_size, 8, seed=3).astype(np.int32)
    ps, npg = 8, 4

    dense = init_batched_cache(cfg, 3, 32)
    l_dense, dense = engine_prefill_slot(
        ecfg, eng, jnp.asarray(1, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32), dense)

    paged = init_paged_cache(cfg, 3, num_pages=1 + 3 * npg, page_size=ps)
    pages = jnp.asarray([5, 9], jnp.int32)
    l_paged, paged = paged_prefill(
        ecfg, eng, jnp.asarray(1, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32),
        pages, paged)
    np.testing.assert_allclose(np.asarray(l_paged), np.asarray(l_dense),
                               rtol=2e-4, atol=2e-4)

    table = np.zeros((3, npg), np.int32)
    table[1, :2] = [5, 9]
    tok = int(jnp.argmax(l_dense))
    toks = jnp.asarray([0, tok, 0], jnp.int32)
    active = jnp.asarray([False, True, False])
    for _ in range(3):  # a few decode steps so quant_pv decode numerics bite
        ld, dense = engine_decode_batched(ecfg, eng, toks, dense, active)
        lp, paged = paged_decode_batched(ecfg, eng, toks, paged,
                                         jnp.asarray(table), active)
        np.testing.assert_allclose(np.asarray(lp[1]), np.asarray(ld[1]),
                                   rtol=2e-4, atol=2e-4)
        assert int(jnp.argmax(lp[1])) == int(jnp.argmax(ld[1]))
        toks = jnp.asarray([0, int(jnp.argmax(ld[1])), 0], jnp.int32)


@pytest.mark.parametrize("quant_pv", [False, True])
def test_prefix_cache_matches_plain(tiny_engine, quant_pv):
    cfg, eng = tiny_engine
    prompts = [SYS + [3, 5, 3, 5], SYS + [7, 7, 2], [1, 2, 3, 4]]
    plain = _batch_run(cfg, eng, prompts, 10, quant_pv)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=quant_pv)
    b = ContinuousBatcher(ecfg, eng, num_slots=3, max_len=64, prefill_pad=8)
    b.register_prefix(SYS)
    for i, p in enumerate(prompts):
        b.add_request(Request(uid=i, prompt_ids=np.asarray(p, np.int32),
                              max_new_tokens=10))
    cached = {r.uid: list(r.output_ids) for r in b.run()}
    assert plain == cached
    assert b.prefix_hits == 2


@pytest.mark.parametrize("quant_pv", [False, True])
def test_chunked_prefill_matches_whole(tiny_engine, quant_pv):
    cfg, eng = tiny_engine
    long_prompt = list(synthetic_stream(cfg.vocab_size, 24, seed=11).astype(int))
    whole = _batch_run(cfg, eng, [long_prompt], 8, quant_pv)
    chunked = _batch_run(cfg, eng, [long_prompt], 8, quant_pv,
                         prefill_chunk=8)
    assert whole == chunked


@pytest.mark.parametrize("quant_pv", [False, True])
def test_speculative_bitwise_greedy(tiny_engine, quant_pv):
    """Spec decode output == plain greedy output bitwise at both flag
    values (verify windows quantize p @ V exactly like decode steps)."""
    from dgq_tpu.models.engine import generate, init_kv_cache
    from dgq_tpu.serving.speculative import generate_speculative

    cfg, eng = tiny_engine
    ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=quant_pv)
    prompt = jnp.asarray([[9, 4, 2, 7, 9, 4, 2, 7, 9, 4]], jnp.int32)
    ref = generate(ecfg, eng, prompt, 12, 64)
    out, stats = generate_speculative(ecfg, eng, prompt, 12, 64, spec_k=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


@pytest.mark.parametrize("quant_pv", [False, True])
def test_serving_spec_matches_plain_serving(tiny_engine, quant_pv):
    """ContinuousBatcher spec_k>0 greedy == spec_k=0 greedy at both flag
    values (batched verification uses the same quantization rule as
    batched decode)."""
    cfg, eng = tiny_engine
    prompts = [SYS + [3, 5, 3, 5], [1, 2, 3, 4, 1, 2, 3, 4]]
    plain = _batch_run(cfg, eng, prompts, 10, quant_pv)
    spec = _batch_run(cfg, eng, prompts, 10, quant_pv, spec_k=3)
    assert plain == spec


def test_paged_kernel_quant_pv_matches_xla_golden():
    """Interpret-mode paged kernel with quant_pv == gather-dense golden
    with quant_pv (global-row-max codes through the page table)."""
    from dgq_tpu.ops.attention import (
        int8_decode_attention_xla,
        int8_paged_decode_attention,
        int8_paged_decode_attention_xla,
    )

    rng = np.random.default_rng(0)
    B, H, HK, DH, PS, NP, P = 3, 8, 4, 128, 128, 4, 16
    q = jnp.asarray(rng.integers(-127, 128, (B, H, DH)), jnp.int8)
    kt_pool = jnp.asarray(rng.integers(-127, 128, (P, HK, DH, PS)), jnp.int8)
    v_pool = jnp.asarray(rng.integers(-127, 128, (P, HK, PS, DH)), jnp.int8)
    table = jnp.asarray([[3, 7, 0, 0], [1, 2, 9, 0], [11, 4, 5, 6]], jnp.int32)
    lengths = jnp.asarray([130, 300, 512], jnp.int32)
    qs, ks, vs = jnp.float32(0.01), jnp.float32(0.02), jnp.float32(0.03)

    out_k = int8_paged_decode_attention(
        q, kt_pool, v_pool, table, lengths, qs, ks, vs, interpret=True,
        quant_pv=True)
    out_x = int8_paged_decode_attention_xla(
        q, kt_pool, v_pool, table, lengths, qs, ks, vs, quant_pv=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-4)

    # and both equal the dense whole-cache rule on the densified cache
    kt_d = kt_pool[table].transpose(0, 2, 3, 1, 4).reshape(B, HK, DH, NP * PS)
    v_d = v_pool[table].transpose(0, 2, 1, 3, 4).reshape(B, HK, NP * PS, DH)
    out_g = int8_decode_attention_xla(q, kt_d, v_d, lengths, qs, ks, vs,
                                      quant_pv=True)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_g), atol=1e-5)


@pytest.mark.parametrize("kv_bits", [8, 4])
def test_kv4_paths_stay_fp_and_consistent(tiny_engine, kv_bits):
    """INT4-KV scoping: with quant_pv=True, kv4 dense and kv4 paged decode
    still agree (both fp p @ V — quant_pv is kv8-scoped)."""
    from dgq_tpu.serving.batch_engine import (
        engine_decode_batched, engine_prefill_slot, init_batched_cache)
    from dgq_tpu.serving.paged import (
        init_paged_cache, paged_decode_batched, paged_prefill)

    cfg, eng = tiny_engine
    ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=True,
                        kv_bits=kv_bits)
    prompt = synthetic_stream(cfg.vocab_size, 8, seed=5).astype(np.int32)
    ps, npg = 8, 4

    dense = init_batched_cache(cfg, 3, 32, kv_bits=kv_bits)
    l_dense, dense = engine_prefill_slot(
        ecfg, eng, jnp.asarray(1, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32), dense)
    paged = init_paged_cache(cfg, 3, num_pages=1 + 3 * npg, page_size=ps,
                             kv_bits=kv_bits)
    pages = jnp.asarray([5, 9], jnp.int32)
    l_paged, paged = paged_prefill(
        ecfg, eng, jnp.asarray(1, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32),
        pages, paged)
    np.testing.assert_allclose(np.asarray(l_paged), np.asarray(l_dense),
                               rtol=2e-4, atol=2e-4)

    table = np.zeros((3, npg), np.int32)
    table[1, :2] = [5, 9]
    tok = int(jnp.argmax(l_dense))
    toks = jnp.asarray([0, tok, 0], jnp.int32)
    active = jnp.asarray([False, True, False])
    ld, dense = engine_decode_batched(ecfg, eng, toks, dense, active)
    lp, paged = paged_decode_batched(ecfg, eng, toks, paged,
                                     jnp.asarray(table), active)
    np.testing.assert_allclose(np.asarray(lp[1]), np.asarray(ld[1]),
                               rtol=2e-4, atol=2e-4)
