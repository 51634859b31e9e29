"""Paged KV cache: kernel goldens, device-fn equivalence vs the dense slot
cache, and PagedBatcher scheduling (sharing, preemption, accounting)."""

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
    init_batched_cache,
)
from dgq_tpu.serving.paged import (
    PagedBatcher,
    init_paged_cache,
    paged_decode_batched,
    paged_prefill,
)
from dgq_tpu.serving.scheduler import ContinuousBatcher, Request
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def paged_setup():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    return cfg, eng, ecfg


def test_paged_attention_kernel_matches_xla():
    """Pallas paged decode attention (interpret) == gather-dense golden,
    including unallocated (null-page) table entries and per-slot lengths."""
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
        q, kt_pool, v_pool, table, lengths, qs, ks, vs, interpret=True
    )
    out_x = int8_paged_decode_attention_xla(
        q, kt_pool, v_pool, table, lengths, qs, ks, vs
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-4)

    # and both equal the contiguous decode attention on the densified cache
    kt_d = kt_pool[table].transpose(0, 2, 3, 1, 4).reshape(B, HK, DH, NP * PS)
    v_d = v_pool[table].transpose(0, 2, 1, 3, 4).reshape(B, HK, NP * PS, DH)
    out_g = int8_decode_attention_xla(q, kt_d, v_d, lengths, qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_g), atol=1e-5)


def test_paged_prefill_decode_matches_dense(paged_setup):
    """paged_prefill + paged_decode_batched reproduce the dense slot cache's
    logits and appended KV exactly (same block stack, different storage)."""
    cfg, eng, ecfg = paged_setup
    prompt = synthetic_stream(cfg.vocab_size, 8, seed=3).astype(np.int32)
    ps, npg = 8, 4  # max_len 32

    dense = init_batched_cache(cfg, 3, 32)
    l_dense, dense = engine_prefill_slot(
        ecfg, eng, jnp.asarray(1, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32), dense,
    )

    paged = init_paged_cache(cfg, 3, num_pages=1 + 3 * npg, page_size=ps)
    pages = jnp.asarray([5, 9], jnp.int32)  # two pages cover the 16-padded prompt
    l_paged, paged = paged_prefill(
        ecfg, eng, jnp.asarray(1, jnp.int32),
        jnp.asarray(np.pad(prompt, (0, 8))), jnp.asarray(8, jnp.int32),
        pages, paged,
    )
    np.testing.assert_allclose(np.asarray(l_paged), np.asarray(l_dense), rtol=2e-4, atol=2e-4)
    # KV bytes identical: dense slot [.., :8] == pool page 5 (first 8 positions)
    np.testing.assert_array_equal(
        np.asarray(dense.k)[:, 1, :, :, :8], np.asarray(paged.kt)[:, 5, :, :, :8]
    )

    # one decode step, slots 1 active; table rows for idle slots stay null
    table = np.zeros((3, npg), np.int32)
    table[1, :2] = [5, 9]
    tok = int(jnp.argmax(l_dense))
    toks = jnp.asarray([0, tok, 0], jnp.int32)
    active = jnp.asarray([False, True, False])
    ld, dense = engine_decode_batched(ecfg, eng, toks, dense, active)
    lp, paged = paged_decode_batched(
        ecfg, eng, toks, paged, jnp.asarray(table), active
    )
    np.testing.assert_allclose(np.asarray(lp[1]), np.asarray(ld[1]), rtol=2e-4, atol=2e-4)
    assert int(paged.lengths[1]) == 9 and int(paged.lengths[0]) == 0
    # the appended token landed in page 9 at offset 0
    np.testing.assert_array_equal(
        np.asarray(dense.k)[:, 1, :, :, 8], np.asarray(paged.kt)[:, 9, :, :, 0]
    )


def test_paged_batcher_matches_continuous_batcher(paged_setup):
    """Greedy outputs from the paged batcher == the dense ContinuousBatcher
    on the same request stream (more requests than slots)."""
    cfg, eng, ecfg = paged_setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (6, 9, 4, 7)]

    dense = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=32, prefill_pad=8)
    for i, p in enumerate(prompts):
        dense.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
    want = {r.uid: r.output_ids for r in dense.run()}

    paged = PagedBatcher(ecfg, eng, num_slots=2, max_len=32, page_size=8)
    for i, p in enumerate(prompts):
        paged.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
    got = {r.uid: r.output_ids for r in paged.run()}
    assert got == want, (got, want)
    # all pages returned to the pool after the run
    assert paged.pages_in_use() == 0
    assert (paged.refs[1:] == 0).all()


def test_paged_decode_steps_multi_matches_single(paged_setup):
    cfg, eng, ecfg = paged_setup
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (5, 7, 3)]

    def run(**kw):
        b = PagedBatcher(ecfg, eng, num_slots=2, max_len=64, page_size=8, **kw)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=6))
        return {r.uid: r.output_ids for r in b.run()}

    assert run() == run(decode_steps=4)


def test_paged_prefix_sharing(paged_setup):
    """Prefix-admitted requests share the prefix's pool pages (refcount > 1,
    fewer pages than independent admission) and produce the same greedy
    outputs as admission without a registered prefix."""
    cfg, eng, ecfg = paged_setup
    rng = np.random.default_rng(5)
    prefix = rng.integers(0, cfg.vocab_size, size=12).astype(np.int32)  # 1.5 pages of 8
    tails = [rng.integers(0, cfg.vocab_size, size=n).astype(np.int32) for n in (5, 3)]
    prompts = [np.concatenate([prefix, t]) for t in tails]

    plain = PagedBatcher(ecfg, eng, num_slots=2, max_len=64, page_size=8)
    for i, p in enumerate(prompts):
        plain.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
    want = {r.uid: r.output_ids for r in plain.run()}

    shared = PagedBatcher(ecfg, eng, num_slots=2, max_len=64, page_size=8)
    shared.register_prefix(prefix)
    for i, p in enumerate(prompts):
        shared.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
    shared._admit()
    # mid-flight: the full prefix page (page of positions 0..7) is shared by
    # the registry + both slots
    assert shared.prefix_hits == 2
    first_page = shared._prefix[0]["pages"][0]
    assert shared.refs[first_page] == 3
    assert shared.table[0, 0] == first_page and shared.table[1, 0] == first_page
    # the partial tail page was copied per slot (no sharing of a page that
    # will be appended to)
    assert shared.table[0, 1] != shared.table[1, 1]
    got = {r.uid: r.output_ids for r in shared.run()}
    assert got == want, (got, want)
    # after the run only the pinned prefix pages remain in use
    assert shared.pages_in_use() == len(shared._prefix[0]["pages"])


def test_paged_preemption_recompute(paged_setup):
    """A pool too small for all active sequences preempts the youngest slot
    (recompute on re-admission) and still produces the dense batcher's
    outputs."""
    cfg, eng, ecfg = paged_setup
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (14, 10)]

    dense = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=8)
    for i, p in enumerate(prompts):
        dense.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=10))
    want = {r.uid: r.output_ids for r in dense.run()}

    # 5 usable pages of 8 = 40 tokens; at peak the two sequences need
    # ceil(24/8) + ceil(20/8) = 6 pages -> one preemption must occur
    tight = PagedBatcher(ecfg, eng, num_slots=2, max_len=64, page_size=8,
                         num_pages=6)
    for i, p in enumerate(prompts):
        tight.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=10))
    got = {r.uid: r.output_ids for r in tight.run()}
    assert tight.preemptions >= 1
    assert got == want, (got, want)
    assert tight.pages_in_use() == 0


def test_paged_batcher_memory_scales_with_tokens(paged_setup):
    """The pool admits more concurrent sequences than a dense cache of the
    same byte budget when sequences are short — the paged win."""
    cfg, eng, ecfg = paged_setup
    # dense equivalent of 4 slots x 64 tokens = 32 pages of 8; short prompts
    # (8 tokens + 4 generated) peak at 2 pages each -> 8 slots fit in half
    b = PagedBatcher(ecfg, eng, num_slots=8, max_len=64, page_size=8, num_pages=17)
    rng = np.random.default_rng(9)
    for i in range(8):
        b.add_request(Request(
            uid=i, prompt_ids=rng.integers(0, cfg.vocab_size, 8).astype(np.int32),
            max_new_tokens=4,
        ))
    b._admit()
    assert sum(r is not None for r in b.slots) == 8  # all admitted at once
    assert b.pages_in_use() == 8  # one page each, not 8 x (64/8)
    fin = b.run()
    assert len(fin) == 8 and all(len(r.output_ids) == 4 for r in fin)


def test_paged_sampling_and_validation(paged_setup):
    from dgq_tpu.serving.sampling import SamplingParams

    cfg, eng, ecfg = paged_setup
    b = PagedBatcher(ecfg, eng, num_slots=2, max_len=32, page_size=8)
    with pytest.raises(ValueError):
        b.add_request(Request(uid=0, prompt_ids=np.zeros((0,), np.int32), max_new_tokens=1))
    with pytest.raises(ValueError):
        b.add_request(Request(uid=0, prompt_ids=np.zeros((40,), np.int32), max_new_tokens=1))
    rng = np.random.default_rng(3)
    b.add_request(Request(uid=1, prompt_ids=rng.integers(0, cfg.vocab_size, 5).astype(np.int32),
                          max_new_tokens=3,
                          sampling=SamplingParams(temperature=1.0, top_k=10)))
    fin = b.run()
    assert len(fin) == 1 and len(fin[0].output_ids) == 3
    assert all(0 <= t < cfg.vocab_size for t in fin[0].output_ids)


def test_paged_batcher_recovers_from_device_failure(paged_setup, monkeypatch):
    """A transient device error mid-decode rebuilds the pool/allocator and
    re-prefills live slots from history; outputs match an undisturbed run
    (incl. shared-prefix pages re-registered)."""
    import dgq_tpu.serving.paged as paged_mod

    cfg, eng, ecfg = paged_setup
    rng = np.random.default_rng(31)
    prefix = rng.integers(0, cfg.vocab_size, size=10).astype(np.int32)
    prompts = [
        np.concatenate([prefix, rng.integers(0, cfg.vocab_size, size=4).astype(np.int32)]),
        rng.integers(0, cfg.vocab_size, size=7).astype(np.int32),
    ]

    def mk(**kw):
        b = PagedBatcher(ecfg, eng, num_slots=2, max_len=64, page_size=8, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p.copy(), max_new_tokens=6))
        return b

    want = {r.uid: r.output_ids for r in mk().run()}

    real = paged_mod.paged_decode_batched
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("FAILED_PRECONDITION: device rebooted (injected)")
        return real(*a, **kw)

    monkeypatch.setattr(paged_mod, "paged_decode_batched", flaky)
    b = mk()
    got = {r.uid: r.output_ids for r in b.run()}
    assert calls["n"] > 3
    assert b._recoveries == 1
    assert got == want, (got, want)
    assert b.pages_in_use() == len(b._prefix[0]["pages"])  # only pinned prefix left


def test_paged_chunked_prefill_matches_whole(paged_setup):
    """prefill_chunk in the paged batcher: long prompts advance one
    page-aligned chunk per step with lazily-allocated pages; outputs match
    the unchunked paged run and decode of other slots never stalls."""
    cfg, eng, ecfg = paged_setup
    rng = np.random.default_rng(41)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=4).astype(np.int32),   # short
        rng.integers(0, cfg.vocab_size, size=22).astype(np.int32),  # chunked
        rng.integers(0, cfg.vocab_size, size=5).astype(np.int32),
    ]

    def run(**kw):
        b = PagedBatcher(ecfg, eng, num_slots=3, max_len=64, page_size=8, **kw)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=5))
        return b, {r.uid: r.output_ids for r in b.run()}

    _, want = run()
    b, got = run(prefill_chunk=8)
    assert got == want, (got, want)
    assert b.pages_in_use() == 0

    # no head-of-line stall: with the long prompt mid-chunk, short slots
    # still decode every step
    b2 = PagedBatcher(ecfg, eng, num_slots=3, max_len=64, page_size=8,
                      prefill_chunk=8)
    b2.add_request(Request(uid=0, prompt_ids=prompts[0], max_new_tokens=8))
    b2.step()  # admit + first decode
    b2.add_request(Request(uid=1, prompt_ids=prompts[1], max_new_tokens=2))
    n0 = len(b2.slots[0].output_ids) if b2.slots[0] else 8
    b2.step()  # long prompt chunk 1 + decode of slot 0
    assert b2.pending  # still mid-prefill
    n1 = len(b2.slots[0].output_ids) if b2.slots[0] else 8
    assert n1 == n0 + 1  # slot 0 decoded during the chunk
    b2.run()


def test_paged_cancel_releases_pages(paged_setup):
    """Cancelling an active paged request returns its pages to the pool."""
    cfg, eng, ecfg = paged_setup
    b = PagedBatcher(ecfg, eng, num_slots=2, max_len=32, page_size=8)
    p = np.arange(6, dtype=np.int32) % cfg.vocab_size
    r0 = Request(uid=0, prompt_ids=p, max_new_tokens=20)
    b.add_request(r0)
    b.step()
    assert b.pages_in_use() > 0 and r0.output_ids
    assert b.cancel(0)
    assert r0.cancelled
    assert b.pages_in_use() == 0
    assert not b.has_work
    # pool fully usable afterwards
    b.add_request(Request(uid=1, prompt_ids=p, max_new_tokens=3))
    done = b.run()
    assert [r.uid for r in done if r.uid == 1]
    assert b.pages_in_use() == 0


def test_int4_paged_attention_kernel_matches_xla():
    """INT4 nibble-page Pallas decode attention (interpret) == the XLA
    golden on the UNPACKED pool — exercising null pages, per-slot lengths
    and the even/odd split-dot reassembly."""
    from dgq_tpu.ops.attention import (
        int4_paged_decode_attention,
        int8_paged_decode_attention_xla,
    )
    from dgq_tpu.ops.kv4 import pack_nibbles, unpack_nibbles

    rng = np.random.default_rng(7)
    B, H, HK, DH, PS, NP, P = 3, 8, 4, 128, 128, 4, 16
    q = jnp.asarray(rng.integers(-127, 128, (B, H, DH)), jnp.int8)
    # int4 codes in the pool, packed along Dh
    k4 = jnp.asarray(rng.integers(-7, 8, (P, HK, DH, PS)), jnp.int8)
    v4 = jnp.asarray(rng.integers(-7, 8, (P, HK, PS, DH)), jnp.int8)
    kt_pool = pack_nibbles(k4, axis=2)   # (P, HK, DH//2, PS)
    v_pool = pack_nibbles(v4, axis=-1)   # (P, HK, PS, DH//2)
    table = jnp.asarray([[3, 7, 0, 0], [1, 2, 9, 0], [11, 4, 5, 6]], jnp.int32)
    lengths = jnp.asarray([130, 300, 512], jnp.int32)
    qs, ks, vs = jnp.float32(0.01), jnp.float32(0.12), jnp.float32(0.34)

    out_k = int4_paged_decode_attention(
        q, kt_pool, v_pool, table, lengths, qs, ks, vs, interpret=True
    )
    out_x = int8_paged_decode_attention_xla(
        q, unpack_nibbles(kt_pool, axis=2), unpack_nibbles(v_pool, axis=-1),
        table, lengths, qs, ks, vs,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-4, atol=1e-4)


def test_kv4_paged_kernel_path_matches_xla_path(paged_setup):
    """PagedBatcher(kv_bits=4) on the kernel path (interpret) emits exactly
    the XLA fallback path's greedy tokens."""
    from dgq_tpu.serving.paged import PagedBatcher
    from dgq_tpu.serving.scheduler import Request

    cfg, eng, _ = paged_setup
    rng = np.random.default_rng(8)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (6, 9)]

    def run(use_kernel):
        e4 = EngineConfig(cfg=cfg, use_kernel=use_kernel,
                          interpret=use_kernel, kv_bits=4,
                          bm_prefill=128, bm_decode=128)
        b = PagedBatcher(e4, eng, num_slots=2, max_len=32, page_size=8,
                         decode_steps=2)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
        return {r.uid: r.output_ids for r in b.run()}

    assert run(True) == run(False)
