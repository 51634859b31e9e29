"""Pipeline parallelism: pp (and pp x tp) engine forward vs the dense engine.

Runs on the virtual 8-CPU mesh (conftest).  The correctness contract is the
sharding spec (SURVEY §2.3): pipeline-parallel prefill and decode must
reproduce the single-device engine's logits and cache.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.models.engine import EngineConfig, engine_forward, init_kv_cache
from dgq_tpu.models.llama import tiny_llama_config
from dgq_tpu.models.synthetic import build_llama_engine
from dgq_tpu.parallel.pipeline import (
    make_pp_mesh,
    pp_engine_forward,
    pp_shard_engine_params,
    pp_shard_kv_cache,
)

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


@pytest.fixture(scope="module")
def pp_setup():
    # hidden 512 keeps row-parallel K/tp=2 span-aligned (2*groupsize=256);
    # 4 layers so pp in {2, 4} divides L
    cfg = tiny_llama_config(
        hidden_size=512, intermediate_size=1024, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=4,
    )
    eng = build_llama_engine(cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    return cfg, eng, ecfg


def _dense_reference(cfg, eng, ecfg, ids, max_len):
    cache = init_kv_cache(cfg, ids.shape[0], max_len)
    logits, cache = engine_forward(ecfg, eng, ids, cache)
    nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    logits2, cache = engine_forward(ecfg, eng, nxt, cache)
    return logits, logits2, cache


@pytest.mark.parametrize("pp,tp,M", [(4, 1, 4), (2, 2, 2), (2, 1, 4)])
def test_pp_forward_matches_dense(pp_setup, pp, tp, M):
    cfg, eng, ecfg = pp_setup
    B, S, max_len = 4, 8, 32
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)

    want1, want2, want_cache = _dense_reference(cfg, eng, ecfg, ids, max_len)

    mesh = make_pp_mesh(pp, tp)
    eng_sh = pp_shard_engine_params(eng, mesh)
    cache = pp_shard_kv_cache(init_kv_cache(cfg, B, max_len), mesh)

    logits, cache = pp_engine_forward(ecfg, eng_sh, ids, cache, mesh, microbatches=M)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want1),
                               rtol=2e-4, atol=2e-4)
    assert int(cache.length) == S

    # decode step continues from the pipeline-parallel cache
    nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    logits2, cache = pp_engine_forward(ecfg, eng_sh, nxt, cache, mesh, microbatches=M)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(want2),
                               rtol=2e-4, atol=2e-4)
    assert int(cache.length) == S + 1

    # the KV cache matches the dense engine's (pp shards hold real state)
    np.testing.assert_array_equal(np.asarray(cache.k), np.asarray(want_cache.k))
    np.testing.assert_array_equal(np.asarray(cache.v), np.asarray(want_cache.v))


def test_pp_validation(pp_setup):
    cfg, eng, ecfg = pp_setup
    mesh = make_pp_mesh(3, 1)  # 4 layers % 3 != 0
    with pytest.raises(ValueError, match="not divisible by pp"):
        pp_shard_engine_params(eng, mesh)

    mesh = make_pp_mesh(2, 1)
    eng_sh = pp_shard_engine_params(eng, mesh)
    cache = pp_shard_kv_cache(init_kv_cache(cfg, 4, 32), mesh)
    ids = jnp.zeros((3, 4), jnp.int32)  # 3 % microbatches(2) != 0
    with pytest.raises(ValueError, match="not divisible by microbatches"):
        pp_engine_forward(ecfg, eng_sh, ids, cache, mesh, microbatches=2)


def test_pp_continuous_batching_matches_dense(pp_setup):
    """ContinuousBatcher(fns=pp_serving_fns(mesh)) emits exactly the dense
    batcher's greedy tokens — with chunked prefill, multi-step decode, and
    prefix caching engaged."""
    from dgq_tpu.parallel.pp_serving import pp_serving_fns
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    cfg, eng, ecfg = pp_setup
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (6, 9, 21, 4)]
    prefix = prompts[2][:8].copy()
    prompts.append(np.concatenate([prefix, [7, 7, 2]]).astype(np.int32))

    def run(**kw):
        b = ContinuousBatcher(ecfg, kw.pop("params", eng), num_slots=2,
                              max_len=32, prefill_pad=8, prefill_chunk=8,
                              decode_steps=2, admit_batch=2, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
        done = b.run()
        return {r.uid: r.output_ids for r in done}, b.prefix_hits

    want, want_hits = run()

    mesh = make_pp_mesh(2, 2)
    eng_pp = pp_shard_engine_params(eng, mesh)
    got, got_hits = run(params=eng_pp, fns=pp_serving_fns(mesh))
    assert got == want, (got, want)
    assert got_hits == want_hits > 0


def test_pp_speculative_serving_matches_dense(pp_setup):
    """spec_k>0 under pp_serving_fns: host-loop drafts + pipelined
    verification emit exactly the dense spec batcher's tokens."""
    from dgq_tpu.parallel.pp_serving import pp_serving_fns
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    cfg, eng, ecfg = pp_setup
    # repetitive prompt so prompt-lookup drafts actually accept
    prompts = [np.asarray([3, 5, 3, 5, 3, 5], np.int32),
               np.asarray([7, 7, 2, 7, 7, 2], np.int32)]

    def run(**kw):
        b = ContinuousBatcher(ecfg, kw.pop("params", eng), num_slots=2,
                              max_len=32, prefill_pad=8, spec_k=3,
                              decode_steps=2, **kw)  # engages spec_decode_multi
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=6))
        return {r.uid: r.output_ids for r in b.run()}, dict(b.spec_stats)

    want, want_stats = run()
    mesh = make_pp_mesh(2, 2)
    got, got_stats = run(params=pp_shard_engine_params(eng, mesh),
                         fns=pp_serving_fns(mesh))
    assert got == want, (got, want)
    assert got_stats == want_stats and want_stats["steps"] > 0


def test_pp_paged_batcher_matches_dense(pp_setup):
    """PagedBatcher(fns=pp_paged_serving_fns(mesh)): layer-sharded page
    pool emits exactly the dense paged batcher's tokens — with prefix
    sharing, chunked prefill and multi-step decode engaged."""
    from dgq_tpu.parallel.pp_serving import pp_paged_serving_fns
    from dgq_tpu.serving.paged import PagedBatcher
    from dgq_tpu.serving.scheduler import Request

    cfg, eng, ecfg = pp_setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (6, 9, 21, 4)]
    prefix = prompts[2][:8].copy()
    prompts.append(np.concatenate([prefix, [7, 7, 2]]).astype(np.int32))

    def run(**kw):
        b = PagedBatcher(ecfg, kw.pop("params", eng), num_slots=2,
                         max_len=32, page_size=8, prefill_chunk=8,
                         decode_steps=2, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=4))
        done = b.run()
        used = b.pages_in_use()  # only the registered prefix template's pages
        return {r.uid: r.output_ids for r in done}, (b.prefix_hits, used)

    want, want_hits = run()
    mesh = make_pp_mesh(2, 2)
    got, got_hits = run(params=pp_shard_engine_params(eng, mesh),
                        fns=pp_paged_serving_fns(mesh))
    assert got == want, (got, want)
    assert got_hits == want_hits and want_hits[0] > 0


@pytest.mark.parametrize("kv_heads", [4, 2])
def test_sp_ring_prefill_matches_dense(kv_heads):
    """Sequence-parallel ring-attention prefill: logits and the INT8 KV
    cache match the dense engine exactly; decode continues from the
    gathered cache."""
    from dgq_tpu.parallel.sequence import (
        gather_sp_cache,
        make_sp_mesh,
        sp_engine_prefill,
    )

    cfg = tiny_llama_config(
        hidden_size=512, intermediate_size=1024, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=kv_heads,
    )
    eng = build_llama_engine(cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    B, S, max_len = 2, 16, 32
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)

    want, want_cache = engine_forward(ecfg, eng, ids, init_kv_cache(cfg, B, S))

    mesh = make_sp_mesh(4)
    logits, cache = sp_engine_prefill(ecfg, eng, ids, mesh)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # INT8 KV bit-identical (quantization points are shared code)
    np.testing.assert_array_equal(np.asarray(cache.k), np.asarray(want_cache.k))
    np.testing.assert_array_equal(np.asarray(cache.v), np.asarray(want_cache.v))
    assert int(cache.length) == S

    # decode handoff: gather to a max_len cache, one dense decode step
    dense_cache = init_kv_cache(cfg, B, max_len)
    dense_cache = dense_cache._replace(
        k=dense_cache.k.at[..., :S].set(jnp.asarray(np.asarray(want_cache.k))),
        v=dense_cache.v.at[:, :, :, :S, :].set(jnp.asarray(np.asarray(want_cache.v))),
        length=jnp.asarray(S, jnp.int32),
    )
    nxt = jnp.argmax(want[:, -1:, :], axis=-1).astype(jnp.int32)
    want2, _ = engine_forward(ecfg, eng, nxt, dense_cache)

    got_cache = gather_sp_cache(cache, max_len=max_len)
    got2, _ = engine_forward(ecfg, eng, nxt, got_cache)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-4, atol=2e-4)


def test_sp_validation():
    from dgq_tpu.parallel.sequence import make_sp_mesh, sp_engine_prefill

    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=4)
    eng = build_llama_engine(cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    mesh = make_sp_mesh(4)
    ids = jnp.zeros((1, 10), jnp.int32)  # 10 % 4 != 0
    with pytest.raises(ValueError, match="not divisible by sp"):
        sp_engine_prefill(ecfg, eng, ids, mesh)


def test_sp_tp_composed_prefill_matches_dense(pp_setup):
    """Ring-attention sequence parallelism composed with tensor
    parallelism on an ('sp','tp') mesh."""
    from dgq_tpu.parallel.sequence import make_sp_mesh, sp_engine_prefill
    from dgq_tpu.parallel.sharded_engine import shard_engine_params

    cfg, eng, ecfg = pp_setup
    B, S = 2, 16
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    want, want_cache = engine_forward(ecfg, eng, ids, init_kv_cache(cfg, B, S))

    mesh = make_sp_mesh(2, tp=2)
    eng_sh = shard_engine_params(eng, mesh)
    logits, cache = sp_engine_prefill(ecfg, eng_sh, ids, mesh)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cache.k), np.asarray(want_cache.k))


# ---- kernel path under pp / sp (VERDICT r2 #3) -----------------------------
# A real pod runs pp x tp WITH the Pallas kernels; these pin that exact
# composition (interpret mode on the virtual mesh executes the same kernel
# logic the TPU runs compiled).


@pytest.fixture(scope="module")
def kernel_ecfg(pp_setup):
    cfg, eng, _ = pp_setup
    return EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                        bm_prefill=128, bm_decode=128)


def test_pp_forward_kernel_path(pp_setup, kernel_ecfg):
    """pp=2 x tp=2 engine forward on the KERNEL path: prefill + decode
    allclose vs the unsharded kernel engine."""
    cfg, eng, _ = pp_setup
    ecfg = kernel_ecfg
    B, S, max_len = 4, 8, 32
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    want1, want2, _ = _dense_reference(cfg, eng, ecfg, ids, max_len)

    mesh = make_pp_mesh(2, 2)
    eng_sh = pp_shard_engine_params(eng, mesh)
    cache = pp_shard_kv_cache(init_kv_cache(cfg, B, max_len), mesh)
    logits, cache = pp_engine_forward(ecfg, eng_sh, ids, cache, mesh)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want1),
                               rtol=2e-3, atol=2e-3)
    nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    logits2, cache = pp_engine_forward(ecfg, eng_sh, nxt, cache, mesh)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(want2),
                               rtol=2e-3, atol=2e-3)


def test_pp_serving_kernel_path(pp_setup, kernel_ecfg):
    """The pipelined serving fns on the KERNEL path emit exactly the dense
    kernel batcher's greedy tokens."""
    from dgq_tpu.parallel.pp_serving import pp_serving_fns
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    cfg, eng, _ = pp_setup
    ecfg = kernel_ecfg
    rng = np.random.default_rng(12)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (6, 9)]

    def run(**kw):
        b = ContinuousBatcher(ecfg, kw.pop("params", eng), num_slots=2,
                              max_len=32, prefill_pad=8, decode_steps=2, **kw)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=3))
        return {r.uid: r.output_ids for r in b.run()}

    want = run()
    mesh = make_pp_mesh(2, 2)
    got = run(params=pp_shard_engine_params(eng, mesh), fns=pp_serving_fns(mesh))
    assert got == want, (got, want)


def test_pp_paged_serving_kernel_path(pp_setup, kernel_ecfg):
    """The pipelined PAGED serving fns on the KERNEL path emit exactly the
    dense paged kernel batcher's tokens."""
    from dgq_tpu.parallel.pp_serving import pp_paged_serving_fns
    from dgq_tpu.serving.paged import PagedBatcher
    from dgq_tpu.serving.scheduler import Request

    cfg, eng, _ = pp_setup
    ecfg = kernel_ecfg
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, cfg.vocab_size, size=ln).astype(np.int32)
               for ln in (6, 9)]

    def run(**kw):
        b = PagedBatcher(ecfg, kw.pop("params", eng), num_slots=2,
                         max_len=32, page_size=8, decode_steps=2, **kw)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=3))
        return {r.uid: r.output_ids for r in b.run()}

    want = run()
    mesh = make_pp_mesh(2, 2)
    got = run(params=pp_shard_engine_params(eng, mesh),
              fns=pp_paged_serving_fns(mesh))
    assert got == want, (got, want)


def test_sp_kernel_path(pp_setup, kernel_ecfg):
    """Ring-attention sequence-parallel prefill on the KERNEL path: logits
    allclose and INT8 KV bit-identical vs the unsharded kernel engine."""
    from dgq_tpu.parallel.sequence import make_sp_mesh, sp_engine_prefill

    cfg, eng, _ = pp_setup
    ecfg = kernel_ecfg
    B, S = 2, 16
    rng = np.random.default_rng(14)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    want, want_cache = engine_forward(ecfg, eng, ids, init_kv_cache(cfg, B, S))

    mesh = make_sp_mesh(4)
    logits, cache = sp_engine_prefill(ecfg, eng, ids, mesh)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(cache.k), np.asarray(want_cache.k))
    np.testing.assert_array_equal(np.asarray(cache.v), np.asarray(want_cache.v))
