"""Multi-device sharding tests on the virtual 8-device CPU mesh — the
fake-cluster capability the reference lacks (SURVEY §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.parallel.mesh import make_mesh
from dgq_tpu.parallel.sharded_engine import (
    shard_engine_params,
    shard_kv_cache,
    sharded_engine_forward,
)
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def sharded_setup():
    # row-parallel K-sharding must align to packed spans (2*groupsize=256
    # logical rows), so K/tp must be a multiple of 256: hidden 512, tp 2
    cfg = tiny_llama_config(
        hidden_size=512, intermediate_size=1024, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    return cfg, eng


def test_mesh_shapes():
    mesh = make_mesh(dp=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dp", "tp")


def test_tp_dp_engine_matches_single_device(sharded_setup):
    cfg, eng = sharded_setup
    mesh = make_mesh(dp=2, tp=2)  # 4 kv heads over tp=2, batch 2 over dp=2

    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 16, seed=11).reshape(2, 16))
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)

    cache0 = init_kv_cache(cfg, 2, 32)
    want, want_cache = engine_forward(ecfg, eng, ids, cache0)

    eng_sh = shard_engine_params(eng, mesh)
    cache_sh = shard_kv_cache(init_kv_cache(cfg, 2, 32), mesh)
    got, got_cache = sharded_engine_forward(ecfg, eng_sh, ids, cache_sh, mesh)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(got_cache.k), np.asarray(want_cache.k))
    assert int(got_cache.length) == 16


def test_sharded_decode_after_prefill(sharded_setup):
    cfg, eng = sharded_setup
    mesh = make_mesh(dp=2, tp=2)
    eng_sh = shard_engine_params(eng, mesh)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 8, seed=13).reshape(2, 8))

    cache = shard_kv_cache(init_kv_cache(cfg, 2, 16), mesh)
    logits, cache = sharded_engine_forward(ecfg, eng_sh, ids, cache, mesh)
    nxt = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    logits2, cache = sharded_engine_forward(ecfg, eng_sh, nxt, cache, mesh)
    assert logits2.shape == (2, 1, cfg.vocab_size)
    assert int(cache.length) == 9
    assert bool(jnp.isfinite(logits2).all())


def test_param_placement_is_sharded(sharded_setup):
    cfg, eng = sharded_setup
    mesh = make_mesh(dp=2, tp=2)
    eng_sh = shard_engine_params(eng, mesh)
    # column-parallel fused qkv shards its N axis over tp devices
    # (rp-only storage: the packed weight is the rowpair copy)
    qw = eng_sh.layers.qkv_proj.qw_rp
    shard_shape = qw.sharding.shard_shape(qw.shape)
    assert shard_shape[2] == qw.shape[2] // 2
    # row-parallel down_proj shards K//2
    dw = eng_sh.layers.down_proj.qw_rp
    shard_shape = dw.sharding.shard_shape(dw.shape)
    assert shard_shape[1] == dw.shape[1] // 2
    # per-rank local cs_fold rows shard over tp (exactness contract)
    csf = eng_sh.layers.down_proj.cs_fold
    assert csf.ndim == 3 and csf.sharding.shard_shape(csf.shape)[1] == 1


def test_tp_kernel_path_matches_single_device(sharded_setup):
    """The Pallas kernels on local shards (the path a real pod runs), in
    interpret mode, vs the unsharded kernel engine (VERDICT r1 #4: the
    kernel-on-local-shard path must execute somewhere, not just the XLA
    fallback dataflow)."""
    cfg, eng = sharded_setup
    mesh = make_mesh(dp=2, tp=2)

    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 16, seed=17).reshape(2, 16))
    ecfg = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                        bm_prefill=128, bm_decode=128)

    cache0 = init_kv_cache(cfg, 2, 32)
    want, want_cache = engine_forward(ecfg, eng, ids, cache0)

    eng_sh = shard_engine_params(eng, mesh)
    cache_sh = shard_kv_cache(init_kv_cache(cfg, 2, 32), mesh)
    got, got_cache = sharded_engine_forward(ecfg, eng_sh, ids, cache_sh, mesh)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(got_cache.k), np.asarray(want_cache.k))

    # and one decode step through the same kernel path
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    got2, _ = sharded_engine_forward(ecfg, eng_sh, nxt, got_cache, mesh)
    want2, _ = engine_forward(ecfg, eng, nxt, want_cache)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=2e-3, atol=2e-3)


def test_tp_sharded_continuous_batching_matches_dense(sharded_setup):
    """ContinuousBatcher(mesh=tp2) — every serving entry point under
    shard_map — produces the dense batcher's exact greedy tokens
    (BASELINE config 4: tensor-sharded continuous batching)."""
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    cfg, eng = sharded_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    rng = np.random.default_rng(17)
    prefix = rng.integers(0, cfg.vocab_size, size=6).astype(np.int32)
    prompts = [
        np.concatenate([prefix, rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)])
        for n in (4, 7)
    ] + [rng.integers(0, cfg.vocab_size, size=5).astype(np.int32)]

    def run(**kw):
        b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64,
                              prefill_pad=8, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=5))
        out = {r.uid: r.output_ids for r in b.run()}
        assert b.prefix_hits == 2
        return out

    want = run()
    got = run(mesh=make_mesh(dp=1, tp=2))
    assert got == want, (got, want)


def test_tp_sharded_batcher_spec_and_multi(sharded_setup):
    """Speculative + multi-step decode paths (engine_spec_decode_multi,
    engine_decode_multi) also run under shard_map and stay exact."""
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    cfg, eng = sharded_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    rng = np.random.default_rng(23)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)
               for n in (6, 9)]

    def run(**kw):
        b = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64,
                              prefill_pad=8, **kw)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=6))
        return {r.uid: r.output_ids for r in b.run()}

    want_multi = run(decode_steps=3)
    got_multi = run(decode_steps=3, mesh=make_mesh(dp=1, tp=2))
    assert got_multi == want_multi

    want_spec = run(spec_k=3)
    got_spec = run(spec_k=3, mesh=make_mesh(dp=1, tp=2))
    assert got_spec == want_spec


def test_tp_sharded_paged_batcher_matches_dense(sharded_setup):
    """PagedBatcher(mesh=tp2): the page-pool serving path (prefill, chunked
    prefix remainder, COW tail copy, decode multi) under shard_map emits the
    dense paged batcher's exact greedy tokens."""
    from dgq_tpu.serving.paged import PagedBatcher
    from dgq_tpu.serving.scheduler import Request

    cfg, eng = sharded_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    rng = np.random.default_rng(29)
    prefix = rng.integers(0, cfg.vocab_size, size=12).astype(np.int32)
    prompts = [
        np.concatenate([prefix, rng.integers(0, cfg.vocab_size, size=5).astype(np.int32)]),
        rng.integers(0, cfg.vocab_size, size=7).astype(np.int32),
    ]

    def run(**kw):
        b = PagedBatcher(ecfg, eng, num_slots=2, max_len=64, page_size=8,
                         decode_steps=2, **kw)
        b.register_prefix(prefix)
        for i, p in enumerate(prompts):
            b.add_request(Request(uid=i, prompt_ids=p, max_new_tokens=5))
        out = {r.uid: r.output_ids for r in b.run()}
        assert b.prefix_hits == 1
        return out

    want = run()
    got = run(mesh=make_mesh(dp=1, tp=2))
    assert got == want, (got, want)


def test_tp_rp_fused_bitwise_tracks_plane_path():
    """Regression (round 4): with the native-s4 fused decode kernels under
    TP, a GLOBAL cs_fold added on one rank changed that rank's fp32 psum
    partial vs the plane path and flipped a downstream requant rounding
    boundary — seed-0 weights diverged 0.09 in logits.  Per-rank LOCAL
    folds (_localize_row_cs_fold) keep the partials bitwise equal; this
    pins the exact failing configuration (seed 0, 4 layers, fused rows,
    tp=2)."""
    from dgq_tpu.models.synthetic import build_llama_engine

    cfg = tiny_llama_config(hidden_size=512, intermediate_size=1024,
                            num_hidden_layers=4, num_attention_heads=4,
                            num_key_value_heads=4)
    eng = build_llama_engine(cfg, seed=0, keep_span=True)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 8)), jnp.int32)
    mesh = make_mesh(dp=1, tp=2)
    eng_sh = shard_engine_params(eng, mesh)
    outs = {}
    for i4 in (True, False):
        ecfg = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                            bm_prefill=128, bm_decode=128, int4_mxu=i4)
        cache = shard_kv_cache(init_kv_cache(cfg, 4, 32), mesh)
        lg, _ = sharded_engine_forward(ecfg, eng_sh, ids, cache, mesh)
        outs[i4] = np.asarray(lg)
        want, _ = engine_forward(ecfg, eng, ids, init_kv_cache(cfg, 4, 32))
        np.testing.assert_allclose(outs[i4], np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    # the rp and plane TP paths are BITWISE equal (same int32 partials)
    np.testing.assert_array_equal(outs[True], outs[False])
