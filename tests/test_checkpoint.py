"""Checkpoint save/load round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState, init_llama_params, llama_apply, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.quant.packing import PackedLinear
from dgq_tpu.utils.checkpoint import load_quantized, save_quantized
from dgq_tpu.utils.datautils import synthetic_stream
import pytest

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def test_quantized_checkpoint_roundtrip(tmp_path):
    cfg = tiny_llama_config(num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=32),
        nsamples=2,
        seqlen=32,
    )
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)

    path = str(tmp_path / "ckpt.safetensors")
    save_quantized(path, res.params, cfg, qcfg, res.kv_scales)
    params2, cfg2, qcfg2, kv2 = load_quantized(path)

    assert cfg2 == cfg
    assert qcfg2.wt_quant.groupsize == 32
    lin = params2["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(lin, PackedLinear) and lin.w4w8

    qs = QuantState(actq=True, wtq=True, kv=True)
    ids = calib[:1]
    l1 = np.asarray(llama_apply(res.params, ids, cfg, qs, res.kv_scales))
    l2 = np.asarray(llama_apply(params2, ids, cfg2, qs, kv2))
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)


def test_engine_checkpoint_roundtrip(tmp_path):
    from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
    from dgq_tpu.utils.checkpoint import load_engine, save_engine
    from dgq_tpu.utils.datautils import synthetic_stream

    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)

    path = str(tmp_path / "engine.safetensors")
    save_engine(path, eng, cfg)
    eng2, cfg2 = load_engine(path)
    assert cfg2 == cfg

    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=2).reshape(1, 8))
    cache = init_kv_cache(cfg, 1, 16)
    l1, _ = engine_forward(ecfg, eng, ids, cache)
    l2, _ = engine_forward(ecfg, eng2, ids, cache)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_engine_sharded_checkpoint_roundtrip(tmp_path):
    """orbax sharded engine checkpoint: plain round trip equals the
    safetensors path, and mesh-restore places leaves per the TP specs
    while returning canonical params that serve identically."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
    from dgq_tpu.parallel.mesh import make_mesh
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request
    from dgq_tpu.utils.checkpoint import load_engine_sharded, save_engine_sharded

    # hidden 512 so row-parallel K/tp=2 stays span-aligned (see test_sharding)
    cfg = tiny_llama_config(hidden_size=512, intermediate_size=1024, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)

    path = str(tmp_path / "eng_orbax")
    save_engine_sharded(path, eng, cfg)

    # plain restore: bitwise round trip
    eng2, cfg2 = load_engine_sharded(path)
    assert cfg2 == cfg and eng2.rms_eps == eng.rms_eps
    for a, b in zip(jax.tree_util.tree_leaves(eng), jax.tree_util.tree_leaves(eng2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mesh restore: leaves land sharded per engine_param_specs, no gather
    mesh = make_mesh(dp=1, tp=2)
    eng3, _ = load_engine_sharded(path, mesh=mesh)
    # rp-only storage: the packed weight is the rowpair (native-s4) copy
    qw = eng3.layers.qkv_proj.qw_rp  # (L, K//2, N): column-parallel on N
    assert qw.sharding == NamedSharding(mesh, P(None, None, "tp"))
    ow = eng3.layers.o_proj.qw_rp  # row-parallel on K
    assert ow.sharding == NamedSharding(mesh, P(None, "tp", None))
    assert eng3.embed_tokens.sharding.is_fully_replicated

    # canonical contract: mesh-restored params serve through the sharded
    # batcher with exactly the tokens of the dense engine
    prompt = np.asarray([3, 5, 3, 5, 3, 5], np.int32)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    dense = ContinuousBatcher(ecfg, eng, num_slots=2, max_len=64, prefill_pad=16)
    dense.add_request(Request(uid=0, prompt_ids=prompt, max_new_tokens=6))
    want = dense.run()[0].output_ids

    shard = ContinuousBatcher(ecfg, eng3, num_slots=2, max_len=64,
                              prefill_pad=16, mesh=mesh)
    shard.add_request(Request(uid=0, prompt_ids=prompt, max_new_tokens=6))
    got = shard.run()[0].output_ids
    assert got == want, (got, want)
