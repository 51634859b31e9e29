"""Expert-parallel Mixtral engine tests on the virtual 8-device CPU mesh.

Contracts (parallel/moe.py): ep forward matches the single-device engine
(logits allclose — fp32 combine order is the only difference; INT8 KV
cache bit-identical since attention is replicated over ep), routing is
bit-identical, dp composes with ep, and bad expert counts fail loudly.
The reference has no MoE and no distributed layer (SURVEY §2.3) — these
contracts are beyond-reference surface.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.mixtral import init_mixtral_params, tiny_mixtral_config
from dgq_tpu.models.mixtral_engine import (
    MixtralEngineConfig,
    from_ptq_mixtral,
    init_mixtral_kv_cache,
    mixtral_engine_forward,
)
from dgq_tpu.parallel.moe import (
    ep_mixtral_forward,
    make_ep_mesh,
    shard_moe_engine_params,
    shard_moe_kv_cache,
)
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def moe_ep_setup():
    cfg = tiny_mixtral_config(hidden_size=256, intermediate_size=512,
                              num_attention_heads=4, num_key_value_heads=2)
    params = init_mixtral_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=128),
        smoothquant=True,
        kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="mixtral", verbose=False)
    eng = from_ptq_mixtral(res.params, res.kv_scales, cfg)
    return cfg, eng


def _dense_vs_ep(cfg, eng, ep, dp, batch, use_kernel=False):
    ecfg = MixtralEngineConfig(cfg=cfg, use_kernel=use_kernel,
                               interpret=use_kernel)
    mesh = make_ep_mesh(ep=ep, dp=dp)
    eng_sh = shard_moe_engine_params(eng, mesh)
    cache_sh = shard_moe_kv_cache(init_mixtral_kv_cache(cfg, batch, 48), mesh)
    ids = jnp.asarray(
        synthetic_stream(cfg.vocab_size, batch * 24, seed=11).reshape(batch, 24)
    )
    got, got_cache = ep_mixtral_forward(ecfg, eng_sh, ids, cache_sh, mesh)
    want, want_cache = mixtral_engine_forward(
        ecfg, eng, ids, init_mixtral_kv_cache(cfg, batch, 48)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
    )
    # attention is replicated over ep -> INT8 KV bit-identical
    np.testing.assert_array_equal(np.asarray(got_cache.k), np.asarray(want_cache.k))
    np.testing.assert_array_equal(np.asarray(got_cache.v), np.asarray(want_cache.v))
    assert int(got_cache.length) == int(want_cache.length) == 24
    return got, got_cache, eng_sh, ecfg, mesh


def test_ep_matches_single_device(moe_ep_setup):
    cfg, eng = moe_ep_setup
    _dense_vs_ep(cfg, eng, ep=4, dp=1, batch=2)


def test_ep_one_expert_per_rank(moe_ep_setup):
    # ep == E: each rank holds exactly one expert
    cfg, eng = moe_ep_setup
    _dense_vs_ep(cfg, eng, ep=cfg.num_local_experts, dp=2, batch=2)


def test_ep_dp_composes_and_decode(moe_ep_setup):
    cfg, eng = moe_ep_setup
    got, cache, eng_sh, ecfg, mesh = _dense_vs_ep(cfg, eng, ep=4, dp=2, batch=4)

    # one greedy decode step after the sharded prefill matches dense
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    got2, cache2 = ep_mixtral_forward(ecfg, eng_sh, nxt, cache, mesh)
    dense_cache = init_mixtral_kv_cache(cfg, 4, 48)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 4 * 24, seed=11).reshape(4, 24))
    w1, dc = mixtral_engine_forward(ecfg, eng, ids, dense_cache)
    w2, _ = mixtral_engine_forward(ecfg, eng, nxt, dc)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(w2), rtol=2e-3, atol=2e-3)
    assert int(cache2.length) == 25


def test_ep_kernel_path_matches(moe_ep_setup):
    # the Pallas fused GEMM on each rank's local expert tiles (interpret
    # mode on the CPU mesh — same kernel logic a real pod runs)
    cfg, eng = moe_ep_setup
    _dense_vs_ep(cfg, eng, ep=4, dp=1, batch=2, use_kernel=True)


def test_ep_requires_divisible_expert_count(moe_ep_setup):
    cfg, eng = moe_ep_setup
    with pytest.raises(ValueError, match="not divisible"):
        shard_moe_engine_params(eng, make_ep_mesh(ep=3))
