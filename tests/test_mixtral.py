"""Mixtral sparse-MoE family: model, smoothing invariance, end-to-end PTQ.

Beyond-reference family (the reference has no MoE support); same fake-quant
contracts as tests/test_calibrate.py applied to the MoE block, plus MoE-
specific invariants: routing sparsity, smoothing routing-invariance, and
router/expert shared-representation consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState
from dgq_tpu.models.mixtral import (
    init_mixtral_params,
    mixtral_apply,
    mixtral_moe,
    route_topk,
    smooth_mixtral_layer,
    tiny_mixtral_config,
)
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.quant.packing import PackedLinear
from dgq_tpu.utils.datautils import synthetic_stream


def _mean_nll(logits, ids):
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)
    return float(jnp.mean(nll))


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_mixtral_config()
    params = init_mixtral_params(cfg, jax.random.PRNGKey(0))
    calib = synthetic_stream(cfg.vocab_size, 4 * 64 + 1, seed=0)[: 4 * 64].reshape(4, 64)
    return cfg, params, jnp.asarray(calib)


def _qcfg(method="search", w4w8=True, groupsize=32, **kw):
    return QuantConfig(
        act_quant=ActQuantConfig(bits=8, method="static"),
        wt_quant=WtQuantConfig(bits=4, method=method, groupsize=groupsize, w4w8=w4w8),
        smoothquant=True,
        kvquant=True,
        **kw,
    )


def test_fp_forward_finite_and_routing_sparse(tiny_setup):
    cfg, params, calib = tiny_setup
    logits = mixtral_apply(params, calib[:2], cfg)
    assert logits.shape == (2, 64, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())

    # top-k weights are a renormalized distribution over k experts
    rl = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.num_local_experts))
    topw, topi = route_topk(rl, cfg.num_experts_per_tok)
    assert topw.shape == (2, 8, 2) and topi.shape == (2, 8, 2)
    np.testing.assert_allclose(np.asarray(jnp.sum(topw, -1)), 1.0, rtol=1e-6)
    assert int(jnp.max(topi)) < cfg.num_local_experts


def test_moe_equals_dense_mlp_when_one_expert_dominates(tiny_setup):
    """With k == E (all experts selected) and uniform router, the MoE output
    is the average of the expert MLPs — a closed-form cross-check of the
    mask-and-combine arithmetic."""
    cfg0, params, _ = tiny_setup
    cfg = tiny_mixtral_config(num_experts_per_tok=cfg0.num_local_experts)
    moe = jax.tree_util.tree_map(lambda x: x, params["layers"][0]["block_sparse_moe"])
    moe["gate"]["weight"] = jnp.zeros_like(moe["gate"]["weight"])  # uniform
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.hidden_size))
    out = mixtral_moe(moe, x, cfg, QuantState())
    ref = 0.0
    for ex in moe["experts"]:
        g = x @ ex["w1"]["weight"].T
        u = x @ ex["w3"]["weight"].T
        ref = ref + (jax.nn.silu(g) * u) @ ex["w2"]["weight"].T
    ref = ref / cfg.num_local_experts
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_smoothing_preserves_fp_forward_and_routing(tiny_setup):
    """smooth_mixtral_layer is an (approximate) identity on the fp forward —
    including the router, which must absorb the ln2 scale."""
    cfg, params, calib = tiny_setup
    layer = params["layers"][0]
    d, f = cfg.hidden_size, cfg.intermediate_size
    rng = np.random.default_rng(0)
    stats = {
        "attn_ln_out_absmax": jnp.asarray(rng.uniform(0.1, 3.0, (d,)), jnp.float32),
        "moe_ln_out_absmax": jnp.asarray(rng.uniform(0.1, 3.0, (d,)), jnp.float32),
    }
    for e in range(cfg.num_local_experts):
        stats[f"expert{e}_down_inp_absmax"] = jnp.asarray(
            rng.uniform(0.1, 3.0, (f,)), jnp.float32
        )
    smoothed = smooth_mixtral_layer(layer, stats)

    from dgq_tpu.models.llama import causal_mask, rope_cos_sin
    from dgq_tpu.models.mixtral import mixtral_block

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, d))
    mask = causal_mask(16, 16)
    cos, sin = rope_cos_sin(jnp.arange(16), cfg.head_dim, cfg.rope_theta)
    y0 = mixtral_block(layer, x, mask, cos, sin, cfg)
    y1 = mixtral_block(smoothed, x, mask, cos, sin, cfg)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=2e-4, atol=2e-5)


def test_ptq_mixtral_end_to_end(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg()
    res = ptq(params, cfg, calib, qcfg, arch="mixtral", verbose=False)

    for layer in res.params["layers"]:
        assert isinstance(layer["self_attn"]["q_proj"], PackedLinear)
        moe = layer["block_sparse_moe"]
        # router stays fp
        assert isinstance(moe["gate"], dict) and "weight" in moe["gate"]
        for ex in moe["experts"]:
            for nm in ("w1", "w3", "w2"):
                lin = ex[nm]
                assert isinstance(lin, PackedLinear)
                assert lin.w4w8 and lin.amax is not None and float(lin.amax) > 0
        # shared input family -> identical act scale across experts' w1/w3
        a0 = float(moe["experts"][0]["w1"].amax)
        for ex in moe["experts"]:
            assert float(ex["w1"].amax) == a0 == float(ex["w3"].amax)
    assert all(kv is not None for kv in res.kv_scales)

    ids = calib[:1]
    fp_logits = mixtral_apply(params, ids, cfg)
    qs = QuantState(actq=True, wtq=True, kv=True)
    q_logits = mixtral_apply(res.params, ids, cfg, qs, res.kv_scales)
    nll_fp = _mean_nll(fp_logits, ids)
    nll_q = _mean_nll(q_logits, ids)
    assert np.isfinite(nll_q)
    assert nll_q < nll_fp + 0.7, f"quantized NLL degraded too much: {nll_q} vs {nll_fp}"


def test_ptq_mixtral_gptq_runs(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg(method="gptq", w4w8=False)
    res = ptq(params, cfg, calib, qcfg, arch="mixtral", verbose=False)
    qs = QuantState(actq=True, wtq=True, kv=True)
    q_logits = mixtral_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(q_logits).all())


def test_ptq_mixtral_meanact_runs(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg(meanact=True)
    res = ptq(params, cfg, calib, qcfg, arch="mixtral", verbose=False)
    moe = res.params["layers"][0]["block_sparse_moe"]
    assert moe["gate"].get("bias") is not None  # routing-invariant fold
    qs = QuantState(actq=True, wtq=True, kv=True)
    q_logits = mixtral_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(q_logits).all())
