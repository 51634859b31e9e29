"""Host-offload calibration + layerwise eval parity with the resident path."""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState, init_llama_params, llama_apply, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.utils.datautils import synthetic_stream
from dgq_tpu.utils.evalutils import ppl_eval, ppl_eval_layerwise
import pytest

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def test_offload_ptq_matches_resident():
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=32))

    res_resident = ptq(params, cfg, calib, qcfg, verbose=False)
    host_params = {**params, "layers": [_to_host(l) for l in params["layers"]]}
    res_offload = ptq(host_params, cfg, calib, qcfg, verbose=False, offload=True)

    # packed layers land on host as numpy leaves with identical values
    lin_h = res_offload.params["layers"][0]["self_attn"]["q_proj"]
    lin_d = res_resident.params["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(lin_h.qweight, np.ndarray)
    np.testing.assert_array_equal(np.asarray(lin_h.qweight), np.asarray(lin_d.qweight))
    np.testing.assert_allclose(
        np.asarray(lin_h.wscales8), np.asarray(lin_d.wscales8), rtol=1e-6
    )


def test_layerwise_ppl_matches_whole_model():
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(1))
    stream = synthetic_stream(cfg.vocab_size, 3 * 32 + 1, seed=4)

    def logits_fn(ps_kv, batch):
        return llama_apply(ps_kv[0], batch, cfg)

    ppl_whole = ppl_eval(logits_fn, (params, None), stream, seqlen=32, max_samples=3)
    host_params = {**params, "layers": [_to_host(l) for l in params["layers"]]}
    ppl_lw = ppl_eval_layerwise(host_params, cfg, stream, seqlen=32, max_samples=3)
    np.testing.assert_allclose(ppl_lw, ppl_whole, rtol=1e-4)


def test_layerwise_ppl_quantized():
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(2))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=32))
    res = ptq(params, cfg, calib, qcfg, verbose=False)
    stream = synthetic_stream(cfg.vocab_size, 2 * 32 + 1, seed=5)
    qs = QuantState(actq=True, wtq=True, kv=True)
    ppl = ppl_eval_layerwise(
        res.params, cfg, stream, seqlen=32, qs=qs, kv_scales=res.kv_scales, max_samples=2
    )
    assert np.isfinite(ppl) and ppl > 1


def test_engine_ppl_single_and_sharded_match():
    from dgq_tpu.models.engine import EngineConfig, from_ptq
    from dgq_tpu.parallel.mesh import make_mesh
    from dgq_tpu.parallel.sharded_engine import shard_engine_params
    from dgq_tpu.utils.evalutils import ppl_eval_engine

    cfg = tiny_llama_config(hidden_size=512, intermediate_size=1024, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(3))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    stream = synthetic_stream(cfg.vocab_size, 2 * 32 + 1, seed=6)

    ppl1 = ppl_eval_engine(ecfg, eng, stream, seqlen=32, max_samples=2)
    mesh = make_mesh(dp=1, tp=2)
    eng_sh = shard_engine_params(eng, mesh)
    ppl2 = ppl_eval_engine(ecfg, eng_sh, stream, seqlen=32, max_samples=2, mesh=mesh)
    np.testing.assert_allclose(ppl1, ppl2, rtol=1e-3)


def test_ptq_resume_midway(tmp_path):
    """Interrupt after layer 0, resume, and match the uninterrupted result."""
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(5))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=32))

    want = ptq(params, cfg, calib, qcfg, verbose=False)

    # simulate a crash after layer 0: run with a sabotaged second layer via
    # a truncated param tree, catching the failure
    rd = str(tmp_path / "resume")
    crashed = {**params, "layers": params["layers"][:1]}
    ptq(crashed, cfg, calib, qcfg, verbose=False, resume_dir=rd)

    # resume with the full tree: layer 0 must be loaded, only layer 1 runs
    got = ptq(params, cfg, calib, qcfg, verbose=False, resume_dir=rd)

    for li in range(2):
        a = want.params["layers"][li]["self_attn"]["q_proj"]
        b = got.params["layers"][li]["self_attn"]["q_proj"]
        np.testing.assert_array_equal(np.asarray(a.qweight), np.asarray(b.qweight))
    for kv_a, kv_b in zip(want.kv_scales, got.kv_scales):
        if kv_a is None:
            assert kv_b is None
        else:
            np.testing.assert_allclose(np.asarray(kv_a.k_scale), np.asarray(kv_b.k_scale))
