"""End-to-end PTQ on a tiny model: BASELINE config 1 in miniature
(fake-quant W4A8 g-small, ppl-style loss regression vs fp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState, init_llama_params, llama_apply, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.quant.packing import PackedLinear
from dgq_tpu.utils.datautils import synthetic_stream


def _mean_nll(logits, ids):
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)
    return float(jnp.mean(nll))


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
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


def test_ptq_search_w4w8_end_to_end(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg()
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)

    # all 7 linears per layer became PackedLinear with dual-grained buffers
    for layer in res.params["layers"]:
        for path in (("self_attn", "q_proj"), ("mlp", "down_proj")):
            lin = layer[path[0]][path[1]]
            assert isinstance(lin, PackedLinear)
            assert lin.w4w8 and lin.wscales.dtype == jnp.int8
            assert lin.amax is not None and float(lin.amax) > 0
    assert all(kv is not None for kv in res.kv_scales)
    assert all(float(kv.k_scale) > 0 for kv in res.kv_scales)

    # quantized model quality: NLL within a sane delta of fp on the calib data
    ids = calib[:1]
    fp_logits = llama_apply(params, ids, cfg)
    qs = QuantState(actq=True, wtq=True, kv=True)
    q_logits = llama_apply(res.params, ids, cfg, qs, res.kv_scales)
    nll_fp = _mean_nll(fp_logits, ids)
    nll_q = _mean_nll(q_logits, ids)
    assert np.isfinite(nll_q)
    assert nll_q < nll_fp + 0.7, f"quantized NLL degraded too much: {nll_q} vs {nll_fp}"


def test_ptq_naive_runs(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg(method="naive", w4w8=False)
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    lin = res.params["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(lin, PackedLinear) and not lin.w4w8


def test_ptq_gptq_runs_and_is_reasonable(tiny_setup):
    cfg, params, calib = tiny_setup
    qcfg = _qcfg(method="gptq", w4w8=False)
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    ids = calib[:1]
    qs = QuantState(actq=True, wtq=True, kv=True)
    q_logits = llama_apply(res.params, ids, cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(q_logits).all())


def test_ptq_quantized_outputs_feed_next_layer(tiny_setup):
    """The pass-3 re-forward must produce different (quantized) activations
    than the fp forward — guards against accidentally feeding fp outs."""
    cfg, params, calib = tiny_setup
    qcfg = _qcfg()
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    # fp and quantized layer-0 outputs must differ (quantization is lossy)
    qs = QuantState(actq=True, wtq=True, kv=True)
    fp_logits = llama_apply(params, calib[:1], cfg)
    q_logits = llama_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert not np.allclose(np.asarray(fp_logits), np.asarray(q_logits))


def test_w4w8_fallback_selection(tiny_setup):
    """With a tight fallback ratio every linear falls back to fp group
    scales; with a huge ratio everything stays dual-grained."""
    cfg, params, calib = tiny_setup
    tight = _qcfg()
    tight = QuantConfig(
        act_quant=tight.act_quant,
        wt_quant=WtQuantConfig(bits=4, method="search", groupsize=32, w4w8=True,
                               w4w8_fallback_ratio=0.0),
        smoothquant=False, kvquant=False,
    )
    res = ptq_llama(params, cfg, calib, tight, verbose=False)
    # ratio 0.0: any nonzero w4w8 error triggers fallback -> all plain
    assert not res.params["layers"][0]["self_attn"]["q_proj"].w4w8
    assert not res.params["layers"][0]["mlp"]["down_proj"].w4w8

    loose = QuantConfig(
        act_quant=tight.act_quant,
        wt_quant=WtQuantConfig(bits=4, method="search", groupsize=32, w4w8=True,
                               w4w8_fallback_ratio=1e9),
        smoothquant=False, kvquant=False,
    )
    res2 = ptq_llama(params, cfg, calib, loose, verbose=False)
    assert res2.params["layers"][0]["self_attn"]["q_proj"].w4w8
