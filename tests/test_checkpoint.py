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
