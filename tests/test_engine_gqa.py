"""GQA (num_key_value_heads < num_attention_heads) through the INT8
engine: the LLaMA-2-70B-style head layout must work end-to-end in every
decode/prefill/kernel path (rep = H/Hkv folding — engine.py:588,
ops/attention.py reshape contracts).  The fake-quant model already has HF
parity at GQA (tests/test_model.py); these pin the ENGINE."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import (
    EngineConfig,
    engine_forward,
    from_ptq,
    generate,
    init_kv_cache,
)
from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def gqa_setup():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512,
                            num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 64).reshape(2, 64))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    return cfg, eng


def test_gqa_engine_decode_matches_prefill(gqa_setup):
    """Feeding tokens one at a time == feeding them at once (rep>1 cache).
    quant_pv pinned OFF: decode's int8 p@V vs prefill's fp path differ by
    the quantization budget, gated separately in tests/test_quant_pv.py."""
    cfg, eng = gqa_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 12, seed=5).reshape(1, 12))

    cache = init_kv_cache(cfg, 1, 32)
    lg_all, _ = engine_forward(ecfg, eng, ids, cache)

    cache = init_kv_cache(cfg, 1, 32)
    lg_steps = []
    for i in range(12):
        lg, cache = engine_forward(ecfg, eng, ids[:, i:i + 1], cache)
        lg_steps.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.asarray(lg_all[0]), np.stack(lg_steps),
                               rtol=2e-3, atol=2e-3)


def test_gqa_kernel_paths_match_xla(gqa_setup):
    """Pallas decode + flash-prefill kernels at rep=2 vs the XLA fallback
    (both interpret mode)."""
    cfg, eng = gqa_setup
    kern = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                        bm_prefill=128, bm_decode=128)
    xla = dataclasses.replace(kern, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=6).reshape(1, 8))

    outs = {}
    for name, ecfg in (("kern", kern), ("xla", xla)):
        cache = init_kv_cache(cfg, 1, 128)
        lg, cache = engine_forward(ecfg, eng, ids, cache)
        tok = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
        lg2, _ = engine_forward(ecfg, eng, tok, cache)
        outs[name] = (np.asarray(lg), np.asarray(lg2))
    np.testing.assert_allclose(outs["kern"][0], outs["xla"][0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(outs["kern"][1], outs["xla"][1], rtol=2e-3, atol=2e-3)


def test_gqa_speculative_exact(gqa_setup):
    """Speculative decoding preserves greedy exactness with rep>1."""
    from dgq_tpu.serving.speculative import generate_speculative

    cfg, eng = gqa_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray([[3, 5, 3, 5, 3, 5]], jnp.int32)
    ref = generate(ecfg, eng, prompt, max_new_tokens=16, max_len=64)
    out, _ = generate_speculative(ecfg, eng, prompt, max_new_tokens=16,
                                  max_len=64, spec_k=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    out_d, _ = generate_speculative(ecfg, eng, prompt, max_new_tokens=16,
                                    max_len=64, spec_k=3, ondevice=True,
                                    chunk_steps=3)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out_d))
