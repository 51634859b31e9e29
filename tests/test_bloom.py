"""BLOOM: HF logit parity + PTQ (the reference supports BLOOM for
calibration only; here the fake-quant path is fully functional)."""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.bloom import (
    bloom_apply,
    init_bloom_params,
    tiny_bloom_config,
)
from dgq_tpu.models.llama import QuantState
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.quant.packing import PackedLinear
from dgq_tpu.utils.datautils import synthetic_stream
import pytest

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def _hf_tiny(cfg):
    import torch
    from transformers import BloomConfig as HFConfig
    from transformers.models.bloom.modeling_bloom import BloomForCausalLM

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        n_layer=cfg.num_hidden_layers,
        n_head=cfg.num_attention_heads,
        attn_implementation="eager",
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    return BloomForCausalLM(hf_cfg).eval()


def _copy_hf(model, cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"transformer.h.{i}."
        layers.append(
            {
                "input_layernorm": {
                    "weight": jnp.asarray(sd[lp + "input_layernorm.weight"]),
                    "bias": jnp.asarray(sd[lp + "input_layernorm.bias"]),
                },
                "self_attention": {
                    "query_key_value": {
                        "weight": jnp.asarray(sd[lp + "self_attention.query_key_value.weight"]),
                        "bias": jnp.asarray(sd[lp + "self_attention.query_key_value.bias"]),
                    },
                    "dense": {
                        "weight": jnp.asarray(sd[lp + "self_attention.dense.weight"]),
                        "bias": jnp.asarray(sd[lp + "self_attention.dense.bias"]),
                    },
                },
                "post_attention_layernorm": {
                    "weight": jnp.asarray(sd[lp + "post_attention_layernorm.weight"]),
                    "bias": jnp.asarray(sd[lp + "post_attention_layernorm.bias"]),
                },
                "mlp": {
                    "dense_h_to_4h": {
                        "weight": jnp.asarray(sd[lp + "mlp.dense_h_to_4h.weight"]),
                        "bias": jnp.asarray(sd[lp + "mlp.dense_h_to_4h.bias"]),
                    },
                    "dense_4h_to_h": {
                        "weight": jnp.asarray(sd[lp + "mlp.dense_4h_to_h.weight"]),
                        "bias": jnp.asarray(sd[lp + "mlp.dense_4h_to_h.bias"]),
                    },
                },
            }
        )
    return {
        "embed_tokens": jnp.asarray(sd["transformer.word_embeddings.weight"]),
        "word_embeddings_layernorm": {
            "weight": jnp.asarray(sd["transformer.word_embeddings_layernorm.weight"]),
            "bias": jnp.asarray(sd["transformer.word_embeddings_layernorm.bias"]),
        },
        "layers": layers,
        "ln_f": {
            "weight": jnp.asarray(sd["transformer.ln_f.weight"]),
            "bias": jnp.asarray(sd["transformer.ln_f.bias"]),
        },
        "lm_head": {"weight": jnp.asarray(sd["lm_head.weight"])},
    }


def test_bloom_matches_hf_logits():
    import torch

    cfg = tiny_bloom_config()
    model = _hf_tiny(cfg)
    params = _copy_hf(model, cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 19)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    logits = np.asarray(bloom_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(logits, hf_logits, rtol=5e-3, atol=5e-3)


def test_bloom_ptq_end_to_end():
    cfg = tiny_bloom_config(hidden_size=64)
    params = init_bloom_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=32),
        smoothquant=True,
        kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="bloom", verbose=False)
    lin = res.params["layers"][0]["self_attention"]["query_key_value"]
    assert isinstance(lin, PackedLinear) and lin.w4w8
    qs = QuantState(actq=True, wtq=True, kv=True)
    logits = bloom_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(logits).all())
