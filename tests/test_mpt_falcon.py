"""MPT and Falcon: HF logit parity + end-to-end PTQ (the reference has only
block-dispatch plumbing for these families; here they fully calibrate)."""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.falcon import falcon_apply, init_falcon_params, tiny_falcon_config
from dgq_tpu.models.llama import QuantState
from dgq_tpu.models.mpt import init_mpt_params, mpt_apply, tiny_mpt_config
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.quant.packing import PackedLinear
from dgq_tpu.utils.datautils import synthetic_stream
import pytest

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def test_mpt_matches_hf_logits():
    import torch
    from transformers import MptConfig as HFConfig
    from transformers.models.mpt.modeling_mpt import MptForCausalLM

    cfg = tiny_mpt_config()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, n_heads=cfg.n_heads,
        n_layers=cfg.n_layers, expansion_ratio=cfg.expansion_ratio,
        max_seq_len=cfg.max_seq_len, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MptForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    layers = []
    for i in range(cfg.n_layers):
        lp = f"transformer.blocks.{i}."
        layers.append(
            {
                "norm_1": {"weight": jnp.asarray(sd[lp + "norm_1.weight"])},
                "attn": {
                    "Wqkv": {"weight": jnp.asarray(sd[lp + "attn.Wqkv.weight"])},
                    "out_proj": {"weight": jnp.asarray(sd[lp + "attn.out_proj.weight"])},
                },
                "norm_2": {"weight": jnp.asarray(sd[lp + "norm_2.weight"])},
                "ffn": {
                    "up_proj": {"weight": jnp.asarray(sd[lp + "ffn.up_proj.weight"])},
                    "down_proj": {"weight": jnp.asarray(sd[lp + "ffn.down_proj.weight"])},
                },
            }
        )
    params = {
        "embed_tokens": jnp.asarray(sd["transformer.wte.weight"]),
        "layers": layers,
        "norm_f": {"weight": jnp.asarray(sd["transformer.norm_f.weight"])},
        "lm_head": {"weight": jnp.asarray(sd["transformer.wte.weight"])},  # tied
    }

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 18)).astype(np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(mpt_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_falcon_matches_hf_logits():
    import torch
    from transformers import FalconConfig as HFConfig
    from transformers.models.falcon.modeling_falcon import FalconForCausalLM

    cfg = tiny_falcon_config()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        new_decoder_architecture=False, multi_query=True, parallel_attn=True,
        bias=False, alibi=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = FalconForCausalLM(hf_cfg).eval()
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
                        "weight": jnp.asarray(sd[lp + "self_attention.query_key_value.weight"])
                    },
                    "dense": {"weight": jnp.asarray(sd[lp + "self_attention.dense.weight"])},
                },
                "mlp": {
                    "dense_h_to_4h": {"weight": jnp.asarray(sd[lp + "mlp.dense_h_to_4h.weight"])},
                    "dense_4h_to_h": {"weight": jnp.asarray(sd[lp + "mlp.dense_4h_to_h.weight"])},
                },
            }
        )
    params = {
        "embed_tokens": jnp.asarray(sd["transformer.word_embeddings.weight"]),
        "layers": layers,
        "ln_f": {
            "weight": jnp.asarray(sd["transformer.ln_f.weight"]),
            "bias": jnp.asarray(sd["transformer.ln_f.bias"]),
        },
        "lm_head": {"weight": jnp.asarray(sd["lm_head.weight"])},
    }

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 16)).astype(np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(falcon_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_mpt_ptq_end_to_end():
    cfg = tiny_mpt_config(d_model=64)
    params = init_mpt_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=32),
        smoothquant=True, kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="mpt", verbose=False)
    lin = res.params["layers"][0]["attn"]["Wqkv"]
    assert isinstance(lin, PackedLinear) and lin.w4w8
    qs = QuantState(actq=True, wtq=True, kv=True)
    logits = mpt_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(logits).all())


def test_falcon_ptq_end_to_end():
    cfg = tiny_falcon_config(hidden_size=64)
    params = init_falcon_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=32),
        smoothquant=True, kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="falcon", verbose=False)
    lin = res.params["layers"][0]["self_attention"]["query_key_value"]
    assert isinstance(lin, PackedLinear) and lin.w4w8
    qs = QuantState(actq=True, wtq=True, kv=True)
    logits = falcon_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(logits).all())
