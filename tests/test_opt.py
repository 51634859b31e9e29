"""OPT: HF logit parity + end-to-end PTQ."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState
from dgq_tpu.models.opt import init_opt_params, opt_apply, tiny_opt_config
from dgq_tpu.quant.calibrate import ptq
from dgq_tpu.quant.packing import PackedLinear
from dgq_tpu.utils.datautils import synthetic_stream

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def _hf_tiny(cfg):
    import torch
    from transformers import OPTConfig as HFConfig
    from transformers.models.opt.modeling_opt import OPTForCausalLM

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        ffn_dim=cfg.ffn_dim,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        do_layer_norm_before=cfg.do_layer_norm_before,
        word_embed_proj_dim=cfg.hidden_size,
        dropout=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return OPTForCausalLM(hf_cfg).eval()


def _copy_hf(model, cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    pre = "model.decoder."
    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{pre}layers.{i}."
        layers.append(
            {
                "self_attn_layer_norm": {
                    "weight": jnp.asarray(sd[lp + "self_attn_layer_norm.weight"]),
                    "bias": jnp.asarray(sd[lp + "self_attn_layer_norm.bias"]),
                },
                "self_attn": {
                    k: {
                        "weight": jnp.asarray(sd[lp + f"self_attn.{k}.weight"]),
                        "bias": jnp.asarray(sd[lp + f"self_attn.{k}.bias"]),
                    }
                    for k in ("q_proj", "k_proj", "v_proj", "out_proj")
                },
                "final_layer_norm": {
                    "weight": jnp.asarray(sd[lp + "final_layer_norm.weight"]),
                    "bias": jnp.asarray(sd[lp + "final_layer_norm.bias"]),
                },
                "fc1": {
                    "weight": jnp.asarray(sd[lp + "fc1.weight"]),
                    "bias": jnp.asarray(sd[lp + "fc1.bias"]),
                },
                "fc2": {
                    "weight": jnp.asarray(sd[lp + "fc2.weight"]),
                    "bias": jnp.asarray(sd[lp + "fc2.bias"]),
                },
            }
        )
    return {
        "embed_tokens": jnp.asarray(sd[pre + "embed_tokens.weight"]),
        "embed_positions": jnp.asarray(sd[pre + "embed_positions.weight"]),
        "layers": layers,
        "final_layer_norm": {
            "weight": jnp.asarray(sd[pre + "final_layer_norm.weight"]),
            "bias": jnp.asarray(sd[pre + "final_layer_norm.bias"]),
        },
        "lm_head": {"weight": jnp.asarray(sd["lm_head.weight"])},
    }


def test_opt_matches_hf_logits():
    import torch

    cfg = tiny_opt_config()
    model = _hf_tiny(cfg)
    params = _copy_hf(model, cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 21)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    logits = np.asarray(opt_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-3, atol=2e-3)


def test_opt_ptq_end_to_end():
    cfg = tiny_opt_config(hidden_size=64, ffn_dim=128)
    params = init_opt_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 48).reshape(2, 48))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=32),
        smoothquant=True,
        kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="opt", verbose=False)
    lin = res.params["layers"][0]["self_attn"]["q_proj"]
    assert isinstance(lin, PackedLinear) and lin.w4w8
    assert lin.bias is not None  # OPT linears carry biases
    qs = QuantState(actq=True, wtq=True, kv=True)
    logits = opt_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(logits).all())


def test_opt_ptq_meanact_runs():
    cfg = tiny_opt_config(hidden_size=64, ffn_dim=128)
    params = init_opt_params(cfg, jax.random.PRNGKey(1))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=32),
        smoothquant=True,
        meanact=True,
        kvquant=True,
    )
    res = ptq(params, cfg, calib, qcfg, arch="opt", verbose=False)
    qs = QuantState(actq=True, wtq=True, kv=True)
    logits = opt_apply(res.params, calib[:1], cfg, qs, res.kv_scales)
    assert bool(jnp.isfinite(logits).all())
