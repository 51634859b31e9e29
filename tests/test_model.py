"""LLaMA forward parity against the HuggingFace torch implementation.

The strongest correctness anchor available offline: build a tiny HF llama,
copy its weights into the functional pytree, compare logits.
"""

import numpy as np
import jax.numpy as jnp
import jax

from dgq_tpu.models.llama import (
    LlamaConfig,
    QuantState,
    init_llama_params,
    llama_apply,
    tiny_llama_config,
)


def _hf_tiny(cfg: LlamaConfig):
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    return model


def _copy_hf_weights(model, cfg: LlamaConfig):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}."
        layers.append(
            {
                "input_layernorm": {"weight": jnp.asarray(sd[pre + "input_layernorm.weight"])},
                "self_attn": {
                    k: {"weight": jnp.asarray(sd[pre + f"self_attn.{k}.weight"])}
                    for k in ("q_proj", "k_proj", "v_proj", "o_proj")
                },
                "post_attention_layernorm": {
                    "weight": jnp.asarray(sd[pre + "post_attention_layernorm.weight"])
                },
                "mlp": {
                    k: {"weight": jnp.asarray(sd[pre + f"mlp.{k}.weight"])}
                    for k in ("gate_proj", "up_proj", "down_proj")
                },
            }
        )
    return {
        "embed_tokens": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": layers,
        "norm": {"weight": jnp.asarray(sd["model.norm.weight"])},
        "lm_head": {"weight": jnp.asarray(sd["lm_head.weight"])},
    }


def test_llama_matches_hf_logits():
    import torch

    cfg = tiny_llama_config()
    model = _hf_tiny(cfg)
    params = _copy_hf_weights(model, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 33)).astype(np.int32)

    with torch.no_grad():
        hf_logits = model(torch.tensor(ids.astype(np.int64))).logits.numpy()

    logits = np.asarray(llama_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-3, atol=2e-3)


def test_llama_gqa_forward_shape():
    cfg = tiny_llama_config(num_key_value_heads=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.zeros((2, 16), jnp.int32)
    logits = llama_apply(params, ids, cfg)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.isfinite(logits).all())


def test_llama_gqa_matches_hf():
    import torch

    cfg = tiny_llama_config(num_key_value_heads=2)
    model = _hf_tiny(cfg)
    params = _copy_hf_weights(model, cfg)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 17)).astype(np.int32)
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    logits = np.asarray(llama_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-3, atol=2e-3)
