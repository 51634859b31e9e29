"""HuggingFace checkpoint ingestion.

Loads a LLaMA-family safetensors checkpoint directory into the functional
params pytree (the counterpart of the reference's
AutoModelForCausalLM.from_pretrained at dgq/entry.py:82, without torch on the
hot path — tensors stream straight from safetensors into jnp arrays).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.llama import LlamaConfig


def load_llama_config(model_dir: str) -> LlamaConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return LlamaConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 10000.0),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def _open_shards(model_dir: str):
    """Yield (name, numpy array) for every tensor across safetensors shards."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
    for shard in shards:
        # framework="flax" hands back jnp arrays and handles bf16 tensors,
        # which the numpy framework cannot represent.
        with safe_open(os.path.join(model_dir, shard), framework="flax") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def load_llama_params(model_dir: str, dtype=jnp.bfloat16) -> Dict:
    """Read HF LLaMA weights into the dgq_tpu params pytree."""
    cfg = load_llama_config(model_dir)
    layers: list = [
        {
            "input_layernorm": {},
            "self_attn": {"q_proj": {}, "k_proj": {}, "v_proj": {}, "o_proj": {}},
            "post_attention_layernorm": {},
            "mlp": {"gate_proj": {}, "up_proj": {}, "down_proj": {}},
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    params: Dict = {"layers": layers}

    for name, arr in _open_shards(model_dir):
        a = jnp.asarray(arr).astype(dtype)
        if name == "model.embed_tokens.weight":
            params["embed_tokens"] = a
        elif name == "model.norm.weight":
            params["norm"] = {"weight": a}
        elif name == "lm_head.weight":
            params["lm_head"] = {"weight": a}
        elif name.startswith("model.layers."):
            parts = name.split(".")
            li = int(parts[2])
            sub = parts[3]
            if sub in ("input_layernorm", "post_attention_layernorm"):
                layers[li][sub]["weight"] = a
            elif sub in ("self_attn", "mlp"):
                proj = parts[4]
                leaf = parts[5]  # weight / bias
                layers[li][sub][proj][leaf] = a
    if "lm_head" not in params and cfg.tie_word_embeddings:
        params["lm_head"] = {"weight": params["embed_tokens"]}
    return params
