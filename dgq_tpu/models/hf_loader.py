"""HuggingFace checkpoint ingestion.

Loads a LLaMA-family safetensors checkpoint directory into the functional
params pytree (the counterpart of the reference's
AutoModelForCausalLM.from_pretrained at dgq/entry.py:82, without torch on the
hot path — tensors stream straight from safetensors into jnp arrays).
"""

from __future__ import annotations

import json
import os
from typing import Dict

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


def load_opt_config(model_dir: str):
    from dgq_tpu.models.opt import OPTConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return OPTConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        ffn_dim=hf["ffn_dim"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        max_position_embeddings=hf.get("max_position_embeddings", 2048),
        do_layer_norm_before=hf.get("do_layer_norm_before", True),
        pad_token_id=hf.get("pad_token_id", 1),
    )


def load_opt_params(model_dir: str, dtype=jnp.bfloat16) -> Dict:
    """HF OPT -> dgq_tpu params pytree.  Assumes word_embed_proj_dim ==
    hidden_size (true for all standard OPT sizes except 350m)."""
    cfg = load_opt_config(model_dir)
    layers: list = [
        {
            "self_attn_layer_norm": {},
            "self_attn": {"q_proj": {}, "k_proj": {}, "v_proj": {}, "out_proj": {}},
            "final_layer_norm": {},
            "fc1": {},
            "fc2": {},
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    params: Dict = {"layers": layers}
    for name, arr in _open_shards(model_dir):
        a = jnp.asarray(arr).astype(dtype)
        name = name.replace("model.decoder.", "").replace("decoder.", "")
        if name == "embed_tokens.weight":
            params["embed_tokens"] = a
        elif name == "embed_positions.weight":
            params["embed_positions"] = a
        elif name.startswith("final_layer_norm."):
            params.setdefault("final_layer_norm", {})[name.split(".")[-1]] = a
        elif name == "lm_head.weight":
            params["lm_head"] = {"weight": a}
        elif name.startswith("layers."):
            parts = name.split(".")
            li = int(parts[1])
            sub = parts[2]
            if sub in ("self_attn_layer_norm", "final_layer_norm"):
                layers[li][sub][parts[3]] = a
            elif sub == "self_attn":
                layers[li][sub][parts[3]][parts[4]] = a
            elif sub in ("fc1", "fc2"):
                layers[li][sub][parts[3]] = a
    if "lm_head" not in params:
        params["lm_head"] = {"weight": params["embed_tokens"]}  # OPT ties weights
    return params


def load_bloom_config(model_dir: str):
    from dgq_tpu.models.bloom import BloomConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return BloomConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf.get("hidden_size", hf.get("n_embed")),
        num_hidden_layers=hf.get("num_hidden_layers", hf.get("n_layer")),
        num_attention_heads=hf.get("num_attention_heads", hf.get("n_head")),
        layer_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
    )


def load_bloom_params(model_dir: str, dtype=jnp.bfloat16) -> Dict:
    cfg = load_bloom_config(model_dir)
    layers: list = [
        {
            "input_layernorm": {},
            "self_attention": {"query_key_value": {}, "dense": {}},
            "post_attention_layernorm": {},
            "mlp": {"dense_h_to_4h": {}, "dense_4h_to_h": {}},
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    params: Dict = {"layers": layers}
    for name, arr in _open_shards(model_dir):
        a = jnp.asarray(arr).astype(dtype)
        name = name.replace("transformer.", "")
        if name == "word_embeddings.weight":
            params["embed_tokens"] = a
        elif name.startswith("word_embeddings_layernorm."):
            params.setdefault("word_embeddings_layernorm", {})[name.split(".")[-1]] = a
        elif name.startswith("ln_f."):
            params.setdefault("ln_f", {})[name.split(".")[-1]] = a
        elif name == "lm_head.weight":
            params["lm_head"] = {"weight": a}
        elif name.startswith("h."):
            parts = name.split(".")
            li = int(parts[1])
            sub = parts[2]
            if sub in ("input_layernorm", "post_attention_layernorm"):
                layers[li][sub][parts[3]] = a
            elif sub in ("self_attention", "mlp"):
                layers[li][sub][parts[3]][parts[4]] = a
    if "lm_head" not in params:
        params["lm_head"] = {"weight": params["embed_tokens"]}  # BLOOM ties weights
    return params


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
    if "lm_head" not in params:
        # Some checkpoint shard sets omit lm_head.weight without setting
        # tie_word_embeddings; tie to the embedding with a warning rather
        # than KeyError-ing deep inside the forward.
        if not cfg.tie_word_embeddings:
            import warnings

            warnings.warn(
                "checkpoint has no lm_head.weight and tie_word_embeddings is "
                "not set; tying lm_head to embed_tokens",
                stacklevel=2,
            )
        params["lm_head"] = {"weight": params["embed_tokens"]}
    return params


def load_mpt_config(model_dir: str):
    from dgq_tpu.models.mpt import MPTConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return MPTConfig(
        vocab_size=hf["vocab_size"],
        d_model=hf["d_model"],
        n_heads=hf["n_heads"],
        n_layers=hf["n_layers"],
        expansion_ratio=hf.get("expansion_ratio", 4),
        max_seq_len=hf.get("max_seq_len", 2048),
        no_bias=hf.get("no_bias", True),
    )


def load_mpt_params(model_dir: str, dtype=jnp.bfloat16) -> Dict:
    cfg = load_mpt_config(model_dir)
    layers: list = [
        {
            "norm_1": {},
            "attn": {"Wqkv": {}, "out_proj": {}},
            "norm_2": {},
            "ffn": {"up_proj": {}, "down_proj": {}},
        }
        for _ in range(cfg.n_layers)
    ]
    params: Dict = {"layers": layers}
    for name, arr in _open_shards(model_dir):
        a = jnp.asarray(arr).astype(dtype)
        name = name.replace("transformer.", "")
        if name == "wte.weight":
            params["embed_tokens"] = a
        elif name.startswith("norm_f."):
            params.setdefault("norm_f", {})[name.split(".")[-1]] = a
        elif name == "lm_head.weight":
            params["lm_head"] = {"weight": a}
        elif name.startswith("blocks."):
            parts = name.split(".")
            li = int(parts[1])
            sub = parts[2]
            if sub in ("norm_1", "norm_2"):
                layers[li][sub][parts[3]] = a
            elif sub in ("attn", "ffn"):
                layers[li][sub][parts[3]][parts[4]] = a
    if "lm_head" not in params:
        params["lm_head"] = {"weight": params["embed_tokens"]}  # MPT ties weights
    return params


def load_falcon_config(model_dir: str):
    from dgq_tpu.models.falcon import FalconConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    n_head = hf.get("num_attention_heads", hf.get("n_head"))
    return FalconConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        num_hidden_layers=hf.get("num_hidden_layers", hf.get("n_layer")),
        num_attention_heads=n_head,
        num_kv_heads=1 if hf.get("multi_query", True) else n_head,
        rope_theta=hf.get("rope_theta", 10000.0),
        parallel_attn=hf.get("parallel_attn", True),
    )


def load_falcon_params(model_dir: str, dtype=jnp.bfloat16) -> Dict:
    cfg = load_falcon_config(model_dir)
    layers: list = [
        {
            "input_layernorm": {},
            "self_attention": {"query_key_value": {}, "dense": {}},
            "mlp": {"dense_h_to_4h": {}, "dense_4h_to_h": {}},
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    params: Dict = {"layers": layers}
    for name, arr in _open_shards(model_dir):
        a = jnp.asarray(arr).astype(dtype)
        name = name.replace("transformer.", "")
        if name == "word_embeddings.weight":
            params["embed_tokens"] = a
        elif name.startswith("ln_f."):
            params.setdefault("ln_f", {})[name.split(".")[-1]] = a
        elif name == "lm_head.weight":
            params["lm_head"] = {"weight": a}
        elif name.startswith("h."):
            parts = name.split(".")
            li = int(parts[1])
            sub = parts[2]
            if sub == "input_layernorm":
                layers[li][sub][parts[3]] = a
            elif sub in ("self_attention", "mlp"):
                layers[li][sub][parts[3]][parts[4]] = a
    if "lm_head" not in params:
        params["lm_head"] = {"weight": params["embed_tokens"]}
    return params


def load_mixtral_config(model_dir: str):
    from dgq_tpu.models.mixtral import MixtralConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    return MixtralConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get("num_key_value_heads", 8),
        num_local_experts=hf.get("num_local_experts", 8),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        rope_theta=hf.get("rope_theta", 1e6),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
    )


def load_mixtral_params(model_dir: str, dtype=jnp.bfloat16) -> Dict:
    """Read HF MixtralForCausalLM weights into the dgq_tpu params pytree.

    HF layout: ``model.layers.{i}.block_sparse_moe.gate.weight`` (router)
    and ``...block_sparse_moe.experts.{e}.{w1|w2|w3}.weight`` per expert;
    the attention half matches LLaMA."""
    cfg = load_mixtral_config(model_dir)
    layers: list = [
        {
            "input_layernorm": {},
            "self_attn": {"q_proj": {}, "k_proj": {}, "v_proj": {}, "o_proj": {}},
            "post_attention_layernorm": {},
            "block_sparse_moe": {
                "gate": {},
                "experts": [
                    {"w1": {}, "w3": {}, "w2": {}}
                    for _ in range(cfg.num_local_experts)
                ],
            },
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
            elif sub == "self_attn":
                layers[li][sub][parts[4]][parts[5]] = a
            elif sub == "block_sparse_moe":
                if parts[4] == "gate":
                    layers[li][sub]["gate"][parts[5]] = a
                elif parts[4] == "experts":
                    e = int(parts[5])
                    layers[li][sub]["experts"][e][parts[6]][parts[7]] = a
    if "lm_head" not in params:
        params["lm_head"] = {"weight": params["embed_tokens"]}
    return params
