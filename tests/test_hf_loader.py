"""HF checkpoint ingestion round-trips: save a tiny HF model to disk,
ingest, compare logits."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_llama_hf_dir_roundtrip(tmp_path):
    import torch
    from transformers import LlamaConfig as HFConfig
    from transformers.models.llama.modeling_llama import LlamaForCausalLM

    from dgq_tpu.models.hf_loader import load_llama_config, load_llama_params
    from dgq_tpu.models.llama import llama_apply

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_llama_config(str(tmp_path))
    params = load_llama_params(str(tmp_path), dtype=jnp.float32)
    assert cfg.hidden_size == 64 and cfg.num_hidden_layers == 2

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(llama_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_opt_hf_dir_roundtrip(tmp_path):
    import torch
    from transformers import OPTConfig as HFConfig
    from transformers.models.opt.modeling_opt import OPTForCausalLM

    from dgq_tpu.models.hf_loader import load_opt_config, load_opt_params
    from dgq_tpu.models.opt import opt_apply

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256,
        word_embed_proj_dim=64, dropout=0.0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_opt_config(str(tmp_path))
    params = load_opt_params(str(tmp_path), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(1, 10)).astype(np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(opt_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_bloom_hf_dir_roundtrip(tmp_path):
    import torch
    from transformers import BloomConfig as HFConfig
    from transformers.models.bloom.modeling_bloom import BloomForCausalLM

    from dgq_tpu.models.hf_loader import load_bloom_config, load_bloom_params
    from dgq_tpu.models.bloom import bloom_apply

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, n_layer=2, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = BloomForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_bloom_config(str(tmp_path))
    params = load_bloom_params(str(tmp_path), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 128, size=(1, 9)).astype(np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(bloom_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def test_mpt_hf_dir_roundtrip(tmp_path):
    import torch
    from transformers import MptConfig as HFConfig
    from transformers.models.mpt.modeling_mpt import MptForCausalLM

    from dgq_tpu.models.hf_loader import load_mpt_config, load_mpt_params
    from dgq_tpu.models.mpt import mpt_apply

    hf_cfg = HFConfig(vocab_size=128, d_model=64, n_heads=4, n_layers=2,
                      expansion_ratio=4, max_seq_len=256, attn_implementation="eager")
    torch.manual_seed(0)
    model = MptForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_mpt_config(str(tmp_path))
    params = load_mpt_params(str(tmp_path), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 128, size=(1, 11)).astype(np.int32)
    import torch as _t
    with _t.no_grad():
        want = model(_t.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(mpt_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_falcon_hf_dir_roundtrip(tmp_path):
    import torch
    from transformers import FalconConfig as HFConfig
    from transformers.models.falcon.modeling_falcon import FalconForCausalLM

    from dgq_tpu.models.hf_loader import load_falcon_config, load_falcon_params
    from dgq_tpu.models.falcon import falcon_apply

    hf_cfg = HFConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, new_decoder_architecture=False,
                      multi_query=True, parallel_attn=True, bias=False,
                      alibi=False, attn_implementation="eager")
    torch.manual_seed(0)
    model = FalconForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_falcon_config(str(tmp_path))
    params = load_falcon_params(str(tmp_path), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ids = rng.integers(0, 128, size=(1, 13)).astype(np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(falcon_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_mixtral_hf_dir_roundtrip(tmp_path):
    import torch
    from transformers import MixtralConfig as HFConfig
    from transformers.models.mixtral.modeling_mixtral import MixtralForCausalLM

    from dgq_tpu.models.hf_loader import load_mixtral_config, load_mixtral_params
    from dgq_tpu.models.mixtral import mixtral_apply

    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = MixtralForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    cfg = load_mixtral_config(str(tmp_path))
    params = load_mixtral_params(str(tmp_path), dtype=jnp.float32)
    assert cfg.num_local_experts == 4 and cfg.num_experts_per_tok == 2
    assert len(params["layers"][0]["block_sparse_moe"]["experts"]) == 4

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    with torch.no_grad():
        want = model(torch.tensor(ids.astype(np.int64))).logits.numpy()
    got = np.asarray(mixtral_apply(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
