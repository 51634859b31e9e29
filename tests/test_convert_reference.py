"""Reference-checkpoint conversion: synthesize reference-layout buffers from
a dgq_tpu PTQ result and verify the round trip reproduces logits."""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import QuantState, init_llama_params, llama_apply, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.quant.packing import unpack_nibbles
from dgq_tpu.utils.convert_reference import (
    _unpack_reference_nibbles,
    reference_linear_to_packed,
)
from dgq_tpu.utils.datautils import synthetic_stream
import pytest

pytestmark = pytest.mark.slow  # integration-heavy; fast gate: pytest -m 'not slow'


def _to_reference_buffers(pl, prefix):
    """Re-encode a PackedLinear into the reference's buffer layout
    (flattened pair-nibbles, (N*G,1) scales) — the inverse of the converter."""
    codes_kn = np.asarray(unpack_nibbles(pl.qweight, pl.span))  # (K, N)
    codes_nk = codes_kn.T.reshape(-1)  # flattened (out, in)
    hi = codes_nk[0::2].astype(np.int16)
    lo = codes_nk[1::2].astype(np.int16)
    qweight = (((hi << 4) | lo) & 0xFF).astype(np.uint8).view(np.int8)
    out = {
        f"{prefix}.qweight": qweight,
        f"{prefix}.wscales": np.asarray(pl.wscales).T.reshape(-1, 1),
        f"{prefix}.wzeros": np.asarray(pl.wzeros).T.reshape(-1, 1),
        f"{prefix}.amax": np.asarray(pl.amax),
    }
    if pl.w4w8:
        out[f"{prefix}.wscales8"] = np.asarray(pl.wscales8).reshape(-1, 1)
    return out


def test_reference_linear_roundtrip():
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512,
                            num_attention_heads=4, num_key_value_heads=4,
                            num_hidden_layers=1)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128))
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)

    pl = res.params["layers"][0]["self_attn"]["q_proj"]
    ref_bufs = _to_reference_buffers(pl, "model.layers.0.self_attn.q_proj")
    back = reference_linear_to_packed(
        ref_bufs, "model.layers.0.self_attn.q_proj",
        pl.out_features, pl.in_features, pl.groupsize,
    )
    np.testing.assert_array_equal(np.asarray(back.qweight), np.asarray(pl.qweight))
    np.testing.assert_array_equal(np.asarray(back.wscales), np.asarray(pl.wscales))
    np.testing.assert_array_equal(np.asarray(back.wzeros), np.asarray(pl.wzeros))
    np.testing.assert_allclose(
        np.asarray(back.wscales8), np.asarray(pl.wscales8), rtol=1e-2
    )
    assert float(back.amax) == float(pl.amax)


def test_full_reference_checkpoint_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    from dgq_tpu.utils.convert_reference import convert_reference_llama

    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512,
                            num_attention_heads=4, num_key_value_heads=4,
                            num_hidden_layers=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(1))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       kvquant=True, smoothquant=True)
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)

    # synthesize the reference state_dict
    tensors = {}
    for li, layer in enumerate(res.params["layers"]):
        pre = f"model.layers.{li}."
        tensors[pre + "input_layernorm.weight"] = np.asarray(layer["input_layernorm"]["weight"], np.float32)
        tensors[pre + "post_attention_layernorm.weight"] = np.asarray(
            layer["post_attention_layernorm"]["weight"], np.float32
        )
        for sub, names in (("self_attn", ("q_proj", "k_proj", "v_proj", "o_proj")),
                           ("mlp", ("gate_proj", "up_proj", "down_proj"))):
            for nm in names:
                tensors.update(_to_reference_buffers(layer[sub][nm], pre + f"{sub}.{nm}"))
        kv = res.kv_scales[li]
        tensors[pre + "self_attn.q_quant.scale"] = np.asarray(kv.q_scale, np.float32)
        tensors[pre + "self_attn.k_quant.scale"] = np.asarray(kv.k_scale, np.float32)
        tensors[pre + "self_attn.v_quant.scale"] = np.asarray(kv.v_scale, np.float32)
    tensors["model.embed_tokens.weight"] = np.asarray(params["embed_tokens"], np.float32)
    tensors["model.norm.weight"] = np.asarray(params["norm"]["weight"], np.float32)
    tensors["lm_head.weight"] = np.asarray(params["lm_head"]["weight"], np.float32)

    path = str(tmp_path / "reference_ckpt.safetensors")
    save_file(tensors, path)

    conv_params, conv_kv = convert_reference_llama(path, cfg)

    ids = calib[:1]
    qs = QuantState(actq=True, wtq=True, kv=True)
    want = np.asarray(llama_apply(res.params, ids, cfg, qs, res.kv_scales))
    got = np.asarray(llama_apply(conv_params, ids, cfg, qs, conv_kv))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
