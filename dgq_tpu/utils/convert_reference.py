"""Convert reference-DGQ quantized checkpoints to the dgq_tpu schema.

The reference saves a torch state_dict to safetensors after PTQ
(reference: dgq/entry.py:101-106) with, per QuantLinear
(quant_linear.py:87-91, 110-144):

  {prefix}.qweight   int8 (out*in/2,)  nibble pairs along the flattened
                                       (out, in) rows: byte = hi(2j)<<4 | lo(2j+1)
  {prefix}.wscales   int8 (out*G, 1)   [w4w8] integer group scales
  {prefix}.wzeros    int8 (out*G, 1)
  {prefix}.wscales8  bf16/f16 (out, 1) per-channel fp scale
  {prefix}.amax      bf16 ()           static activation absmax
  {prefix}.bias      f16 (out,)        optional

plus per attention module the calibrated kv quantizers
({attn}.q_quant.scale / .zero, kvquanter.py:353-364).

This module re-packs those buffers into the TPU-native span layout
(PackedLinear) and extracts KVQuantState per layer, so a checkpoint
produced by `python -m dgq.entry ... --save_safetensors` runs here
unchanged — fake-quant eval, the INT8 engine, serving, sharding.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.llama import KVQuantState
from dgq_tpu.quant.packing import PackedLinear, pack_nibbles


def _unpack_reference_nibbles(qweight_flat: np.ndarray, out_f: int, in_f: int) -> np.ndarray:
    """Reference python_compress layout -> (out, in) integer codes.

    byte j packs code[2j] in the high nibble, code[2j+1] in the low
    (reference: quant_linear.py:8-13), pairs adjacent along the flattened
    (out, in) row order."""
    ub = qweight_flat.astype(np.int16) & 0xFF
    hi = (ub >> 4).astype(np.uint8)
    lo = (ub & 0xF).astype(np.uint8)
    codes = np.empty(out_f * in_f, np.uint8)
    codes[0::2] = hi
    codes[1::2] = lo
    return codes.reshape(out_f, in_f)


def reference_linear_to_packed(
    tensors: Dict[str, np.ndarray],
    prefix: str,
    out_features: int,
    in_features: int,
    groupsize: int = 128,
    act_method: str = "static",
) -> PackedLinear:
    """One reference QuantLinear buffer set -> span-packed PackedLinear."""
    qweight = np.asarray(tensors[f"{prefix}.qweight"]).reshape(-1)
    codes = _unpack_reference_nibbles(qweight, out_features, in_features)  # (N, K)
    g = in_features // groupsize

    w4w8 = f"{prefix}.wscales8" in tensors
    wscales = np.asarray(tensors[f"{prefix}.wscales"]).reshape(out_features, g)
    wzeros = np.asarray(tensors[f"{prefix}.wzeros"]).reshape(out_features, g)

    codes_kn = jnp.asarray(codes.T.astype(np.int8))  # (K, N)
    span = 2 * groupsize if in_features % (2 * groupsize) == 0 else 0
    packed = pack_nibbles(codes_kn, span)

    bias = tensors.get(f"{prefix}.bias")
    amax = tensors.get(f"{prefix}.amax")
    common = dict(
        qweight=packed,
        bias=None if bias is None else jnp.asarray(np.asarray(bias, np.float32)),
        amax=None if amax is None else jnp.asarray(np.asarray(amax, np.float32).reshape(())),
        in_features=in_features,
        out_features=out_features,
        groupsize=groupsize,
        act_method=act_method,
        span=span,
    )
    if w4w8:
        scale8 = np.asarray(tensors[f"{prefix}.wscales8"], np.float32).reshape(out_features)
        return PackedLinear(
            wscales=jnp.asarray(wscales.astype(np.int8).T),  # (G, N)
            wzeros=jnp.asarray(wzeros.astype(np.int8).T),
            wscales8=jnp.asarray(scale8),
            w4w8=True,
            **common,
        )
    return PackedLinear(
        wscales=jnp.asarray(wscales.astype(np.float32).T),
        wzeros=jnp.asarray(wzeros.astype(np.float32).T),
        wscales8=None,
        w4w8=False,
        **common,
    )


_LLAMA_LINEAR_DIMS = {
    "self_attn.q_proj": ("nq", "d"),
    "self_attn.k_proj": ("nkv", "d"),
    "self_attn.v_proj": ("nkv", "d"),
    "self_attn.o_proj": ("d", "nq"),
    "mlp.gate_proj": ("f", "d"),
    "mlp.up_proj": ("f", "d"),
    "mlp.down_proj": ("d", "f"),
}


def convert_reference_llama(
    path: str,
    cfg,
    groupsize: int = 128,
    act_method: str = "static",
):
    """Load a reference --save_safetensors LLaMA checkpoint -> (params,
    kv_scales) in dgq_tpu form.  ``cfg`` is the matching LlamaConfig."""
    from safetensors import safe_open

    tensors: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="flax") as f:
        for name in f.keys():
            tensors[name] = np.asarray(f.get_tensor(name))

    d = cfg.hidden_size
    dims = {
        "d": d,
        "f": cfg.intermediate_size,
        "nq": cfg.num_attention_heads * cfg.head_dim,
        "nkv": cfg.num_key_value_heads * cfg.head_dim,
    }

    layers: List[dict] = []
    kv_scales: List[Optional[KVQuantState]] = []
    for li in range(cfg.num_hidden_layers):
        pre = f"model.layers.{li}."
        layer = {
            "input_layernorm": {"weight": jnp.asarray(tensors[pre + "input_layernorm.weight"])},
            "post_attention_layernorm": {
                "weight": jnp.asarray(tensors[pre + "post_attention_layernorm.weight"])
            },
            "self_attn": {},
            "mlp": {},
        }
        for lname, (od, idm) in _LLAMA_LINEAR_DIMS.items():
            sub, leaf = lname.split(".")
            layer[sub][leaf] = reference_linear_to_packed(
                tensors, pre + lname, dims[od], dims[idm], groupsize, act_method
            )
        qk = pre + "self_attn.q_quant.scale"
        if qk in tensors:
            kv_scales.append(
                KVQuantState(
                    q_scale=jnp.asarray(np.asarray(tensors[qk], np.float32).reshape(())),
                    k_scale=jnp.asarray(
                        np.asarray(tensors[pre + "self_attn.k_quant.scale"], np.float32).reshape(())
                    ),
                    v_scale=jnp.asarray(
                        np.asarray(tensors[pre + "self_attn.v_quant.scale"], np.float32).reshape(())
                    ),
                )
            )
        else:
            kv_scales.append(None)
        layers.append(layer)

    params = {
        "embed_tokens": jnp.asarray(tensors["model.embed_tokens.weight"]),
        "layers": layers,
        "norm": {"weight": jnp.asarray(tensors["model.norm.weight"])},
        "lm_head": {"weight": jnp.asarray(tensors["lm_head.weight"])},
    }
    return params, kv_scales
