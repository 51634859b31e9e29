"""Mid-calibration checkpoint/resume.

The reference checkpoints only the terminal state; a crash mid-PTQ means a
full rerun (SURVEY §5: "No mid-calibration resume").  Here the driver saves,
after every completed block: the packed layers so far, the kv scales, and
the running calibration activations (``inps``, the only dataflow a resume
needs — everything upstream is already folded into the packed layers).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import jax.numpy as jnp

from dgq_tpu.models.llama import KVQuantState
from dgq_tpu.utils.checkpoint import _flatten, _insert, _listify, _packed_prefix
from dgq_tpu.quant.packing import PackedLinear

_STATE_FILE = "ptq_state.safetensors"
_META_FILE = "ptq_state.json"


def save_ptq_state(resume_dir: str, next_layer: int, layers: List, kv_scales: List, inps):
    from safetensors.flax import save_file

    os.makedirs(resume_dir, exist_ok=True)
    tensors = {}
    meta = {"next_layer": next_layer, "packed": {}, "kv": []}
    for i, layer in enumerate(layers):
        _flatten(layer, f"layers.{i}", tensors, meta["packed"])
    for i, kv in enumerate(kv_scales):
        meta["kv"].append(kv is not None)
        if kv is not None:
            tensors[f"kv.{i}.q_scale"] = jnp.asarray(kv.q_scale)
            tensors[f"kv.{i}.k_scale"] = jnp.asarray(kv.k_scale)
            tensors[f"kv.{i}.v_scale"] = jnp.asarray(kv.v_scale)
    tensors["inps"] = jnp.asarray(inps)
    tmp = os.path.join(resume_dir, _STATE_FILE + ".tmp")
    save_file({k: jnp.asarray(v) for k, v in tensors.items()}, tmp)
    os.replace(tmp, os.path.join(resume_dir, _STATE_FILE))
    with open(os.path.join(resume_dir, _META_FILE), "w") as f:
        json.dump(meta, f)


def load_ptq_state(resume_dir: str) -> Optional[Tuple[int, List, List, jnp.ndarray]]:
    """(next_layer, layers, kv_scales, inps) or None when no state exists."""
    from safetensors.flax import load_file

    path = os.path.join(resume_dir, _STATE_FILE)
    meta_path = os.path.join(resume_dir, _META_FILE)
    if not (os.path.exists(path) and os.path.exists(meta_path)):
        return None
    with open(meta_path) as f:
        meta = json.load(f)
    tensors = load_file(path)

    nested: dict = {}
    packed_groups: dict = {}
    kv_raw: dict = {}
    inps = None
    for key, arr in tensors.items():
        if key == "inps":
            inps = arr
            continue
        if key.startswith("kv."):
            _, idx, field = key.split(".")
            kv_raw.setdefault(int(idx), {})[field] = arr
            continue
        prefix = _packed_prefix(key, meta["packed"])
        if prefix is not None:
            packed_groups.setdefault(prefix, {})[key[len(prefix) + 1 :]] = arr
        else:
            _insert(nested, key.split("."), arr)

    for prefix, fields in packed_groups.items():
        m = meta["packed"][prefix]
        pl = PackedLinear(
            qweight=fields["qweight"],
            wscales=fields["wscales"],
            wzeros=fields["wzeros"],
            wscales8=fields.get("wscales8"),
            bias=fields.get("bias"),
            amax=fields.get("amax"),
            in_features=m["in_features"],
            out_features=m["out_features"],
            groupsize=m["groupsize"],
            w4w8=m["w4w8"],
            act_method=m["act_method"],
            abits=m["abits"],
            span=m.get("span", 0),
        )
        _insert(nested, prefix.split("."), pl)

    layers = _listify(nested).get("layers", []) if nested else []
    kv_scales = [
        KVQuantState(**kv_raw[i]) if present else None
        for i, present in enumerate(meta["kv"])
    ]
    return meta["next_layer"], layers, kv_scales, inps
