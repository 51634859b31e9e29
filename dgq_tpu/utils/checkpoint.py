"""Quantized checkpoint I/O.

The reference serializes the torch state_dict to safetensors with buffer
dtype/shape mismatch recovery at load (reference: dgq/entry.py:101-109,
dgq/utils/loadutils.py:8-38 — the recovery papers over init-time dtype bugs,
SURVEY §5).  Here the on-disk schema is explicit and stable:

  * one safetensors file with flat keys
    (``layers.{i}.self_attn.q_proj.qweight`` etc.),
  * a sidecar JSON manifest carrying the static metadata (model config,
    quant config, per-linear shapes/groupsize/w4w8/act_method, kv scales are
    stored as arrays under ``kv_scales.{i}.{q,k,v}_scale``).

Arrays round-trip via safetensors' flax API (handles bf16/int8 natively).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.llama import KVQuantState, LlamaConfig
from dgq_tpu.quant.packing import PackedLinear

_PACKED_FIELDS = ("qweight", "wscales", "wzeros", "wscales8", "bias", "amax")


def _flatten(params, prefix: str, out: Dict[str, Any], meta: Dict[str, Any]):
    if isinstance(params, PackedLinear):
        meta[prefix] = {
            "kind": "packed_linear",
            "in_features": params.in_features,
            "out_features": params.out_features,
            "groupsize": params.groupsize,
            "w4w8": params.w4w8,
            "act_method": params.act_method,
            "abits": params.abits,
            "span": params.span,
            "wbits": params.wbits,
        }
        for f in _PACKED_FIELDS:
            v = getattr(params, f)
            if v is not None:
                out[f"{prefix}.{f}"] = v
        return
    if isinstance(params, dict):
        for k, v in params.items():
            _flatten(v, f"{prefix}.{k}" if prefix else k, out, meta)
        return
    if isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            _flatten(v, f"{prefix}.{i}", out, meta)
        return
    out[prefix] = jnp.asarray(params)


def save_quantized(
    path: str,
    params,
    cfg: LlamaConfig,
    qcfg: QuantConfig,
    kv_scales: Optional[List[Optional[KVQuantState]]] = None,
    arch: str = "llama",
):
    from safetensors.flax import save_file

    tensors: Dict[str, Any] = {}
    meta: Dict[str, Any] = {}
    _flatten(params, "", tensors, meta)
    if kv_scales is not None:
        for i, kv in enumerate(kv_scales):
            if kv is None:
                continue
            tensors[f"kv_scales.{i}.q_scale"] = jnp.asarray(kv.q_scale)
            tensors[f"kv_scales.{i}.k_scale"] = jnp.asarray(kv.k_scale)
            tensors[f"kv_scales.{i}.v_scale"] = jnp.asarray(kv.v_scale)
    manifest = {
        "format_version": 1,
        "arch": arch,
        "model_config": dataclasses.asdict(cfg),
        "quant_config": _qcfg_to_dict(qcfg),
        "packed": meta,
        "num_layers": cfg.num_hidden_layers,
    }
    save_file({k: jnp.asarray(v) for k, v in tensors.items()}, path)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f, indent=1)


def _qcfg_to_dict(qcfg: QuantConfig) -> dict:
    return {
        "act_quant": None if qcfg.act_quant is None else dataclasses.asdict(qcfg.act_quant),
        "wt_quant": None if qcfg.wt_quant is None else dataclasses.asdict(qcfg.wt_quant),
        "smoothquant": qcfg.smoothquant,
        "meanact": qcfg.meanact,
        "kvquant": qcfg.kvquant,
        "nsamples": qcfg.nsamples,
        "seqlen": qcfg.seqlen,
    }


def _qcfg_from_dict(d: dict) -> QuantConfig:
    return QuantConfig(
        act_quant=None if d["act_quant"] is None else ActQuantConfig(**d["act_quant"]),
        wt_quant=None if d["wt_quant"] is None else WtQuantConfig(**d["wt_quant"]),
        smoothquant=d["smoothquant"],
        meanact=d["meanact"],
        kvquant=d["kvquant"],
        nsamples=d.get("nsamples", 32),
        seqlen=d.get("seqlen", 2048),
    )


def _config_cls(arch: str):
    """Model-config dataclass for an arch name (manifest round-trip)."""
    if arch == "llama":
        return LlamaConfig
    if arch == "opt":
        from dgq_tpu.models.opt import OPTConfig
        return OPTConfig
    if arch == "bloom":
        from dgq_tpu.models.bloom import BloomConfig
        return BloomConfig
    if arch == "mpt":
        from dgq_tpu.models.mpt import MPTConfig
        return MPTConfig
    if arch == "falcon":
        from dgq_tpu.models.falcon import FalconConfig
        return FalconConfig
    if arch == "mixtral":
        from dgq_tpu.models.mixtral import MixtralConfig
        return MixtralConfig
    raise ValueError(f"unknown arch {arch!r}")


def load_quantized(path: str):
    """Returns (params, cfg, qcfg, kv_scales)."""
    from safetensors.flax import load_file

    tensors = load_file(path)
    with open(path + ".json") as f:
        manifest = json.load(f)
    cfg = _config_cls(manifest.get("arch", "llama"))(**manifest["model_config"])
    qcfg = _qcfg_from_dict(manifest["quant_config"])
    packed_meta = manifest["packed"]

    # rebuild nested structure
    nested: Dict[str, Any] = {}
    packed_groups: Dict[str, Dict[str, Any]] = {}
    kv_raw: Dict[int, Dict[str, Any]] = {}
    for key, arr in tensors.items():
        if key.startswith("kv_scales."):
            _, idx, field = key.split(".")
            kv_raw.setdefault(int(idx), {})[field] = arr
            continue
        # match longest packed prefix
        prefix = _packed_prefix(key, packed_meta)
        if prefix is not None:
            packed_groups.setdefault(prefix, {})[key[len(prefix) + 1 :]] = arr
        else:
            _insert(nested, key.split("."), arr)

    for prefix, fields in packed_groups.items():
        m = packed_meta[prefix]
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
            wbits=m.get("wbits", 4),
        )
        _insert(nested, prefix.split("."), pl)

    params = _listify(nested)
    kv_scales: List[Optional[KVQuantState]] = []
    for i in range(manifest["num_layers"]):
        if i in kv_raw:
            kv_scales.append(KVQuantState(**kv_raw[i]))
        else:
            kv_scales.append(None)
    return params, cfg, qcfg, kv_scales


def _packed_prefix(key: str, packed_meta: Dict[str, Any]) -> Optional[str]:
    parts = key.split(".")
    for cut in range(len(parts) - 1, 0, -1):
        prefix = ".".join(parts[:cut])
        if prefix in packed_meta:
            return prefix
    return None


def _insert(tree: Dict, parts: List[str], value):
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def _listify(tree):
    """Convert {'0': .., '1': ..} dicts back into lists."""
    if isinstance(tree, dict):
        keys = list(tree.keys())
        if keys and all(k.isdigit() for k in keys):
            return [_listify(tree[str(i)]) for i in range(len(keys))]
        return {k: _listify(v) for k, v in tree.items()}
    return tree


def save_engine(path: str, eng, cfg, arch: str = "llama"):
    """Serialize converted engine params directly (fused/padded/pre-replicated
    buffers), so serving startup skips the PTQ-result -> engine conversion.
    Works for every engine family (llama ``EngineParams``, opt/bloom
    ``*EngineParams`` NamedTuples); pass ``arch`` so load can reconstruct."""
    import dataclasses as _dc

    from safetensors.flax import save_file

    tensors: Dict[str, Any] = {}
    leaves, treedef = __import__("jax").tree_util.tree_flatten_with_path(eng)
    for path_keys, leaf in leaves:
        key = "/".join(str(getattr(k, "name", getattr(k, "key", getattr(k, "idx", k)))) for k in path_keys)
        tensors[key] = leaf
    save_file(tensors, path)
    manifest = {
        "format_version": 1,
        "kind": "engine",
        "arch": arch,
        "model_config": _dc.asdict(cfg),
    }
    if hasattr(eng, "rms_eps"):
        manifest["rms_eps"] = eng.rms_eps
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)


def save_engine_sharded(path: str, eng, cfg, arch: str = "llama"):
    """Sharded engine checkpoint via orbax/tensorstore (OCDBT format) —
    SURVEY §5's "sharded packed-weight checkpoints (orbax/tensorstore)".

    Unlike ``save_engine`` (one safetensors file serialized by one process,
    the reference's model: dgq/entry.py:101-109), every participating host
    writes only the array shards it owns, so saving a TP/DP-sharded engine
    never gathers the model onto a single host.  ``path`` is a directory;
    static metadata (arch, model config, rms_eps) goes in ``<path>.json``.
    """
    import dataclasses as _dc

    import jax as _jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ck = ocp.StandardCheckpointer()
    ck.save(path, eng, force=True)
    ck.wait_until_finished()
    if _jax.process_index() == 0:
        manifest: Dict[str, Any] = {
            "format_version": 1,
            "kind": "engine_sharded",
            "arch": arch,
            "model_config": _dc.asdict(cfg),
        }
        if hasattr(eng, "rms_eps"):
            manifest["rms_eps"] = eng.rms_eps
        with open(path + ".json", "w") as f:
            json.dump(manifest, f)


def _namedtuple_from_nested(cls, d: dict):
    """NamedTuple pytree from orbax's nested-dict restoration (Optional
    fields saved as None come back as None)."""
    import sys
    import typing

    hints = typing.get_type_hints(cls, vars(sys.modules[cls.__module__]))
    vals = {}
    for name in cls._fields:
        t = hints.get(name)
        v = d.get(name)
        if (isinstance(t, type) and issubclass(t, tuple)
                and hasattr(t, "_fields") and v is not None):
            vals[name] = _namedtuple_from_nested(t, v)
        else:
            vals[name] = v
    return cls(**vals)


def load_engine_sharded(path: str, mesh=None):
    """(engine params, model config) from a ``save_engine_sharded`` dir.

    With ``mesh``, every leaf is restored DIRECTLY into its tensor-parallel
    sharding (parallel.sharded_engine.engine_param_specs): each host reads
    only the shards it will own, and no host ever materializes the full
    model — the multi-host restore path for BASELINE config 5.  The
    returned params are CANONICAL (not rank-block permuted): pass them to
    ``shard_engine_params`` / ``ContinuousBatcher(mesh=...)`` exactly like
    host-loaded params; the permutation then runs as a cheap on-device
    reshuffle.  Mesh-sharded restore is llama-only (the spec tree is
    defined for ``EngineParams``)."""
    import jax as _jax
    import orbax.checkpoint as ocp

    from dgq_tpu.models.engine import EngineLayer, EngineParams

    path = os.path.abspath(path)
    with open(path + ".json") as f:
        manifest = json.load(f)
    arch = manifest.get("arch", "llama")
    ck = ocp.StandardCheckpointer()
    if mesh is None:
        restored = ck.restore(path)
    else:
        if arch != "llama":
            raise NotImplementedError(
                f"mesh-sharded restore is llama-only (arch={arch}); "
                "load with mesh=None and shard with family-specific specs"
            )
        from jax.sharding import NamedSharding

        from dgq_tpu.parallel.sharded_engine import _spec_for_path

        meta = ck.metadata(path).item_metadata.tree

        def leaf_abstract(p, m):
            if m is None:
                return None
            if getattr(m, "shape", None) is None:  # python scalar leaf
                return 0.0
            return _jax.ShapeDtypeStruct(
                m.shape, m.dtype, sharding=NamedSharding(mesh, _spec_for_path(p))
            )

        abstract = _jax.tree_util.tree_map_with_path(leaf_abstract, meta)
        restored = ck.restore(path, abstract)

    if arch == "llama":
        cfg = LlamaConfig(**manifest["model_config"])
        eng = EngineParams(
            embed_tokens=restored["embed_tokens"],
            layers=_namedtuple_from_nested(EngineLayer, restored["layers"]),
            norm_weight=restored["norm_weight"],
            lm_head=restored["lm_head"],
            rms_eps=manifest.get("rms_eps", 1e-5),
        )
        return eng, cfg
    if arch == "opt":
        from dgq_tpu.models.opt import OPTConfig
        from dgq_tpu.models.opt_engine import OPTEngineParams

        return (_namedtuple_from_nested(OPTEngineParams, restored),
                OPTConfig(**manifest["model_config"]))
    if arch == "bloom":
        from dgq_tpu.models.bloom import BloomConfig
        from dgq_tpu.models.bloom_engine import BloomEngineParams

        return (_namedtuple_from_nested(BloomEngineParams, restored),
                BloomConfig(**manifest["model_config"]))
    if arch == "mpt":
        from dgq_tpu.models.mpt import MPTConfig
        from dgq_tpu.models.mpt_engine import MPTEngineParams

        return (_namedtuple_from_nested(MPTEngineParams, restored),
                MPTConfig(**manifest["model_config"]))
    if arch == "falcon":
        from dgq_tpu.models.falcon import FalconConfig
        from dgq_tpu.models.falcon_engine import FalconEngineParams

        return (_namedtuple_from_nested(FalconEngineParams, restored),
                FalconConfig(**manifest["model_config"]))
    if arch == "mixtral":
        from dgq_tpu.models.mixtral import MixtralConfig
        from dgq_tpu.models.mixtral_engine import MixtralEngineParams

        return (_namedtuple_from_nested(MixtralEngineParams, restored),
                MixtralConfig(**manifest["model_config"]))
    raise ValueError(f"unknown arch {arch!r}")


def load_engine_any(path: str, mesh=None):
    """Engine-checkpoint loader dispatch: a directory is an orbax
    ``save_engine_sharded`` checkpoint (``mesh`` restores leaves directly
    into their TP shardings), a file is a ``save_engine`` safetensors
    checkpoint (``mesh`` ignored; shard after load)."""
    if os.path.isdir(path):
        return load_engine_sharded(path, mesh=mesh)
    return load_engine(path)


def _rebuild_namedtuple(cls, tensors, prefix: str = ""):
    """Reconstruct a (possibly nested) NamedTuple pytree from flat
    ``a/b/c``-keyed tensors; missing keys (Optional fields saved as None)
    come back as None."""
    import sys
    import typing

    hints = typing.get_type_hints(cls, vars(sys.modules[cls.__module__]))
    vals = {}
    for name in cls._fields:
        key = f"{prefix}{name}"
        t = hints.get(name)
        if isinstance(t, type) and issubclass(t, tuple) and hasattr(t, "_fields"):
            vals[name] = _rebuild_namedtuple(t, tensors, key + "/")
        else:
            vals[name] = tensors.get(key)
    return cls(**vals)


def load_engine(path: str):
    """(engine params, model config) from a save_engine checkpoint; the
    engine family is read from the manifest's ``arch``."""
    import jax as _jax

    from safetensors.flax import load_file

    from dgq_tpu.models.engine import EngineLayer, EngineLinear, EngineParams

    tensors = load_file(path)
    with open(path + ".json") as f:
        manifest = json.load(f)
    arch = manifest.get("arch", "llama")
    if arch == "opt":
        from dgq_tpu.models.opt import OPTConfig
        from dgq_tpu.models.opt_engine import OPTEngineParams

        return _rebuild_namedtuple(OPTEngineParams, tensors), OPTConfig(**manifest["model_config"])
    if arch == "bloom":
        from dgq_tpu.models.bloom import BloomConfig
        from dgq_tpu.models.bloom_engine import BloomEngineParams

        return _rebuild_namedtuple(BloomEngineParams, tensors), BloomConfig(**manifest["model_config"])
    if arch == "mpt":
        from dgq_tpu.models.mpt import MPTConfig
        from dgq_tpu.models.mpt_engine import MPTEngineParams

        return _rebuild_namedtuple(MPTEngineParams, tensors), MPTConfig(**manifest["model_config"])
    if arch == "falcon":
        from dgq_tpu.models.falcon import FalconConfig
        from dgq_tpu.models.falcon_engine import FalconEngineParams

        return _rebuild_namedtuple(FalconEngineParams, tensors), FalconConfig(**manifest["model_config"])
    if arch == "mixtral":
        from dgq_tpu.models.mixtral import MixtralConfig
        from dgq_tpu.models.mixtral_engine import MixtralEngineParams

        return (_rebuild_namedtuple(MixtralEngineParams, tensors),
                MixtralConfig(**manifest["model_config"]))
    cfg = LlamaConfig(**manifest["model_config"])

    def lin(prefix: str) -> EngineLinear:
        ws = tensors[f"{prefix}/wscales"]
        wz = tensors[f"{prefix}/wzeros"]
        # compact per-plane scale rows for the plane-dot decode kernels:
        # derive from the 8x-replicated copies when the checkpoint predates
        # them (group g sits at replicated rows 8g..8g+7, so even planes are
        # rows 0::16 and odd planes rows 8::16); int8 scales only — the
        # fp-scale representation has no plane-dot path
        derive = ws.dtype == jnp.int8 if hasattr(ws, "dtype") else False
        return EngineLinear(
            # rp-only checkpoints (from_ptq keep_span=False) have no span copy
            qweight=tensors.get(f"{prefix}/qweight"),
            wscales=ws,
            wzeros=wz,
            alpha=tensors[f"{prefix}/alpha"],
            bias=tensors.get(f"{prefix}/bias"),
            s_hi=tensors.get(f"{prefix}/s_hi", ws[..., 0::16, :] if derive else None),
            s_lo=tensors.get(f"{prefix}/s_lo", ws[..., 8::16, :] if derive else None),
            z_hi=tensors.get(f"{prefix}/z_hi", wz[..., 0::16, :] if derive else None),
            z_lo=tensors.get(f"{prefix}/z_lo", wz[..., 8::16, :] if derive else None),
            qw_rp=tensors.get(f"{prefix}/qw_rp"),
            cs_fold=tensors.get(f"{prefix}/cs_fold"),
        )

    layers = EngineLayer(
        ln1_weight=tensors["layers/ln1_weight"],
        ln1_bias=tensors.get("layers/ln1_bias"),
        ln2_weight=tensors["layers/ln2_weight"],
        ln2_bias=tensors.get("layers/ln2_bias"),
        qkv_proj=lin("layers/qkv_proj"),
        o_proj=lin("layers/o_proj"),
        gate_up_proj=lin("layers/gate_up_proj"),
        down_proj=lin("layers/down_proj"),
        q_scale=tensors["layers/q_scale"],
        k_scale=tensors["layers/k_scale"],
        v_scale=tensors["layers/v_scale"],
        out_input_scale=tensors["layers/out_input_scale"],
        down_input_scale=tensors["layers/down_input_scale"],
    )
    eng = EngineParams(
        embed_tokens=tensors["embed_tokens"],
        layers=layers,
        norm_weight=tensors["norm_weight"],
        lm_head=tensors["lm_head"],
        rms_eps=manifest["rms_eps"],
    )
    # checkpoints predating the native-s4 decode buffers: derive them
    from dgq_tpu.models.engine import add_rowpair

    return add_rowpair(eng), cfg
