"""Expert-parallel (ep) execution for the sparse-MoE (Mixtral) engine.

The reference (ilur98/DGQ) has no MoE models and no distributed layer at
all (SURVEY §2.3); this module is the expert-parallelism axis the Mixtral
family was designed for (models/mixtral_engine.py docstring): the stacked
per-expert weights lead with an E axis, and ep sharding is nothing more
than slicing that axis over an 'ep' mesh dimension.

Design (dense-over-local-experts + one psum):

  * every leaf of ``layer.w13`` / ``layer.w2`` is stacked (L, E, ...) —
    spec ``P(None, 'ep', ...)`` hands each device E/ep whole experts.  No
    all-to-all token dispatch: tokens stay where they are (replicated over
    ep), each rank runs its local experts dense, masks by the GLOBAL
    expert index (``_moe_tail`` reads ``lax.axis_index('ep')``), and ONE
    psum over 'ep' combines the block output.  For decode-sized batches
    this is the right TPU shape: an all-to-all would move activations to
    save re-compute that the masked-dense form never does anyway (every
    local expert GEMM is needed — the mask only zeroes the combine), and
    the single psum rides ICI.
  * the router (``gate_weight``, (L, E, D)) is REPLICATED: routing is a
    D×E-tiny GEMM + top-k, and every rank needs the full (B, S, E) weight
    matrix to build its local combine mask.  Sharding it would force an
    all-gather of logits for exactly zero FLOP savings.
  * the per-expert requant scales (``w2_input_scale``, (L, E)) shard with
    their experts; attention + norms + embeddings are replicated over ep
    (the 'dp' axis shards the batch through attention as usual).

Exactness: routing is bit-identical to the dense engine (replicated input,
replicated router).  The combined block output differs from the dense
loop only in fp32 summation order (local partial sums + psum vs the
sequential E-term loop), so logits are allclose, and the INT8 KV cache —
written by the replicated attention half — is bit-identical.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgq_tpu.models.mixtral_engine import (
    MixtralEngineConfig,
    MixtralEngineParams,
    MixtralKVCache,
    mixtral_engine_forward,
)

# MixtralEngineLayer fields whose leaves are stacked (L, E, ...): the
# expert-parallel shard set.  gate_weight is (L, E, D) too but is the
# ROUTER — replicated by design (see module docstring).
_EXPERT_STACKED = ("w13", "w2", "w2_input_scale")


def make_ep_mesh(
    ep: int,
    dp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (dp, ep) mesh; ep innermost so the per-block combine psum rides
    the fastest interconnect dimension."""
    devices = list(devices if devices is not None else jax.devices())
    assert dp * ep <= len(devices), (dp, ep, len(devices))
    arr = np.asarray(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(arr, ("dp", "ep"))


def _spec_for_path(path, leaf) -> P:
    names = [getattr(p, "name", getattr(p, "key", None)) for p in path]
    for i, nm in enumerate(names):
        if nm in _EXPERT_STACKED:
            nd = getattr(leaf, "ndim", 2)
            return P(None, "ep", *([None] * (nd - 2)))
    return P()


def moe_param_specs(params: MixtralEngineParams) -> MixtralEngineParams:
    """PartitionSpec tree matching ``params``' structure: expert-stacked
    leaves shard their E axis on 'ep', everything else replicated."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def moe_kv_specs() -> MixtralKVCache:
    return MixtralKVCache(
        k=P(None, "dp", None, None, None),
        v=P(None, "dp", None, None, None),
        length=P(),
    )


def shard_moe_engine_params(
    params: MixtralEngineParams, mesh: Mesh
) -> MixtralEngineParams:
    """Place Mixtral engine params onto a (dp, ep) mesh.

    Validates E % ep == 0 — shard_map hands each rank a contiguous block
    of experts, which is exactly the layout ``_moe_tail``'s
    ``ep_rank * e_local + e`` global-index reconstruction assumes."""
    ep = mesh.shape.get("ep", 1)
    e = params.layers.w2_input_scale.shape[-1]
    if e % ep != 0:
        raise ValueError(
            f"expert count E={e} not divisible by ep={ep}; each rank needs "
            f"a whole number of experts"
        )
    specs = moe_param_specs(params)

    def place(p, s):
        if p is None or not hasattr(p, "shape"):
            return p
        return jax.device_put(p, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(place, params, specs)


def shard_moe_kv_cache(cache: MixtralKVCache, mesh: Mesh) -> MixtralKVCache:
    specs = moe_kv_specs()
    return MixtralKVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, specs.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, specs.v)),
        length=jax.device_put(cache.length, NamedSharding(mesh, specs.length)),
    )


def ep_mixtral_forward(
    ecfg: MixtralEngineConfig,
    params: MixtralEngineParams,
    input_ids: jax.Array,
    cache: MixtralKVCache,
    mesh: Mesh,
) -> Tuple[jax.Array, MixtralKVCache]:
    """EP × DP Mixtral engine step: shard_map over the (dp, ep) mesh.

    Logits come back batch-sharded over dp and replicated over ep (the
    block combine psums inside ``_moe_tail``)."""
    ecfg_local = dataclasses.replace(ecfg, ep_axis="ep")
    pspecs = moe_param_specs(params)
    cspecs = moe_kv_specs()

    def local_step(params_l, ids_l, cache_l):
        return mixtral_engine_forward(ecfg_local, params_l, ids_l, cache_l)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspecs),
        out_specs=(P("dp", None, None), cspecs),
        check_vma=False,
    )
    return fn(params, input_ids, cache)
