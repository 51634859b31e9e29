"""Tensor/data-parallel engine execution via shard_map.

Megatron-style TP laid onto the INT8 engine (SURVEY §2.3 "first-class
components to build"):

  * column-parallel q/k/v/gate/up: output features (= heads) sharded on
    'tp'; the packed INT4 weight (K//2, N), its INT8 group scales (G, N) and
    the fp per-channel alpha (N,) all shard on their N axis,
  * row-parallel o_proj/down_proj: input features sharded — the packed
    weight shards on its K//2 axis and the group scales on G; each shard's
    fused GEMM produces a partial fp32 sum that is psum'd over 'tp' after the
    per-channel epilogue (int32 psum would break the alpha contract),
  * INT8 KV cache shards on (dp: batch, tp: kv heads),
  * everything else (norms, embeddings, activation scales) is replicated.

The block body itself is unchanged — it infers local head counts from the
sharded projection widths — so the Pallas fused GEMM runs unmodified on each
shard's local tiles.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgq_tpu.models.engine import (
    EngineConfig,
    EngineLayer,
    EngineLinear,
    EngineParams,
    KVCache,
    engine_forward,
)

# leading axis of every stacked layer leaf is L (layers) -> always None


_COL_LINEARS = ("qkv_proj", "gate_up_proj")
_ROW_LINEARS = ("o_proj", "down_proj")


def _spec_for_path(path, leaf=None) -> P:
    """PartitionSpec for one engine-param leaf, keyed by its tree path.

    Stacked layer leaves carry a leading L axis (always unsharded).
    """
    names = [getattr(p, "name", getattr(p, "key", None)) for p in path]
    # 2D-per-layer linear buffers: packed weight + replicated scales +
    # compact plane scales (all (L, rows, N) stacked)
    _2d = ("qweight", "qw_rp", "wscales", "wzeros", "s_hi", "s_lo", "z_hi", "z_lo")
    for i, nm in enumerate(names):
        if nm in _COL_LINEARS:
            field = names[i + 1]
            if field in _2d:
                return P(None, None, "tp")  # (L, K//2|G, N) shard N
            return P(None, "tp")  # alpha/bias/cs_fold (L, N)
        if nm in _ROW_LINEARS:
            field = names[i + 1]
            if field in _2d:
                return P(None, "tp", None)  # (L, K//2|G, N) shard K
            if field == "cs_fold" and getattr(leaf, "ndim", 2) == 3:
                # per-rank LOCAL folds (L, tp, N), built by
                # _localize_row_cs_fold: each rank adds the fold over ITS
                # groups, keeping the rp int32 partials bitwise equal to
                # the plane path's (exactly reproducible psum)
                return P(None, "tp", None)
            return P(None, None)  # alpha/bias replicated (psum'd output)
    if names and names[0] in ("ln1_weight", "ln2_weight"):
        return P(None, None)
    # scalars / norms / embeddings / lm_head: replicated
    return P()


def engine_param_specs(params: EngineParams) -> EngineParams:
    """Spec tree with the exact same structure as ``params`` (None biases
    stay empty nodes)."""
    return jax.tree_util.tree_map_with_path(_spec_for_path, params)


def _localize_row_cs_fold(layers: EngineLayer, tp: int) -> EngineLayer:
    """Replace the row-parallel (K-sharded) linears' global cs_fold (L, N)
    with per-rank LOCAL folds (L, tp, N): rank r's entry is the
    8*colsum*scale correction over ITS K-groups only.

    Why: a single global fold added on one rank is exact in int32 but makes
    that rank's fp32 partial differ from the plane-dot path's, and the
    changed psum summation can flip a downstream requant rounding boundary
    (found as a seed-dependent 0.09 logits divergence under tp).  With
    local folds, the rp int32 partial per rank is bitwise identical to the
    plane path's, so the sharded rp engine reproduces the sharded plane
    engine exactly."""
    if tp <= 1 or layers.o_proj.cs_fold is None:
        return layers
    from dgq_tpu.ops.fused_decode import rowpair_cs_fold, rowpair_cs_fold_rp

    def localize(lin: EngineLinear) -> EngineLinear:
        if lin.cs_fold is None or lin.cs_fold.ndim == 3:
            return lin
        gs = _lin_groupsize_any(lin)
        qw, fold = ((lin.qweight, lambda q, sh, sl: rowpair_cs_fold(q, 2 * gs, sh, sl))
                    if lin.qweight is not None
                    else (lin.qw_rp, lambda q, sh, sl: rowpair_cs_fold_rp(q, gs, sh, sl)))
        k2 = qw.shape[-2]
        gp = lin.s_hi.shape[-2]  # plane rows (G/2)
        folds = []
        for r in range(tp):
            sl_q = slice(r * k2 // tp, (r + 1) * k2 // tp)
            sl_g = slice(r * gp // tp, (r + 1) * gp // tp)
            folds.append(fold(qw[..., sl_q, :],
                              lin.s_hi[..., sl_g, :], lin.s_lo[..., sl_g, :]))
        return lin._replace(cs_fold=jnp.stack(folds, axis=-2))

    return layers._replace(o_proj=localize(layers.o_proj),
                           down_proj=localize(layers.down_proj))


def _lin_groupsize_any(lin: EngineLinear) -> int:
    qw = lin.qweight if lin.qweight is not None else lin.qw_rp
    return (2 * qw.shape[-2] * 8) // lin.wscales.shape[-2]


def kv_cache_specs() -> KVCache:
    return KVCache(
        k=P(None, "dp", "tp", None, None),
        v=P(None, "dp", "tp", None, None),
        length=P(),
    )


def _spec_tree(params_like, spec_like):
    """Match spec leaves to param leaves, turning None params into None specs."""
    return jax.tree_util.tree_map(
        lambda p, s: s,
        params_like,
        spec_like,
        is_leaf=lambda x: x is None,
    )


def _rank_block_perm(sizes, tp: int):
    """Permutation taking a fused output axis [c0 | c1 | ...] to rank-major
    order [c0_r0 c1_r0 ... | c0_r1 c1_r1 ...], so a plain contiguous N-shard
    hands every rank its own slice of each fused component."""
    import numpy as np

    offs = np.concatenate([[0], np.cumsum(sizes)])
    idx = []
    for r in range(tp):
        for c, sz in enumerate(sizes):
            csz = sz // tp
            start = offs[c] + r * csz
            idx.extend(range(start, start + csz))
    return np.asarray(idx)


def _permute_fused(lin: EngineLinear, sizes, tp: int) -> EngineLinear:
    if tp <= 1:
        return lin
    perm = _rank_block_perm(sizes, tp)

    def _p(a):
        return None if a is None else a[..., perm]

    return EngineLinear(
        qweight=_p(lin.qweight),
        wscales=_p(lin.wscales),
        wzeros=_p(lin.wzeros),
        alpha=_p(lin.alpha),
        bias=_p(lin.bias),
        s_hi=_p(lin.s_hi),
        s_lo=_p(lin.s_lo),
        z_hi=_p(lin.z_hi),
        z_lo=_p(lin.z_lo),
        qw_rp=_p(lin.qw_rp),
        cs_fold=_p(lin.cs_fold),
    )


def shard_engine_params(params: EngineParams, mesh: Mesh) -> EngineParams:
    """Place engine params onto the mesh with TP shardings.

    Fused qkv / gate_up axes are first permuted to rank-major order so each
    tp shard holds its own contiguous (q_r | k_r | v_r) / (gate_r | up_r)
    slices — the per-shard layout matches the unsharded one, so the block
    body's static splits work unchanged.  Row-parallel o/down keep the
    natural K order, which lines up with the rank-contiguous head / ffn
    chunks the column-parallel side produces.
    """
    tp = mesh.shape.get("tp", 1)
    if tp > 1:
        # row-parallel (K-sharded) linears: each rank must receive a whole
        # number of *spans* (an even group count), or the per-rank packed
        # nibble planes go out of sync with the kernel's unpack and the
        # failure surfaces later as an opaque k % bk trace-time assert.
        for name in ("o_proj", "down_proj"):
            lin = getattr(params.layers, name)
            qw = lin.qweight if lin.qweight is not None else lin.qw_rp
            k = qw.shape[-2] * 2
            groupsize = (k * 8) // lin.wscales.shape[-2]
            span = 2 * groupsize
            if k % tp != 0 or (k // tp) % span != 0:
                raise ValueError(
                    f"row-parallel {name}: K={k} with tp={tp} gives per-rank "
                    f"K={k / tp:g}, not a multiple of the packed span "
                    f"{span} (groupsize {groupsize}). Each rank needs an even "
                    f"group count — choose pad_to so K/tp is a multiple of "
                    f"{span} (e.g. pad_to a multiple of {span * tp})."
                )
        layers = params.layers
        nq_kv = layers.qkv_proj.alpha.shape[-1]
        # component sizes from config-free arithmetic: alpha_N = (rep+2)*hk*dh
        # is not recoverable alone, so derive from o_proj K (= H*dh = Nq)
        oq = (layers.o_proj.qweight if layers.o_proj.qweight is not None
              else layers.o_proj.qw_rp)
        n_q = oq.shape[1] * 2  # K//2 * 2 = Nq
        n_kv = (nq_kv - n_q) // 2
        f2 = layers.gate_up_proj.alpha.shape[-1]
        layers = layers._replace(
            qkv_proj=_permute_fused(layers.qkv_proj, [n_q, n_kv, n_kv], tp),
            gate_up_proj=_permute_fused(layers.gate_up_proj, [f2 // 2, f2 // 2], tp),
        )
        layers = _localize_row_cs_fold(layers, tp)
        params = dataclasses.replace(params, layers=layers)

    specs = engine_param_specs(params)

    def place(p, s):
        if p is None or not hasattr(p, "shape"):
            return p
        return jax.device_put(p, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(place, params, specs)


def shard_kv_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = kv_cache_specs()
    return KVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, specs.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, specs.v)),
        length=jax.device_put(cache.length, NamedSharding(mesh, specs.length)),
    )


def sharded_engine_forward(
    ecfg: EngineConfig,
    params: EngineParams,
    input_ids: jax.Array,
    cache: KVCache,
    mesh: Mesh,
) -> Tuple[jax.Array, KVCache]:
    """TP x DP engine step: shard_map over the mesh; logits replicated over
    tp, batch-sharded over dp."""
    ecfg_local = dataclasses.replace(ecfg, tp_axis="tp")
    pspecs = engine_param_specs(params)
    cspecs = kv_cache_specs()

    def local_step(params_l, ids_l, cache_l):
        # engine_forward is already jitted; inside shard_map it traces with
        # local shapes and the tp_axis psums become ICI collectives
        return engine_forward(ecfg_local, params_l, ids_l, cache_l)

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspecs),
        out_specs=(P("dp", None, None), cspecs),
        check_vma=False,
    )
    return fn(params, input_ids, cache)
