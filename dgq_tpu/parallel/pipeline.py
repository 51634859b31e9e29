"""Pipeline-parallel engine execution (GPipe-style, inference).

New TPU-first capability with no reference counterpart (the reference is
single-GPU, SURVEY §2.3): the L decoder layers are sharded over a 'pp' mesh
axis — each rank holds L/P contiguous layers and the L-sharded slice of the
INT8 KV cache — and a batch of B sequences runs as M microbatches through
the classic (P + M - 1)-tick schedule: at tick t, rank r processes
microbatch t - r and ppermutes its activation to rank r + 1.

Composes with tensor parallelism: the mesh is ('pp', 'tp'), the per-layer
block body is the engine's own `_block` with ``ecfg.tp_axis='tp'`` (the
row-parallel psums become 'tp' collectives inside each stage), and the
packed weights carry BOTH the 'pp' shard on their stacked-layer axis and
the column/row 'tp' shard (parallel/sharded_engine.py specs).

Intended placement (BASELINE config 5): 'tp' rides ICI inside a host,
'pp' crosses the DCN between hosts — each activation handoff moves one
(mb, S, D) tensor per tick, the smallest possible inter-host traffic for
a model too large for one host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgq_tpu.models.engine import (
    EngineConfig,
    EngineParams,
    KVCache,
    _block,
)
from dgq_tpu.models.llama import rms_norm, rope_cos_sin
from dgq_tpu.parallel.sharded_engine import engine_param_specs


def make_pp_mesh(pp: int, tp: int = 1, devices=None) -> Mesh:
    """A ('pp', 'tp') mesh.  'tp' is innermost so tensor-parallel
    collectives ride the fastest interconnect dimension; 'pp' hops carry
    only one microbatch activation per tick and tolerate DCN latency."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert pp * tp <= len(devices), (pp, tp, len(devices))
    arr = np.asarray(devices[: pp * tp]).reshape(pp, tp)
    return Mesh(arr, ("pp", "tp"))


def pp_engine_param_specs(params: EngineParams) -> EngineParams:
    """TP specs with 'pp' prepended on every stacked-layer leaf's L axis."""
    base = engine_param_specs(params)

    def add_pp(path, spec):
        names = [getattr(p, "name", getattr(p, "key", None)) for p in path]
        if names and names[0] == "layers":
            return P("pp", *spec[1:]) if len(spec) else P("pp")
        return spec

    return jax.tree_util.tree_map_with_path(add_pp, base)


def pp_kv_cache_specs() -> KVCache:
    # (L, B, Hkv, Dh|Smax, Smax|Dh): L over 'pp', kv heads over 'tp'
    return KVCache(
        k=P("pp", None, "tp", None, None),
        v=P("pp", None, "tp", None, None),
        length=P(),
    )


def pp_shard_engine_params(params: EngineParams, mesh: Mesh) -> EngineParams:
    """Place engine params on a ('pp', 'tp') mesh: stacked layers sharded
    over 'pp' on L, plus the usual column/row TP shard (with the fused-
    projection rank-block permutation) when tp > 1."""
    tp = mesh.shape.get("tp", 1)
    L = params.layers.ln1_weight.shape[0]
    pp = mesh.shape["pp"]
    if L % pp != 0:
        raise ValueError(f"num layers {L} not divisible by pp={pp}")
    if tp > 1:
        # reuse the TP permutation + span validation wholesale by sharding
        # on a tp-only view first is not possible (device_put would place
        # twice); replicate the logic via shard_engine_params' helpers
        from dgq_tpu.parallel.sharded_engine import _permute_fused

        for name in ("o_proj", "down_proj"):
            lin = getattr(params.layers, name)
            qw = lin.qweight if lin.qweight is not None else lin.qw_rp
            k = qw.shape[-2] * 2
            groupsize = (k * 8) // lin.wscales.shape[-2]
            span = 2 * groupsize
            if k % tp != 0 or (k // tp) % span != 0:
                raise ValueError(
                    f"row-parallel {name}: K={k} with tp={tp} gives per-rank "
                    f"K={k / tp:g}, not a whole number of packed spans "
                    f"({span}); choose pad_to a multiple of {span * tp}"
                )
        layers = params.layers
        oq = (layers.o_proj.qweight if layers.o_proj.qweight is not None
              else layers.o_proj.qw_rp)
        n_q = oq.shape[1] * 2
        n_kv = (layers.qkv_proj.alpha.shape[-1] - n_q) // 2
        f2 = layers.gate_up_proj.alpha.shape[-1]
        from dgq_tpu.parallel.sharded_engine import _localize_row_cs_fold

        layers = layers._replace(
            qkv_proj=_permute_fused(layers.qkv_proj, [n_q, n_kv, n_kv], tp),
            gate_up_proj=_permute_fused(layers.gate_up_proj, [f2 // 2, f2 // 2], tp),
        )
        layers = _localize_row_cs_fold(layers, tp)
        params = dataclasses.replace(params, layers=layers)

    specs = pp_engine_param_specs(params)

    def place(p, s):
        if p is None or not hasattr(p, "shape"):
            return p
        return jax.device_put(p, NamedSharding(mesh, s))

    return jax.tree_util.tree_map(place, params, specs)


def pp_shard_kv_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    specs = pp_kv_cache_specs()
    return KVCache(
        k=jax.device_put(cache.k, NamedSharding(mesh, specs.k)),
        v=jax.device_put(cache.v, NamedSharding(mesh, specs.v)),
        length=jax.device_put(cache.length, NamedSharding(mesh, specs.length)),
    )


def pp_layer_pipeline(pp: int, M: int, layer_body, layers_l, x, k_c, v_c,
                      extras=None):
    """Generic GPipe tick loop.  Runs INSIDE shard_map with a 'pp' axis.

    ``layer_body(x_mb, layer, k_layer, v_layer, extras_mb) -> (x_mb,
    k_layer, v_layer)`` is applied per local layer by an inner lax.scan.

    x: (B, ...) activations (batch axis 0), B % M == 0;
    k_c/v_c: (Llocal, B, ...) caches (batch axis 1);
    extras: optional pytree of (B, ...) per-slot side inputs (lengths,
    per-slot rope), microbatch-sliced along axis 0.

    Returns (final (B, ...) activations — meaningful on the LAST 'pp'
    rank — and the updated local caches).  Bubble ticks compute but mask
    their cache writes.
    """
    B = x.shape[0]
    mb = B // M
    T = pp + M - 1
    rank = lax.axis_index("pp")
    xs = x.reshape(M, mb, *x.shape[1:])

    def inner(x_mb, k_mb, v_mb, ex_mb):
        def body(xc, layer_and_cache):
            layer, k_l, v_l = layer_and_cache
            xc, k_l, v_l = layer_body(xc, layer, k_l, v_l, ex_mb)
            return xc, (k_l, v_l)

        out, (k_new, v_new) = lax.scan(body, x_mb, (layers_l, k_mb, v_mb))
        return out, k_new, v_new

    def tick(carry, t):
        buf, k_c, v_c = carry
        m = t - rank  # microbatch this rank works on at tick t
        valid = (m >= 0) & (m < M)
        mc = jnp.clip(m, 0, M - 1)
        # rank 0 ingests its scheduled microbatch; others take the
        # activation that arrived over the ring
        inp = jnp.where(rank == 0, xs[jnp.clip(t, 0, M - 1)], buf)
        k_mb = lax.dynamic_slice_in_dim(k_c, mc * mb, mb, axis=1)
        v_mb = lax.dynamic_slice_in_dim(v_c, mc * mb, mb, axis=1)
        ex_mb = (
            None if extras is None
            else jax.tree.map(
                lambda a: lax.dynamic_slice_in_dim(a, mc * mb, mb, axis=0), extras
            )
        )
        out, k_new, v_new = inner(inp, k_mb, v_mb, ex_mb)
        # bubble ticks must not touch the cache
        k_c = lax.dynamic_update_slice_in_dim(
            k_c, jnp.where(valid, k_new, k_mb), mc * mb, axis=1
        )
        v_c = lax.dynamic_update_slice_in_dim(
            v_c, jnp.where(valid, v_new, v_mb), mc * mb, axis=1
        )
        nxt = lax.ppermute(out, "pp", [(r, (r + 1) % pp) for r in range(pp)])
        return (nxt, k_c, v_c), out

    (_, k_c, v_c), outs = lax.scan(
        tick, (jnp.zeros_like(xs[0]), k_c, v_c), jnp.arange(T)
    )
    # on the LAST rank, outs[pp-1 + m] is microbatch m's final activation
    final = outs[pp - 1 : pp - 1 + M].reshape(B, *x.shape[1:])
    return final, k_c, v_c


def pp_layer_pipeline_shared(pp: int, M: int, layer_body, layers_l, x,
                             c1, c2, extras=None):
    """Tick-loop variant for SHARED caches that cannot be sliced by
    microbatch (the paged pool: pages are not partitioned by slot).  The
    caches pass through every tick whole; ``layer_body(x_mb, layer,
    c1_layer, c2_layer, extras_mb, valid)`` receives the tick's validity
    flag and must neutralize its own writes on bubble ticks (the paged
    block masks them by pinning inactive slots to the null page)."""
    B = x.shape[0]
    mb = B // M
    T = pp + M - 1
    rank = lax.axis_index("pp")
    xs = x.reshape(M, mb, *x.shape[1:])

    def inner(x_mb, c1_, c2_, ex_mb, valid):
        def body(xc, layer_and_cache):
            layer, a, b = layer_and_cache
            xc, a, b = layer_body(xc, layer, a, b, ex_mb, valid)
            return xc, (a, b)

        out, (c1_, c2_) = lax.scan(body, x_mb, (layers_l, c1_, c2_))
        return out, c1_, c2_

    def tick(carry, t):
        buf, c1_, c2_ = carry
        m = t - rank
        valid = (m >= 0) & (m < M)
        mc = jnp.clip(m, 0, M - 1)
        inp = jnp.where(rank == 0, xs[jnp.clip(t, 0, M - 1)], buf)
        ex_mb = (
            None if extras is None
            else jax.tree.map(
                lambda a: lax.dynamic_slice_in_dim(a, mc * mb, mb, axis=0), extras
            )
        )
        out, c1_, c2_ = inner(inp, c1_, c2_, ex_mb, valid)
        nxt = lax.ppermute(out, "pp", [(r, (r + 1) % pp) for r in range(pp)])
        return (nxt, c1_, c2_), out

    (_, c1, c2), outs = lax.scan(tick, (jnp.zeros_like(xs[0]), c1, c2), jnp.arange(T))
    final = outs[pp - 1 : pp - 1 + M].reshape(B, *x.shape[1:])
    return final, c1, c2


def pp_engine_forward(
    ecfg: EngineConfig,
    params: EngineParams,
    input_ids: jax.Array,  # (B, S)
    cache: KVCache,
    mesh: Mesh,
    microbatches: Optional[int] = None,
) -> Tuple[jax.Array, KVCache]:
    """Pipeline-parallel prefill/decode step.

    ``microbatches`` defaults to the pipeline depth (the minimum that keeps
    every stage busy in the steady state; bubble fraction (P-1)/(M+P-1)).
    Requires B % microbatches == 0.  Returns (logits (B, S, V), cache) like
    engine_forward; logits come from the last stage.
    """
    cfg = ecfg.cfg
    pp = mesh.shape["pp"]
    tp = mesh.shape.get("tp", 1)
    M = microbatches or pp
    b, s = input_ids.shape
    if b % M != 0:
        raise ValueError(f"batch {b} not divisible by microbatches={M}")

    ecfg_local = dataclasses.replace(ecfg, tp_axis="tp" if tp > 1 else None)
    pspecs = pp_engine_param_specs(params)
    cspecs = pp_kv_cache_specs()

    def local_step(params_l, ids, k_c, v_c, length):
        smax = k_c.shape[4]
        d = params_l.embed_tokens.shape[1]

        # prologue (replicated compute: embeddings/norms are small)
        x = params_l.embed_tokens[ids].astype(jnp.float32)  # (B, S, D)
        positions = length + jnp.arange(s)
        pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta, jnp.float32)
        i = (length + jnp.arange(s))[:, None]
        j = jnp.arange(smax)[None, :]
        mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)
        bm = ecfg.bm_prefill if s > 8 else ecfg.bm_decode

        def layer_body(xc, layer, k_l, v_l, _ex):
            return _block(
                ecfg_local, layer, xc, k_l, v_l, length, pos_cos, pos_sin, mask, bm
            )

        final, k_c, v_c = pp_layer_pipeline(
            pp, M, layer_body, params_l.layers, x.reshape(b, s, d), k_c, v_c
        )
        x = rms_norm(final, params_l.norm_weight.astype(final.dtype), cfg.rms_norm_eps)
        logits = jnp.einsum("bsd,vd->bsv", x, params_l.lm_head.astype(x.dtype))
        # every rank computes the epilogue SPMD-uniformly; only the last
        # rank's slice of the 'pp'-stacked output is meaningful
        return logits[None], k_c, v_c

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, P(), cspecs.k, cspecs.v, P()),
        out_specs=(P("pp", None, None, None), cspecs.k, cspecs.v),
        check_vma=False,
    )
    logits_all, k, v = fn(params, input_ids, cache.k, cache.v, cache.length)
    return logits_all[-1], KVCache(k=k, v=v, length=cache.length + s)
