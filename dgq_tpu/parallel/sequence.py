"""Sequence-parallel (ring-attention) prefill.

Long-context prefill sharded over an 'sp' mesh axis: each rank holds S/sp
consecutive tokens, every per-token stage (norms, INT8 GEMMs, MLP) runs on
the local shard unchanged, and attention runs as a **ring**: the INT8 K/V
block of every rank rotates around the 'sp' axis via ppermute while each
rank accumulates its queries' attention over the arriving blocks with a
streaming-softmax (logsumexp) combine — mathematically exact, and no rank
ever materializes more than one (S/sp, S/sp) score tile per head group.

This is the TPU-native long-context answer (SURVEY §5 "long-context /
sequence parallelism: absent" in the reference, which materializes the
full B x H x S x S score tensor, llama_a8w4.py:128-146): peak activation
memory AND attention score memory scale 1/sp, so prompts that cannot fit
one chip's HBM prefill across the mesh.

The returned KV cache is the engine's INT8 layout sharded on its Smax axis
('sp' holds positions [rank*S/sp, (rank+1)*S/sp)); gather it (or reshard)
to hand off to the decode paths.

Composes with the engine numerics bit-for-bit at the quantization points:
post-RoPE INT8 KV with static scales, INT8 q-k score matmul, fp p@V on
dequantized V (models/engine.py _block's XLA path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from dgq_tpu.models.engine import (
    EngineConfig,
    EngineParams,
    KVCache,
    _block_tail,
    _qkv_rows,
    _requant,
    _use_fused_rows,
)
from dgq_tpu.models.llama import rms_norm, rope_cos_sin, rotate_half

# plain numpy: a module-level jnp constant would initialize the device
# backend at import time (and hang on a wedged remote attachment)
import numpy as _np

_NEG = float(_np.finfo(_np.float32).min)


def make_sp_mesh(sp: int, tp: int = 1, devices=None) -> Mesh:
    """('sp',) or ('sp', 'tp') mesh; 'tp' innermost (fastest interconnect)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert sp * tp <= len(devices), (sp, tp, len(devices))
    if tp > 1:
        return Mesh(np.asarray(devices[: sp * tp]).reshape(sp, tp), ("sp", "tp"))
    return Mesh(np.asarray(devices[:sp]).reshape(sp), ("sp",))


def _ring_attention(q_s8, k_s8, v_s8, layer, rank, sp, rep):
    """Streaming-softmax ring attention over the 'sp' axis.

    q_s8 (B, H, s_l, Dh); k_s8/v_s8 (B, Hkv, s_l, Dh) — the LOCAL block,
    which rotates: after step r every rank holds rank-r's block.  Causality
    is by global position (rank*s_l + i); blocks wholly in the future
    contribute nothing (their probabilities are masked to zero)."""
    b, h, s_l, dh = q_s8.shape
    hk = k_s8.shape[1]
    qg = q_s8.reshape(b, hk, rep * s_l, dh)
    qk = layer.q_scale * layer.k_scale / (dh ** 0.5)

    m0 = jnp.full((b, hk, rep, s_l), _NEG, jnp.float32)
    l0 = jnp.zeros((b, hk, rep, s_l), jnp.float32)
    a0 = jnp.zeros((b, hk, rep, s_l, dh), jnp.float32)
    qpos = rank * s_l + jnp.arange(s_l)

    def step(carry, r):
        k_blk, v_blk, m, l, acc = carry
        # issue the ring rotation FIRST: the permute only reads k/v_blk, so
        # it is independent of the attention math below and the TPU
        # latency-hiding scheduler keeps it in flight on ICI while the
        # block's scores/p@v compute runs (verified as async
        # collective-permute-start/done bracketing the attention fusions —
        # scripts/check_overlap_hlo.py, BASELINE config 5)
        ring = [(i, (i + 1) % sp) for i in range(sp)]
        nk_blk = lax.ppermute(k_blk, "sp", ring)
        nv_blk = lax.ppermute(v_blk, "sp", ring)
        src = (rank - r) % sp  # whose block we hold at this step
        s32 = jnp.einsum("bgqd,bgkd->bgqk", qg, k_blk,
                         preferred_element_type=jnp.int32)
        scores = (s32.astype(jnp.float32) * qk).reshape(b, hk, rep, s_l, s_l)
        kpos = src * s_l + jnp.arange(s_l)
        allowed = kpos[None, :] <= qpos[:, None]  # (s_l q, s_l k)
        scores = jnp.where(allowed[None, None, None], scores, _NEG)
        m_new = jnp.maximum(m, scores.max(axis=-1))
        # rows with no allowed key yet keep m == _NEG; exp(scores - m_new)
        # would then be exp(0) — zero those probabilities explicitly
        p = jnp.exp(scores - m_new[..., None])
        p = jnp.where(allowed[None, None, None], p, 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        vf = v_blk.astype(jnp.float32) * layer.v_scale
        pv = jnp.einsum("bgrqk,bgkd->bgrqd", p, vf)
        acc = acc * corr[..., None] + pv
        return (nk_blk, nv_blk, m_new, l, acc), None

    (_, _, _, l, acc), _ = lax.scan(step, (k_s8, v_s8, m0, l0, a0),
                                    jnp.arange(sp))
    ctx = acc / l[..., None]  # every row has attended its own token
    # (B, Hkv, rep, s_l, Dh) -> (B, s_l, H*Dh)
    return ctx.transpose(0, 3, 1, 2, 4).reshape(b, s_l, h * dh)


def _sp_block(ecfg, layer, x, rank, sp, pos_cos, pos_sin, bm):
    """One decoder block on the local token shard, ring attention inside.
    Mirrors models/engine._block exactly up to the attention mechanism."""
    cfg = ecfg.cfg
    b, s_l, d = x.shape
    dh = cfg.head_dim
    fused = _use_fused_rows(ecfg, layer, b, s_l)
    qkv = _qkv_rows(ecfg, layer, x, bm, fused)
    rep_g = cfg.num_attention_heads // cfg.num_key_value_heads
    hk = qkv.shape[-1] // dh // (rep_g + 2)
    h = rep_g * hk
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
    q = q.reshape(b, s_l, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s_l, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s_l, hk, dh).transpose(0, 2, 1, 3)

    cos = pos_cos[None, None, :, :]
    sin = pos_sin[None, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)
    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)

    ctx = _ring_attention(q_s8, k_s8, v_s8, layer, rank, sp, rep_g)
    x = _block_tail(ecfg, layer, x, ctx, bm, fused)
    # cache blocks in the engine layout: K transposed (B, Hkv, Dh, s_l)
    return x, k_s8.transpose(0, 1, 3, 2), v_s8


def sp_engine_prefill(
    ecfg: EngineConfig,
    params: EngineParams,
    input_ids: jax.Array,  # (B, S), S % sp == 0, full-length prompts
    mesh: Mesh,
) -> Tuple[jax.Array, KVCache]:
    """Sequence-parallel prefill from position 0.

    Returns (logits (B, S, V), KVCache with Smax == S sharded over 'sp').
    Prompts are full-length (no per-row padding); pad S only to a multiple
    of sp.  On an ('sp', 'tp') mesh the heads additionally shard over 'tp'
    (pass params through ``shard_engine_params`` first): the ring rotates
    each rank's LOCAL kv heads' block, and the block's row-parallel psums
    stay 'tp' collectives — sequence and tensor parallelism compose.
    """
    fn = sp_prefill_fn(ecfg, params, mesh, input_ids.shape[1])
    logits, k, v = fn(params, input_ids)
    return logits, KVCache(k=k, v=v,
                           length=jnp.asarray(input_ids.shape[1], jnp.int32))


def sp_prefill_fn(ecfg: EngineConfig, params: EngineParams, mesh: Mesh,
                  s: int):
    """Build the shard_map'd ring-attention prefill step for sequence
    length ``s`` — split out of sp_engine_prefill so it can also be
    AOT-compiled against a virtual TPU topology
    (scripts/check_overlap_hlo.py: the ring's ppermutes must be scheduled
    as async collective-permute-start/done pairs bracketing independent
    attention/GEMM compute — the collective/compute overlap evidence for
    BASELINE config 5).  ``params`` is used for tree structure only."""
    import dataclasses as _dc

    cfg = ecfg.cfg
    sp = mesh.shape["sp"]
    tp = mesh.shape.get("tp", 1)
    if s % sp != 0:
        raise ValueError(f"sequence {s} not divisible by sp={sp}")
    s_l = s // sp
    if tp > 1:
        from dgq_tpu.parallel.sharded_engine import engine_param_specs

        rspec = engine_param_specs(params)
        ecfg = _dc.replace(ecfg, tp_axis="tp")
        kv_tp = "tp"
    else:
        rspec = jax.tree_util.tree_map(lambda _: P(), params)
        kv_tp = None

    def local_step(params_l, ids_l):
        rank = lax.axis_index("sp")
        x = params_l.embed_tokens[ids_l].astype(jnp.float32)  # (B, s_l, D)
        positions = rank * s_l + jnp.arange(s_l)
        pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim,
                                        cfg.rope_theta, jnp.float32)
        bm = ecfg.bm_prefill

        def body(xc, layer):
            xc, k_b, v_b = _sp_block(ecfg, layer, xc, rank, sp,
                                     pos_cos, pos_sin, bm)
            return xc, (k_b, v_b)

        x, (k_all, v_all) = lax.scan(body, x, params_l.layers)
        x = rms_norm(x, params_l.norm_weight.astype(x.dtype), cfg.rms_norm_eps)
        logits = jnp.einsum("bsd,vd->bsv", x, params_l.lm_head.astype(x.dtype))
        return logits, k_all, v_all

    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rspec, P(None, "sp")),
        out_specs=(P(None, "sp", None),
                   P(None, None, kv_tp, None, "sp"),
                   P(None, None, kv_tp, "sp", None)),
        check_vma=False,
    )


def gather_sp_cache(cache: KVCache, max_len: Optional[int] = None) -> KVCache:
    """Materialize the sp-sharded prefill cache as a single-device cache
    (optionally grown to ``max_len`` capacity) for the dense decode paths."""
    k = jax.device_get(cache.k)
    v = jax.device_get(cache.v)
    s = k.shape[-1]
    if max_len is not None and max_len > s:
        pad = max_len - s
        k = jnp.pad(jnp.asarray(k), ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad)))
        v = jnp.pad(jnp.asarray(v), ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    return KVCache(k=jnp.asarray(k), v=jnp.asarray(v), length=cache.length)
