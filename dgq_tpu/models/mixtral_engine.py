"""Real-quant INT8-dataflow Mixtral (sparse-MoE) engine.

Beyond-reference family engine (the reference's real-quant engines cover
only OPT and LLaMA, reference: dgq/models/opt_a8w4.py, llama_a8w4.py; it
has no MoE support).  The attention half is the LLaMA engine dataflow
(RMSNormQ -> fused q|k|v W4A8 GEMM -> fp RoPE -> INT8 KV cache -> INT8
attention kernels); the MLP half is a sparse MoE block:

  * ONE requant point per block: all experts' w1/w3 share the pre-routing
    activation scale (calibrated on the shared "moe_inp" family,
    quant/arch.py MixtralAdapter), so the block quantizes ln2 output once
    and every expert GEMM consumes the same int8 tensor — the MoE
    equivalent of the dense engine's gate|up fusion.
  * The router is fp: logits are computed from the DEQUANTIZED int8
    activation (clipped to the fake-quant path's [-127, 127] grid), so the
    engine routes bit-identically to the fake-quant eval path.
  * Experts are computed dense-over-experts and combined with the routing
    mask — static shapes under jit; per-expert weights live stacked on a
    leading E axis, which is exactly the axis parallel/moe.py shards for
    expert parallelism (each device then runs E/ep experts + one psum).

KV cache is INT8 (kv_bits=4 and the rowpair/s4 decode-GEMV specials are
LLaMA-engine scope); p @ V stays fp on every path (this family has no
quant_pv — the flag is a LLaMA-engine kv8 optimization)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import (
    EngineLinear,
    _attention_scores,
    _engine_linear,
    _engine_linear_fp,
    _fuse_linears,
    _linear_s8,
    _requant,
    _rms_norm_q,
)
from dgq_tpu.models.llama import rms_norm, rope_cos_sin, rotate_half
from dgq_tpu.models.mixtral import MixtralConfig, route_topk


class MixtralEngineLayer(NamedTuple):
    ln1_weight: jax.Array  # (D,) f32, / attn_input_scale
    ln1_bias: Optional[jax.Array]
    ln2_weight: jax.Array  # (D,) f32, / moe_input_scale
    ln2_bias: Optional[jax.Array]
    qkv_proj: EngineLinear  # fused q|k|v
    o_proj: EngineLinear
    gate_weight: jax.Array  # (E, D) f32 router (never quantized)
    gate_bias: Optional[jax.Array]  # (E,) meanact fold
    w13: EngineLinear  # stacked over E: fused w1|w3, leaves (E, ...)
    w2: EngineLinear  # stacked over E
    q_scale: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array
    out_input_scale: jax.Array
    moe_input_scale: jax.Array  # () — dequant scale for the router input
    w2_input_scale: jax.Array  # (E,) per-expert requant scales


class MixtralEngineParams(NamedTuple):
    embed_tokens: jax.Array
    layers: MixtralEngineLayer  # stacked: leaves lead with (L, ...)
    norm_weight: jax.Array
    lm_head: jax.Array


class MixtralKVCache(NamedTuple):
    k: jax.Array  # (L, B, Hkv, Dh, Smax) int8, K transposed (engine layout)
    v: jax.Array  # (L, B, Hkv, Smax, Dh) int8
    length: jax.Array


def init_mixtral_kv_cache(cfg: MixtralConfig, batch: int, max_len: int) -> MixtralKVCache:
    L, hk, dh = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    return MixtralKVCache(
        k=jnp.zeros((L, batch, hk, dh, max_len), jnp.int8),
        v=jnp.zeros((L, batch, hk, max_len, dh), jnp.int8),
        length=jnp.zeros((), jnp.int32),
    )


def from_ptq_mixtral(params, kv_scales, cfg: MixtralConfig) -> MixtralEngineParams:
    """Convert a mixtral PTQ result into stacked engine params (the MoE
    counterpart of models/engine.from_ptq; reference loadutils.py:57-70 has
    no MoE analogue)."""
    def _all_linears(layer):
        at = layer["self_attn"]
        yield from (at[n] for n in ("q_proj", "k_proj", "v_proj", "o_proj"))
        for ex in layer["block_sparse_moe"]["experts"]:
            yield from (ex[n] for n in ("w1", "w3", "w2"))

    mixed = not all(
        pl.w4w8 for layer in params["layers"] for pl in _all_linears(layer)
    )
    make_lin = _engine_linear_fp if mixed else _engine_linear

    per_layer = []
    for li, layer in enumerate(params["layers"]):
        at = layer["self_attn"]
        moe = layer["block_sparse_moe"]
        experts = moe["experts"]
        attn_input_scale = at["q_proj"].amax.astype(jnp.float32) / 127.0
        out_input_scale = at["o_proj"].amax.astype(jnp.float32) / 127.0
        # shared by construction (MixtralAdapter "moe_inp" family)
        moe_input_scale = experts[0]["w1"].amax.astype(jnp.float32) / 127.0
        w2_scales = jnp.stack(
            [ex["w2"].amax.astype(jnp.float32) / 127.0 for ex in experts]
        )
        w13_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[
                _fuse_linears([
                    make_lin(ex["w1"], moe_input_scale),
                    make_lin(ex["w3"], moe_input_scale),
                ])
                for ex in experts
            ],
        )
        w2_stack = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[
                make_lin(ex["w2"], ex["w2"].amax.astype(jnp.float32) / 127.0)
                for ex in experts
            ],
        )
        kv = kv_scales[li]
        ln1 = layer["input_layernorm"]
        ln2 = layer["post_attention_layernorm"]
        gate_b = moe["gate"].get("bias")
        per_layer.append(
            MixtralEngineLayer(
                ln1_weight=ln1["weight"].astype(jnp.float32) / attn_input_scale,
                ln1_bias=(None if ln1.get("bias") is None
                          else ln1["bias"].astype(jnp.float32) / attn_input_scale),
                ln2_weight=ln2["weight"].astype(jnp.float32) / moe_input_scale,
                ln2_bias=(None if ln2.get("bias") is None
                          else ln2["bias"].astype(jnp.float32) / moe_input_scale),
                qkv_proj=_fuse_linears([
                    make_lin(at["q_proj"], attn_input_scale),
                    make_lin(at["k_proj"], attn_input_scale),
                    make_lin(at["v_proj"], attn_input_scale),
                ]),
                o_proj=make_lin(at["o_proj"], out_input_scale),
                gate_weight=moe["gate"]["weight"].astype(jnp.float32),
                gate_bias=None if gate_b is None else gate_b.astype(jnp.float32),
                w13=w13_stack,
                w2=w2_stack,
                q_scale=kv.q_scale.astype(jnp.float32),
                k_scale=kv.k_scale.astype(jnp.float32),
                v_scale=kv.v_scale.astype(jnp.float32),
                out_input_scale=out_input_scale,
                moe_input_scale=moe_input_scale,
                w2_input_scale=w2_scales,
            )
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    return MixtralEngineParams(
        embed_tokens=params["embed_tokens"],
        layers=stacked,
        norm_weight=params["norm"]["weight"].astype(jnp.float32),
        lm_head=params["lm_head"]["weight"],
    )


@dataclasses.dataclass(frozen=True)
class MixtralEngineConfig:
    cfg: MixtralConfig
    use_kernel: bool = True
    interpret: bool = False
    fp_scales: bool = False  # uniform fp-group-scale layout (w4w8 fallback)
    bm_prefill: int = 256
    bm_decode: int = 128
    ep_axis: Optional[str] = None  # expert-parallel mesh axis (parallel/moe.py)
    tp_axis: Optional[str] = None
    decode_attn_chunk: int = -1  # -1 AUTO / 0 off / >0 manual
    kv_bits: int = 8  # scheduler contract; this family serves INT8 KV only

    def __hash__(self):
        return hash((self.cfg, self.use_kernel, self.interpret, self.fp_scales,
                     self.bm_prefill, self.bm_decode, self.ep_axis,
                     self.tp_axis, self.decode_attn_chunk, self.kv_bits))


def _moe_tail(ecfg: MixtralEngineConfig, layer: MixtralEngineLayer,
              x: jax.Array, bm: int) -> jax.Array:
    """Sparse-MoE MLP on int8 dataflow: one requant point, fp router from
    the dequantized activation, dense-over-(local-)experts combine.

    Under expert parallelism the stacked expert leaves arrive SHARDED on
    their leading E axis (shard_map slices them per device); the loop below
    then runs the local experts only, the routing mask (computed from
    globally-replicated router logits) selects each expert by its GLOBAL
    index, and the caller psums the partial combine across ep ranks."""
    cfg = ecfg.cfg
    e_local = jax.tree_util.tree_leaves(layer.w13)[0].shape[0]
    ep_rank = (
        jax.lax.axis_index(ecfg.ep_axis) if ecfg.ep_axis is not None else 0
    )

    x_s8 = _rms_norm_q(x, layer.ln2_weight, cfg.rms_norm_eps, layer.ln2_bias)
    # router: dequantize on the fake-quant path's [-127, 127] grid so the
    # engine routes bit-identically to the eval path (models/mixtral.py
    # _routing_input); the int8 grid's -128 never occurs there
    xf = jnp.maximum(x_s8, -127).astype(jnp.float32) * layer.moe_input_scale
    router_logits = jnp.einsum("bsd,ed->bse", xf, layer.gate_weight)
    if layer.gate_bias is not None:
        router_logits = router_logits + layer.gate_bias
    topw, topi = route_topk(router_logits, cfg.num_experts_per_tok)

    kw = dict(use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret,
              fp_scales=ecfg.fp_scales)
    out = jnp.zeros(x.shape, jnp.float32)
    for e in range(e_local):
        w13_e = jax.tree_util.tree_map(lambda a, e=e: a[e], layer.w13)
        w2_e = jax.tree_util.tree_map(lambda a, e=e: a[e], layer.w2)
        gu = _linear_s8(w13_e, x_s8, **kw)
        f = gu.shape[-1] // 2
        he = jax.nn.silu(gu[..., :f]) * gu[..., f:]
        h_s8 = _requant(he, layer.w2_input_scale[e])
        ye = _linear_s8(w2_e, h_s8, **kw)
        global_e = ep_rank * e_local + e
        m = jnp.sum(topw * (topi == global_e).astype(topw.dtype), axis=-1)
        out = out + m[..., None] * ye
    if ecfg.ep_axis is not None:
        out = jax.lax.psum(out, ecfg.ep_axis)
    return x + out.astype(x.dtype)


def _mixtral_block(ecfg: MixtralEngineConfig, layer: MixtralEngineLayer,
                   x, k_cache, v_cache, cache_len, pos_cos, pos_sin, mask, bm):
    cfg = ecfg.cfg
    b, s, d = x.shape
    dh = cfg.head_dim

    kw = dict(use_kernel=ecfg.use_kernel, bm=bm, interpret=ecfg.interpret,
              fp_scales=ecfg.fp_scales)
    x_s8 = _rms_norm_q(x, layer.ln1_weight, cfg.rms_norm_eps, layer.ln1_bias)
    qkv = _linear_s8(layer.qkv_proj, x_s8, **kw)

    rep = cfg.num_attention_heads // cfg.num_key_value_heads
    hk = qkv.shape[-1] // dh // (rep + 2)
    h = rep * hk
    q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
    q = q.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, hk, dh).transpose(0, 2, 1, 3)

    cos = pos_cos[None, None, :, :]
    sin = pos_sin[None, None, :, :]
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin

    q_s8 = _requant(q, layer.q_scale)
    k_s8 = _requant(k, layer.k_scale)
    v_s8 = _requant(v, layer.v_scale)
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_s8.transpose(0, 1, 3, 2), (0, 0, 0, cache_len)
    )
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_s8, (0, 0, cache_len, 0))

    if s == 1 and ecfg.use_kernel:
        from dgq_tpu.ops.attention import auto_decode_chunk

        smax = k_cache.shape[-1]
        chunk = ecfg.decode_attn_chunk
        if chunk < 0:
            chunk = auto_decode_chunk(smax)
        if chunk and smax > chunk:
            from dgq_tpu.ops.attention import int8_decode_attention_chunked

            ctx = int8_decode_attention_chunked(
                q_s8[:, :, 0, :], k_cache, v_cache, cache_len + 1,
                layer.q_scale, layer.k_scale, layer.v_scale,
                chunk=chunk, interpret=ecfg.interpret,
            )
        else:
            from dgq_tpu.ops.attention import int8_decode_attention

            ctx = int8_decode_attention(
                q_s8[:, :, 0, :], k_cache, v_cache, cache_len + 1,
                layer.q_scale, layer.k_scale, layer.v_scale,
                interpret=ecfg.interpret,
            )
        ctx = ctx.reshape(b, 1, h * dh)
    elif ecfg.use_kernel and s > 8 and k_cache.shape[-1] % 128 == 0:
        from dgq_tpu.ops.attention import int8_prefill_attention

        smax = k_cache.shape[-1]
        sp = -(-s // 128) * 128
        qp = q_s8 if sp == s else jnp.pad(
            q_s8, ((0, 0), (0, 0), (0, sp - s), (0, 0))
        )
        ctx = int8_prefill_attention(
            qp, k_cache, v_cache, cache_len + s,
            layer.q_scale, layer.k_scale, layer.v_scale, cache_len,
            bq=256 if sp % 256 == 0 else 128,
            bkv=256 if smax % 256 == 0 else 128,
            interpret=ecfg.interpret,
        )
        ctx = ctx[:, :, :s].transpose(0, 2, 1, 3).reshape(b, s, h * dh)
    else:
        qg = q_s8.reshape(b, hk, rep * s, dh)
        scores = _attention_scores(qg, k_cache, layer.q_scale, layer.k_scale, dh)
        scores = scores.reshape(b, hk, rep, s, -1) + mask[None, None, None, :, :]
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        vf = v_cache.astype(jnp.float32) * layer.v_scale
        ctx = jnp.einsum("bgrqk,bgkd->bgrqd", probs, vf)
        ctx = ctx.transpose(0, 3, 1, 2, 4).reshape(b, s, h * dh)

    ctx_s8 = _requant(ctx, layer.out_input_scale, qmin=-127.0)
    attn_out = _linear_s8(layer.o_proj, ctx_s8, **kw)
    if ecfg.tp_axis is not None:
        attn_out = jax.lax.psum(attn_out, ecfg.tp_axis)
    x = x + attn_out.astype(x.dtype)

    return _moe_tail(ecfg, layer, x, bm), k_cache, v_cache


@partial(jax.jit, static_argnames=("ecfg", "window"))
def mixtral_engine_forward(
    ecfg: MixtralEngineConfig,
    params: MixtralEngineParams,
    input_ids: jax.Array,  # (B, S)
    cache: MixtralKVCache,
    *,
    window: str = "auto",  # family-generic speculative contract; this
    # family runs fp p @ V everywhere, so the flag never alters numerics
) -> Tuple[jax.Array, MixtralKVCache]:
    cfg = ecfg.cfg
    b, s = input_ids.shape
    smax = cache.k.shape[-1]
    x = params.embed_tokens[input_ids].astype(jnp.float32)

    positions = cache.length + jnp.arange(s)
    pos_cos, pos_sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    i = positions[:, None]
    j = jnp.arange(smax)[None, :]
    mask = jnp.where(j <= i, 0.0, jnp.finfo(jnp.float32).min)

    bm = ecfg.bm_prefill if s > 8 else ecfg.bm_decode

    def scan_body(xc, layer_and_cache):
        layer, k_c, v_c = layer_and_cache
        xc, k_c, v_c = _mixtral_block(
            ecfg, layer, xc, k_c, v_c, cache.length, pos_cos, pos_sin, mask, bm
        )
        return xc, (k_c, v_c)

    x, (new_k, new_v) = jax.lax.scan(scan_body, x, (params.layers, cache.k, cache.v))

    x = rms_norm(x.astype(jnp.float32), params.norm_weight, cfg.rms_norm_eps)
    logits = jnp.einsum("bsd,vd->bsv", x, params.lm_head.astype(x.dtype))
    return logits, MixtralKVCache(k=new_k, v=new_v, length=cache.length + s)
