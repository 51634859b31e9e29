"""Functional Mixtral (sparse mixture-of-experts LLaMA) in JAX.

Beyond-reference model family: the reference (ilur98/DGQ) supports only
dense decoder stacks (LLaMA/OPT/BLOOM + partial MPT/Falcon dispatch,
reference: dgq/utils/modelutils.py:39-52) — it has no MoE support at all.
This family extends the same dual-grained W4A8 PTQ pipeline to
Mixtral-style sparse MoE decoders, and is the substrate for the expert-
parallel (ep) sharding axis in dgq_tpu/parallel.

Architecture (HF MixtralForCausalLM layout):
  * attention: identical to LLaMA (RoPE, GQA) — reused from models/llama.py,
  * MLP replaced by a sparse MoE block: a per-token top-k softmax router
    (``gate``: (E, D), kept in fp — it is D x E-tiny and routing decisions
    are control flow, not FLOPs) over E experts, each a SwiGLU MLP
    {w1 (F, D) gate, w3 (F, D) up, w2 (D, F) down}.

Layer params:
  layers[i] = {
    'input_layernorm':          {'weight': (D,)},
    'self_attn': {q|k|v|o_proj: {'weight': (N, K)}},
    'post_attention_layernorm': {'weight': (D,)},
    'block_sparse_moe': {
        'gate': {'weight': (E, D)},          # router, fp (never packed)
        'experts': [ {'w1': lin, 'w3': lin, 'w2': lin} x E ],
    },
  }

Quantization design (documented deviations, all conservative):
  * every expert's w1/w3 shares the pre-routing activation as its input
    family ("moe_inp") — any token CAN route to any expert, so the static
    per-tensor act scale must cover the full activation, and a shared
    scale gives the engine ONE requant point per block (exactly like the
    dense gate|up fusion);
  * per-expert w2 stats/Hessians/inp1 come from the expert's DENSE
    intermediate (all tokens pushed through the expert, pre-mask): a
    superset of the routed distribution, never degenerate when a calib
    batch routes zero tokens to an expert;
  * the router is never quantized, but it CONSUMES the same fake-quant
    activation the experts see (when act quant is on), so the real-quant
    engine — which only has the int8 activation — routes identically.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import (
    KVQuantState,
    QuantState,
    causal_mask,
    linear_apply,
    llama_attention,
    rms_norm,
    rope_cos_sin,
)
from dgq_tpu.quant.act_quant import make_act_quant_fn
from dgq_tpu.quant.packing import PackedLinear

MOE_LINEAR_NAMES = ("w1", "w3", "w2")


@dataclasses.dataclass(frozen=True)
class MixtralConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    num_local_experts: int = 8
    num_experts_per_tok: int = 2
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-5
    rope_theta: float = 1e6
    tie_word_embeddings: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def layer_norm_eps(self) -> float:
        """Family-generic eps alias (serving/family_batch_engine.py passes
        cfg.layer_norm_eps to every adapter's ``final``); Mixtral is RMS."""
        return self.rms_norm_eps


def tiny_mixtral_config(**overrides) -> MixtralConfig:
    """Tiny fixture config for CPU tests (SURVEY §4 fake-backend pattern)."""
    base = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=512,
    )
    base.update(overrides)
    return MixtralConfig(**base)


def init_mixtral_params(cfg: MixtralConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init params (tests / fixtures). Real use ingests HF weights."""
    e = cfg.num_local_experts
    nkeys = 4 + cfg.num_hidden_layers * (5 + 3 * e)
    keys = iter(jax.random.split(key, nkeys))
    d, f = cfg.hidden_size, cfg.intermediate_size
    nq = cfg.num_attention_heads * cfg.head_dim
    nkv = cfg.num_key_value_heads * cfg.head_dim

    def lin(k, n_out, n_in):
        w = jax.random.normal(k, (n_out, n_in), dtype) * (0.8 / math.sqrt(n_in))
        return {"weight": w}

    layers = []
    for _ in range(cfg.num_hidden_layers):
        experts = [
            {
                "w1": lin(next(keys), f, d),
                "w3": lin(next(keys), f, d),
                "w2": lin(next(keys), d, f),
            }
            for _ in range(e)
        ]
        layers.append(
            {
                "input_layernorm": {"weight": jnp.ones((d,), dtype)},
                "self_attn": {
                    "q_proj": lin(next(keys), nq, d),
                    "k_proj": lin(next(keys), nkv, d),
                    "v_proj": lin(next(keys), nkv, d),
                    "o_proj": lin(next(keys), d, nq),
                },
                "post_attention_layernorm": {"weight": jnp.ones((d,), dtype)},
                "block_sparse_moe": {
                    "gate": {"weight": jax.random.normal(next(keys), (e, d), dtype) * 0.1},
                    "experts": experts,
                },
            }
        )
    return {
        "embed_tokens": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "layers": layers,
        "norm": {"weight": jnp.ones((d,), dtype)},
        "lm_head": {"weight": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02},
    }


def route_topk(router_logits: jax.Array, k: int):
    """Top-k routing with renormalized softmax weights (HF Mixtral
    norm_topk_prob semantics): softmax over ALL experts, take the top k,
    renormalize their mass to 1.  Returns (weights (..., k), index (..., k))."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, k)
    topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topw, topi


def _routing_input(moe_params, x: jax.Array, qs: QuantState) -> jax.Array:
    """The activation the router consumes.

    With act quant on, experts see the fake-quantized activation (inside
    linear_apply) — the router must route from the SAME representation, or
    the real-quant engine (which only has the int8 activation) could route
    differently at decision boundaries."""
    e0 = moe_params["experts"][0]["w1"]
    if qs.actq and isinstance(e0, PackedLinear) and e0.amax is not None:
        return make_act_quant_fn(e0.act_method, e0.abits)(x, e0.amax)
    return x


def mixtral_moe(
    moe_params,
    x: jax.Array,  # (B, S, D) post-attention-layernorm output
    cfg: MixtralConfig,
    qs: QuantState,
    collect: Optional[dict] = None,
) -> jax.Array:
    """Sparse MoE block, computed dense-over-experts.

    Every expert processes every token and the result is combined with the
    routing mask — mathematically identical to gather-based dispatch, with
    static shapes XLA can tile (no data-dependent shapes under jit).  The
    expert loop is the unit the ep mesh axis shards (parallel/moe.py):
    each device runs E/ep experts and the combine is one psum."""
    h_route = _routing_input(moe_params, x, qs)
    gate_w = moe_params["gate"]["weight"]
    router_logits = jnp.einsum("bsd,ed->bse", h_route, gate_w.astype(h_route.dtype))
    gate_b = moe_params["gate"].get("bias")
    if gate_b is not None:  # meanact fold keeps routing invariant
        router_logits = router_logits + gate_b.astype(router_logits.dtype)
    topw, topi = route_topk(router_logits, cfg.num_experts_per_tok)

    out = jnp.zeros_like(x)
    for e, expert in enumerate(moe_params["experts"]):
        g = linear_apply(expert["w1"], x, qs)
        u = linear_apply(expert["w3"], x, qs)
        he = jax.nn.silu(g) * u
        if collect is not None:
            # DENSE (pre-mask) intermediate: superset stats, never degenerate
            collect[f"expert{e}_down_inp"] = he
        ye = linear_apply(expert["w2"], he, qs)
        m = jnp.sum(topw * (topi == e).astype(topw.dtype), axis=-1)  # (B, S)
        out = out + m[..., None].astype(ye.dtype) * ye
    return out


def mixtral_block(
    layer_params,
    x: jax.Array,
    mask: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    cfg: MixtralConfig,
    qs: QuantState = QuantState(),
    kv_scales: Optional[KVQuantState] = None,
    collect_stats: bool = False,
):
    """One Mixtral decoder block (LLaMA attention + sparse MoE MLP).

    With ``collect_stats`` also returns the calibration intermediates
    (functional hook replacement, like models/llama.llama_block)."""
    collect: Optional[dict] = {} if collect_stats else None

    ln1 = rms_norm(x, layer_params["input_layernorm"]["weight"], cfg.rms_norm_eps)
    ln1_bias = layer_params["input_layernorm"].get("bias")
    if ln1_bias is not None:  # meanact fold
        ln1 = ln1 + ln1_bias.astype(ln1.dtype)
    if collect is not None:
        collect["attn_ln_out"] = ln1
        collect["qkv_inp"] = ln1
    attn_out = llama_attention(
        layer_params["self_attn"], ln1, mask, cos, sin, cfg, qs, kv_scales, collect
    )
    x = x + attn_out

    ln2 = rms_norm(x, layer_params["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    ln2_bias = layer_params["post_attention_layernorm"].get("bias")
    if ln2_bias is not None:
        ln2 = ln2 + ln2_bias.astype(ln2.dtype)
    if collect is not None:
        collect["moe_ln_out"] = ln2
        collect["moe_inp"] = ln2
    moe_out = mixtral_moe(layer_params["block_sparse_moe"], ln2, cfg, qs, collect)
    x = x + moe_out

    if collect is not None:
        return x, collect
    return x


def mixtral_embed(params, input_ids: jax.Array) -> jax.Array:
    return params["embed_tokens"][input_ids]


def mixtral_head(params, x: jax.Array, cfg: MixtralConfig) -> jax.Array:
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return jnp.einsum("...k,nk->...n", x, params["lm_head"]["weight"].astype(x.dtype))


def mixtral_apply(
    params,
    input_ids: jax.Array,
    cfg: MixtralConfig,
    qs: QuantState = QuantState(),
    kv_scales_per_layer=None,
) -> jax.Array:
    """Full forward: (B, S) token ids -> (B, S, V) logits."""
    b, s = input_ids.shape
    x = mixtral_embed(params, input_ids)
    mask = causal_mask(s, s, x.dtype)
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.head_dim, cfg.rope_theta, x.dtype)
    for i, layer in enumerate(params["layers"]):
        kv = None if kv_scales_per_layer is None else kv_scales_per_layer[i]
        x = mixtral_block(layer, x, mask, cos, sin, cfg, qs, kv)
    return mixtral_head(params, x, cfg)


# ---------------------------------------------------------------------------
# smoothing / meanact (adapter hooks)
# ---------------------------------------------------------------------------


def smooth_mixtral_layer(layer_params: Dict, stats: Dict) -> Dict:
    """SmoothQuant-style fold for a Mixtral layer.

    attn: identical to LLaMA (ln1 -> q/k/v columns).
    moe:  ln2's consumers are ALL experts' w1/w3 AND the router — the router
          weight must absorb the same per-channel scale or smoothing would
          change routing decisions (ln_out/s @ (gate*s)^T == ln_out @ gate^T
          in real arithmetic).
    per-expert: w2-input outliers migrate into that expert's w3 rows
          (smooth_llama_mlp per expert, each from its own dense stats)."""
    from dgq_tpu.quant.smooth import smooth_llama_mlp, smooth_ln_fcs

    p = jax.tree_util.tree_map(lambda y: y, layer_params)

    at = p["self_attn"]
    qkv_ws = [at[k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    new_ln1, _, new_qkv = smooth_ln_fcs(
        p["input_layernorm"]["weight"], None, qkv_ws, stats["attn_ln_out_absmax"]
    )
    p["input_layernorm"] = {**p["input_layernorm"], "weight": new_ln1}
    for name, w in zip(("q_proj", "k_proj", "v_proj"), new_qkv):
        at[name] = {**at[name], "weight": w}

    moe = p["block_sparse_moe"]
    experts = moe["experts"]
    fc_ws = []
    for ex in experts:
        fc_ws.append(ex["w1"]["weight"])
        fc_ws.append(ex["w3"]["weight"])
    fc_ws.append(moe["gate"]["weight"])  # router absorbs s: routing invariant
    new_ln2, _, new_fcs = smooth_ln_fcs(
        p["post_attention_layernorm"]["weight"], None, fc_ws, stats["moe_ln_out_absmax"]
    )
    p["post_attention_layernorm"] = {**p["post_attention_layernorm"], "weight": new_ln2}
    new_experts = []
    for e, ex in enumerate(experts):
        ex = dict(ex)
        ex["w1"] = {**ex["w1"], "weight": new_fcs[2 * e]}
        ex["w3"] = {**ex["w3"], "weight": new_fcs[2 * e + 1]}
        new_w3, _, new_w2 = smooth_llama_mlp(
            ex["w3"]["weight"], None, ex["w2"]["weight"],
            stats[f"expert{e}_down_inp_absmax"],
        )
        ex["w3"] = {**ex["w3"], "weight": new_w3}
        ex["w2"] = {**ex["w2"], "weight": new_w2}
        new_experts.append(ex)
    p["block_sparse_moe"] = {
        "gate": {**moe["gate"], "weight": new_fcs[-1]},
        "experts": new_experts,
    }
    return p


def meanact_mixtral_layer(layer_params: Dict, stats_max: Dict, stats_min: Dict) -> Dict:
    """--meanact fold for Mixtral: LN-output means fold into consumer
    biases.  ln2's mean folds into every expert's w1/w3 biases AND a new
    router bias — without the router bias the fold would shift routing
    logits (reference meanact only ever faces single-consumer LNs,
    smooth.py:317-354)."""
    from dgq_tpu.quant.smooth import mean_ln_fcs

    p = jax.tree_util.tree_map(lambda y: y, layer_params)
    med1 = (stats_max["attn_ln_out"] + stats_min["attn_ln_out"]) / 2.0
    at = p["self_attn"]
    qkv_ws = [at[k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    qkv_bs = [at[k].get("bias") for k in ("q_proj", "k_proj", "v_proj")]
    ln_b, new_bs = mean_ln_fcs(p["input_layernorm"]["weight"], None, qkv_ws, qkv_bs, med1)
    p["input_layernorm"] = {**p["input_layernorm"], "bias": ln_b}
    for name, b in zip(("q_proj", "k_proj", "v_proj"), new_bs):
        at[name] = {**at[name], "bias": b}

    med2 = (stats_max["moe_ln_out"] + stats_min["moe_ln_out"]) / 2.0
    moe = p["block_sparse_moe"]
    fc_ws, fc_bs = [], []
    for ex in moe["experts"]:
        fc_ws.extend([ex["w1"]["weight"], ex["w3"]["weight"]])
        fc_bs.extend([ex["w1"].get("bias"), ex["w3"].get("bias")])
    fc_ws.append(moe["gate"]["weight"])
    fc_bs.append(moe["gate"].get("bias"))
    ln_b2, new_bs2 = mean_ln_fcs(
        p["post_attention_layernorm"]["weight"], None, fc_ws, fc_bs, med2
    )
    p["post_attention_layernorm"] = {**p["post_attention_layernorm"], "bias": ln_b2}
    new_experts = []
    for e, ex in enumerate(moe["experts"]):
        ex = dict(ex)
        ex["w1"] = {**ex["w1"], "bias": new_bs2[2 * e]}
        ex["w3"] = {**ex["w3"], "bias": new_bs2[2 * e + 1]}
        new_experts.append(ex)
    p["block_sparse_moe"] = {
        "gate": {**moe["gate"], "bias": new_bs2[-1]},
        "experts": new_experts,
    }
    return p
