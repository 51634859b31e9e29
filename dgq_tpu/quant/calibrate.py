"""Layer-sequential PTQ calibration driver.

The functional re-design of the reference's PTQ loop
(reference: dgq/quant/quant_sequence.py:17-115).  Hooks and Catcher modules
become explicit dataflow (SURVEY §7 design translation):

  * the Catcher's raised-ValueError input capture -> run the embedding
    explicitly; the calibration loop owns the activations,
  * forward hooks -> the block apply returns a stats dict,
  * three replays per block, in the reference's exact order:
      pass 1 (fp)        LN-output absmax (max/batch), o/down input absmax
                         (max/batch), post-RoPE q/k/v absmax (min/batch)
      -> mean_bias, smoothing (weight rewrites), kv scale freeze
      pass 2 (fp + kv fake-quant active, like the reference after kvquant())
                         per-linear input absmax (min/batch), last-sample
                         inputs (inp1), Hessians for GPTQ
      -> per-linear search/gptq/naive quantize + pack
      pass 3 (quantized) outputs feed the next block
        (quant_sequence.py:107-115).

Activation clamp: amax = inp_absmax.max() — max over channels of the
min-over-batches per-channel absmax (quant_sequence.py:101-104).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dgq_tpu.config import QuantConfig
from dgq_tpu.models.llama import (
    KVQuantState,
    LlamaConfig,
    QuantState,
    causal_mask,
    llama_block,
    llama_embed,
    rope_cos_sin,
)
from dgq_tpu.quant.gptq import gptq_quantize, init_hessian, update_hessian
from dgq_tpu.quant.packing import pack_linear, pack_linear_w4w8
from dgq_tpu.quant.search import naive_quantize, search_quantize
from dgq_tpu.quant.smooth import mean_ln_fcs, smooth_llama_layer

# linear name -> (path in layer params, stats key of its input)
LLAMA_LINEARS = {
    "q_proj": (("self_attn", "q_proj"), "qkv_inp"),
    "k_proj": (("self_attn", "k_proj"), "qkv_inp"),
    "v_proj": (("self_attn", "v_proj"), "qkv_inp"),
    "o_proj": (("self_attn", "o_proj"), "o_proj_inp"),
    "gate_proj": (("mlp", "gate_proj"), "gate_up_inp"),
    "up_proj": (("mlp", "up_proj"), "gate_up_inp"),
    "down_proj": (("mlp", "down_proj"), "down_proj_inp"),
}


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    if len(path) == 1:
        tree[path[0]] = value
    else:
        _set(tree[path[0]], path[1:], value)


def _channel_absmax(x: jax.Array) -> jax.Array:
    """Per-channel absmax over all leading dims -> (C,) f32."""
    flat = x.reshape(-1, x.shape[-1])
    return jnp.max(jnp.abs(flat), axis=0).astype(jnp.float32)


class LayerStats(NamedTuple):
    """Pass-1 accumulators (reference: smooth_hooker.py)."""

    attn_ln_out_absmax: jax.Array  # max over batches
    mlp_ln_out_absmax: jax.Array
    down_proj_inp_absmax: jax.Array
    o_proj_inp_absmax: jax.Array
    q_rope_absmax: jax.Array  # min over batches (sta_batch_qkv)
    k_rope_absmax: jax.Array
    v_rope_absmax: jax.Array
    # meanact extras (sta_batch_minmax), running max/min (not abs)
    attn_ln_out_max: jax.Array
    attn_ln_out_min: jax.Array
    mlp_ln_out_max: jax.Array
    mlp_ln_out_min: jax.Array


def _block_with_stats(layer_params, x, mask, cos, sin, cfg, qs, kv_scales):
    out, collect = llama_block(
        layer_params, x, mask, cos, sin, cfg, qs, kv_scales, collect_stats=True
    )
    return out, collect


@partial(jax.jit, static_argnames=("cfg", "qs"))
def _pass1_step(layer_params, x, mask, cos, sin, cfg, qs, stats: Optional[LayerStats]):
    out, c = _block_with_stats(layer_params, x, mask, cos, sin, cfg, qs, None)
    ln1 = _channel_absmax(c["attn_ln_out"])
    ln2 = _channel_absmax(c["mlp_ln_out"])
    dinp = _channel_absmax(c["down_proj_inp"])
    oinp = _channel_absmax(c["o_proj_inp"])
    q_am = _channel_absmax(c["q_rope"].transpose(0, 2, 1, 3).reshape(1, -1, c["q_rope"].shape[1] * c["q_rope"].shape[3]))
    k_am = _channel_absmax(c["k_rope"].transpose(0, 2, 1, 3).reshape(1, -1, c["k_rope"].shape[1] * c["k_rope"].shape[3]))
    v_am = _channel_absmax(c["v_rope"].transpose(0, 2, 1, 3).reshape(1, -1, c["v_rope"].shape[1] * c["v_rope"].shape[3]))
    ln1_max = jnp.max(c["attn_ln_out"].reshape(-1, ln1.shape[0]), axis=0).astype(jnp.float32)
    ln1_min = jnp.min(c["attn_ln_out"].reshape(-1, ln1.shape[0]), axis=0).astype(jnp.float32)
    ln2_max = jnp.max(c["mlp_ln_out"].reshape(-1, ln2.shape[0]), axis=0).astype(jnp.float32)
    ln2_min = jnp.min(c["mlp_ln_out"].reshape(-1, ln2.shape[0]), axis=0).astype(jnp.float32)
    new = LayerStats(ln1, ln2, dinp, oinp, q_am, k_am, v_am, ln1_max, ln1_min, ln2_max, ln2_min)
    if stats is None:
        return out, new
    return out, LayerStats(
        jnp.maximum(stats.attn_ln_out_absmax, ln1),
        jnp.maximum(stats.mlp_ln_out_absmax, ln2),
        jnp.maximum(stats.down_proj_inp_absmax, dinp),
        jnp.maximum(stats.o_proj_inp_absmax, oinp),
        jnp.minimum(stats.q_rope_absmax, q_am),
        jnp.minimum(stats.k_rope_absmax, k_am),
        jnp.minimum(stats.v_rope_absmax, v_am),
        jnp.maximum(stats.attn_ln_out_max, ln1_max),
        jnp.minimum(stats.attn_ln_out_min, ln1_min),
        jnp.maximum(stats.mlp_ln_out_max, ln2_max),
        jnp.minimum(stats.mlp_ln_out_min, ln2_min),
    )


@partial(jax.jit, static_argnames=("cfg", "qs", "need_hessian"))
def _pass2_step(layer_params, x, mask, cos, sin, cfg, qs, kv_scales, absmaxes, hessians, need_hessian: bool):
    """Collect per-linear input absmax (running min over batches) and, when
    need_hessian, the running Hessian per linear input family."""
    out, c = _block_with_stats(layer_params, x, mask, cos, sin, cfg, qs, kv_scales)
    inputs = {k: c[key] for k, (_, key) in LLAMA_LINEARS.items()}
    new_absmax = {}
    for name, inp in inputs.items():
        am = _channel_absmax(inp)
        prev = absmaxes.get(name)
        new_absmax[name] = am if prev is None else jnp.minimum(prev, am)
    new_h = hessians
    if need_hessian:
        new_h = {}
        for fam in ("qkv_inp", "o_proj_inp", "gate_up_inp", "down_proj_inp"):
            H, n = hessians[fam]
            new_h[fam] = update_hessian(H, n, c[fam])
    last_inputs = {fam: c[fam] for fam in ("qkv_inp", "o_proj_inp", "gate_up_inp", "down_proj_inp")}
    return out, new_absmax, new_h, last_inputs


@partial(jax.jit, static_argnames=("cfg", "qs"))
def _pass3_step(layer_params, x, mask, cos, sin, cfg, qs, kv_scales):
    return llama_block(layer_params, x, mask, cos, sin, cfg, qs, kv_scales)


def _apply_meanact(layer_params: Dict, stats: LayerStats) -> Dict:
    """--meanact: fold LN-output mean into fc biases (reference:
    smooth.py:317-349, LLaMA branch; LLaMA RMSNorm has no bias so the folded
    bias lands on a new LN bias buffer — our RMSNorm has no bias term, so we
    fold into the fc biases only and subtract via q/k/v bias compensation)."""
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    med1 = (stats.attn_ln_out_max + stats.attn_ln_out_min) / 2.0
    qkv_ws = [p["self_attn"][k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    qkv_bs = [p["self_attn"][k].get("bias") for k in ("q_proj", "k_proj", "v_proj")]
    ln_b, new_bs = mean_ln_fcs(p["input_layernorm"]["weight"], None, qkv_ws, qkv_bs, med1)
    p["input_layernorm"] = {**p["input_layernorm"], "bias": ln_b}
    for name, b in zip(("q_proj", "k_proj", "v_proj"), new_bs):
        p["self_attn"][name] = {**p["self_attn"][name], "bias": b}
    med2 = (stats.mlp_ln_out_max + stats.mlp_ln_out_min) / 2.0
    gu_ws = [p["mlp"][k]["weight"] for k in ("gate_proj", "up_proj")]
    gu_bs = [p["mlp"][k].get("bias") for k in ("gate_proj", "up_proj")]
    ln_b2, new_bs2 = mean_ln_fcs(p["post_attention_layernorm"]["weight"], None, gu_ws, gu_bs, med2)
    p["post_attention_layernorm"] = {**p["post_attention_layernorm"], "bias": ln_b2}
    for name, b in zip(("gate_proj", "up_proj"), new_bs2):
        p["mlp"][name] = {**p["mlp"][name], "bias": b}
    return p


def _quantize_linear(name, lin, inp1, hessian, qcfg: QuantConfig, amax):
    """Quantize + pack one linear (reference: quant_sequence.py:88-106)."""
    w = lin["weight"].astype(jnp.float32)
    bias = lin.get("bias")
    wq = qcfg.wt_quant
    groupsize = qcfg.groupsize_for(w.shape[1])
    act_method = qcfg.act_quant.method if qcfg.act_quant else None
    abits = qcfg.act_quant.bits if qcfg.act_quant else 8

    if wq.method == "search":
        res = search_quantize(w, inp1, bits=wq.bits, groupsize=groupsize, w4w8=wq.w4w8)
        if wq.w4w8:
            # pack the already-clamped fake-quant weight, like packW4W8 reads
            # layer.weight.data after searchquant wrote it back
            return pack_linear_w4w8(
                res.qweight_fp, res.scale, res.zero, res.scale8, groupsize,
                bias=bias, amax=amax, act_method=act_method,
            )
        return pack_linear(
            res.qweight_fp, res.scale.reshape(-1), res.zero.reshape(-1), groupsize,
            bias=bias, amax=amax, act_method=act_method,
        )
    if wq.method == "gptq":
        H, _ = hessian
        res = gptq_quantize(
            w, H, bits=wq.bits, groupsize=groupsize,
            percdamp=wq.percdamp, act_order=wq.act_order,
        )
        return pack_linear(
            res.qweight_fp, res.scale.reshape(-1), res.zero.reshape(-1), groupsize,
            bias=bias, amax=amax, act_method=act_method,
        )
    if wq.method == "naive":
        scale, zero, wq_fp = naive_quantize(w, bits=wq.bits, groupsize=groupsize)
        return pack_linear(
            wq_fp, scale.reshape(-1), zero.reshape(-1), groupsize,
            bias=bias, amax=amax, act_method=act_method,
        )
    raise NotImplementedError(wq.method)


class PTQResult(NamedTuple):
    params: Any  # params with PackedLinear leaves
    kv_scales: List[Optional[KVQuantState]]


def ptq_llama(
    params,
    cfg: LlamaConfig,
    calib_ids: jax.Array,  # (nsamples, seqlen) int32
    qcfg: QuantConfig,
    *,
    verbose: bool = True,
) -> PTQResult:
    """Quantize a LLaMA params pytree layer-sequentially."""
    nsamples, seqlen = calib_ids.shape
    dtype = params["embed_tokens"].dtype
    mask = causal_mask(seqlen, seqlen, dtype)
    cos, sin = rope_cos_sin(jnp.arange(seqlen), cfg.head_dim, cfg.rope_theta, dtype)

    # Catcher equivalent: the block-0 inputs are just the embeddings.
    inps = llama_embed(params, calib_ids)  # (nsamples, S, D)

    fp_qs = QuantState(actq=False, wtq=False, kv=False)
    kv_on_qs = QuantState(actq=False, wtq=False, kv=True)
    quant_qs = QuantState(actq=qcfg.actq, wtq=qcfg.wtq, kv=True)

    new_layers = []
    kv_scales_all: List[Optional[KVQuantState]] = []
    need_hessian = qcfg.wtq and qcfg.wt_quant.method == "gptq"

    for li, layer in enumerate(params["layers"]):
        if verbose:
            print(f"[ptq] layer {li}")
        # ---- pass 1: stats ----
        stats = None
        outs = []
        for j in range(nsamples):
            x = inps[j][None]
            _, stats = _pass1_step(layer, x, mask, cos, sin, cfg, fp_qs, stats)

        # ---- transforms ----
        if qcfg.meanact:
            layer = _apply_meanact(layer, stats)
        if qcfg.smoothquant:
            layer = smooth_llama_layer(
                layer,
                {
                    "attn_ln_out_absmax": stats.attn_ln_out_absmax,
                    "mlp_ln_out_absmax": stats.mlp_ln_out_absmax,
                    "down_proj_inp_absmax": stats.down_proj_inp_absmax,
                },
            )
        kv_scales = None
        if qcfg.kvquant:
            # scale = 2 * absmax.max() / maxq, maxq = 255
            # (reference: kvquanter.py:353-364)
            maxq = 255.0
            kv_scales = KVQuantState(
                q_scale=2.0 * jnp.max(stats.q_rope_absmax) / maxq,
                k_scale=2.0 * jnp.max(stats.k_rope_absmax) / maxq,
                v_scale=2.0 * jnp.max(stats.v_rope_absmax) / maxq,
            )
        kv_scales_all.append(kv_scales)

        # ---- pass 2: per-linear absmax (+Hessian) with kv quant live ----
        absmaxes: Dict[str, jax.Array] = {}
        hessians = {}
        if need_hessian:
            d = cfg.hidden_size
            f = cfg.intermediate_size
            nq = cfg.num_attention_heads * cfg.head_dim
            fam_dims = {"qkv_inp": d, "o_proj_inp": nq, "gate_up_inp": d, "down_proj_inp": f}
            hessians = {fam: init_hessian(k) for fam, k in fam_dims.items()}
        last_inputs = None
        for j in range(nsamples):
            x = inps[j][None]
            _, absmaxes, hessians, last_inputs = _pass2_step(
                layer, x, mask, cos, sin, cfg, kv_on_qs, kv_scales, absmaxes, hessians, need_hessian
            )

        # ---- quantize + pack each linear ----
        layer = jax.tree_util.tree_map(lambda x: x, layer)
        for name, (path, fam) in LLAMA_LINEARS.items():
            lin = _get(layer, path)
            inp1 = last_inputs[fam].reshape(-1, last_inputs[fam].shape[-1])
            amax = jnp.max(absmaxes[name]) if qcfg.actq else None
            packed = _quantize_linear(
                name, lin, inp1, hessians.get(fam), qcfg, amax
            )
            _set(layer, path, packed)

        # ---- pass 3: quantized re-forward feeds the next block ----
        outs = []
        for j in range(nsamples):
            x = inps[j][None]
            out = _pass3_step(layer, x, mask, cos, sin, cfg, quant_qs, kv_scales)
            outs.append(out[0])
        inps = jnp.stack(outs)

        new_layers.append(layer)

    new_params = dict(params)
    new_params["layers"] = new_layers
    return PTQResult(params=new_params, kv_scales=kv_scales_all)
