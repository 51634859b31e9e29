"""SmoothQuant-style outlier migration as pure parameter transforms.

The reference mutates HF modules in place (reference: dgq/quant/smooth.py).
Here each transform takes arrays and returns updated arrays; per-architecture
wiring (which norm feeds which linears) lives in the calibration driver.

Numerics kept exact (SURVEY §7 "hard parts"): the top-0.5% quantile baseline
``basl = int(len*0.005 + 1.5)``, scales = act/baseline with scales <= baseline
pinned to 1, the early-out when baseline < 1e-4.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp


def _outlier_scales(act_scales: jax.Array) -> jax.Array:
    """reference: smooth.py:19-26 — per-channel migration scale."""
    n = act_scales.shape[0]
    basl = int(n * 0.005 + 1.5)  # hyperparameter (reference: smooth.py:20)
    maxsv = jnp.sort(act_scales)
    baseline = maxsv[-basl]
    scales = act_scales / baseline
    scales = jnp.where(act_scales <= baseline, 1.0, scales)
    # baseline < 1e-4 => no smoothing (reference: smooth.py:23-24)
    return jnp.where(baseline < 1e-4, jnp.ones_like(scales), scales)


def smooth_ln_fcs(
    ln_weight: jax.Array,
    ln_bias: Optional[jax.Array],
    fc_weights: List[jax.Array],
    act_scales: jax.Array,
) -> Tuple[jax.Array, Optional[jax.Array], List[jax.Array]]:
    """Divide LN weight/bias, multiply fc input columns.

    reference: smooth.py:13-42.  fc weights are (out, in); act_scales is the
    LN-output per-channel absmax (max over batches).
    """
    scales = _outlier_scales(act_scales.astype(jnp.float32))
    s = scales.astype(ln_weight.dtype)
    new_ln_w = ln_weight / s
    new_ln_b = None if ln_bias is None else ln_bias / s
    new_fcs = [fc * scales.astype(fc.dtype)[None, :] for fc in fc_weights]
    return new_ln_w, new_ln_b, new_fcs


def smooth_llama_mlp(
    up_weight: jax.Array,
    up_bias: Optional[jax.Array],
    down_weight: jax.Array,
    act_scales: jax.Array,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Migrate down_proj input outliers into up_proj output rows.

    reference: smooth.py:100-148 (gate untouched; up rows divided, down
    columns multiplied)."""
    scales = _outlier_scales(act_scales.astype(jnp.float32))
    s_up = scales.astype(up_weight.dtype)
    new_up_w = up_weight / s_up[:, None]
    new_up_b = None if up_bias is None else up_bias / s_up
    new_down_w = down_weight * scales.astype(down_weight.dtype)[None, :]
    return new_up_w, new_up_b, new_down_w


def smooth_ln_fcs_weight(
    ln_weight: jax.Array,
    ln_bias: Optional[jax.Array],
    fc_weights: List[jax.Array],
) -> Tuple[jax.Array, Optional[jax.Array], List[jax.Array]]:
    """Weight-only (data-free) variant: geometric-mean column scale,
    clamped to [0.2, 5].  reference: smooth.py:44-63."""
    ws = jnp.stack([jnp.mean(jnp.abs(fc.astype(jnp.float32)), axis=0) for fc in fc_weights])
    ws = ws / jnp.mean(ws, axis=1, keepdims=True)
    scales = jnp.prod(ws, axis=0) ** (1.0 / len(fc_weights))
    scales = jnp.clip(scales, 0.2, 5.0)
    s = scales.astype(ln_weight.dtype)
    new_ln_w = ln_weight * s
    new_ln_b = None if ln_bias is None else ln_bias * s
    new_fcs = [fc / scales.astype(fc.dtype)[None, :] for fc in fc_weights]
    return new_ln_w, new_ln_b, new_fcs


def smooth_fc_weight(
    v_weight: jax.Array,
    v_bias: Optional[jax.Array],
    o_weight: jax.Array,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Balance v_proj output rows against o_proj input columns by o_proj's
    per-column weight magnitude.  reference: smooth.py:176-197 (non-fused
    path; the BLOOM fused-qkv stride-3 variant is handled by the caller)."""
    best = jnp.mean(jnp.abs(o_weight.astype(jnp.float32)), axis=0)
    scales = best / jnp.mean(best)
    scales = jnp.clip(scales, 0.2, 5.0)
    sv = scales.astype(v_weight.dtype)
    new_v_w = v_weight * sv[:, None]
    new_v_b = None if v_bias is None else v_bias * sv
    new_o_w = o_weight / scales.astype(o_weight.dtype)[None, :]
    return new_v_w, new_v_b, new_o_w


def mean_ln_fcs(
    ln_weight: jax.Array,
    ln_bias: Optional[jax.Array],
    fc_weights: List[jax.Array],
    fc_biases: List[Optional[jax.Array]],
    act_median: jax.Array,
) -> Tuple[jax.Array, List[Optional[jax.Array]]]:
    """Fold the activation mean into the LN bias and compensate in fc biases
    (the --meanact pass).  reference: smooth.py:66-92.

    Returns (new_ln_bias, new_fc_biases); ln_weight unchanged.
    """
    med = act_median.astype(jnp.float32)
    new_ln_b = (-med if ln_bias is None else ln_bias.astype(jnp.float32) - med).astype(ln_weight.dtype)
    new_fc_biases = []
    for fc_w, fc_b in zip(fc_weights, fc_biases):
        tmp = fc_w.astype(jnp.float32) @ med
        nb = tmp if fc_b is None else fc_b.astype(jnp.float32) + tmp
        new_fc_biases.append(nb.astype(fc_w.dtype))
    return new_ln_b, new_fc_biases


def smooth_att_qk(
    q_weight: jax.Array,
    k_weight: jax.Array,
    q_out_scales: jax.Array,
    k_out_scales: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Balance q/k output ranges per channel: q rows divided by
    s = sqrt(q_scale/k_scale), k rows multiplied by s, preserving q.k^T.

    reference: smooth.py:95-98 defines this but divides *both* projections
    (not function-preserving; its call sites are commented out).  We keep the
    mathematically sound variant (documented deviation)."""
    s = jnp.sqrt(q_out_scales.astype(jnp.float32) / k_out_scales.astype(jnp.float32))
    return (
        q_weight / s.astype(q_weight.dtype)[:, None],
        k_weight * s.astype(k_weight.dtype)[:, None],
    )


def smooth_ov(
    v_weight: jax.Array,
    v_bias: Optional[jax.Array],
    o_weight: jax.Array,
    act_scales: jax.Array,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
    """Migrate o_proj input outliers into v_proj rows (the top-50% baseline
    variant).  reference: smooth.py:201-227 (call sites commented out)."""
    num = o_weight.shape[1]
    basl = int(num * 0.5 + 1.5)  # hyperparameter (reference: smooth.py:208)
    maxsv = jnp.sort(act_scales.astype(jnp.float32))
    baseline = maxsv[-basl]
    scales = act_scales / baseline
    scales = jnp.where(act_scales <= baseline, 1.0, scales)
    scales = jnp.where(baseline < 1e-4, jnp.ones_like(scales), scales)
    new_o = o_weight * scales.astype(o_weight.dtype)[None, :]
    new_v = v_weight / scales.astype(v_weight.dtype)[:, None]
    new_vb = None if v_bias is None else v_bias / scales.astype(v_bias.dtype)
    return new_v, new_vb, new_o


# ---------------------------------------------------------------------------
# architecture wiring (LLaMA): operates on the layer param dict in place of
# the reference's smooth_module isinstance dispatch (smooth.py:230-316).
# ---------------------------------------------------------------------------


def smooth_llama_layer(layer_params: Dict, stats: Dict) -> Dict:
    """Apply the reference's LLaMA smoothing recipe (smooth.py:294-307) to a
    functional layer param dict, given pass-1 stats:

      stats['attn_ln_out_absmax'] (D,)   max-over-batches LN1 output absmax
      stats['mlp_ln_out_absmax']  (D,)   same for LN2
      stats['down_proj_inp_absmax'] (F,) max-over-batches down_proj input absmax
    """
    p = jax.tree_util.tree_map(lambda x: x, layer_params)  # shallow-ish copy

    ln1_w = p["input_layernorm"]["weight"]
    qkv_ws = [p["self_attn"][k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    new_ln1, _, new_qkv = smooth_ln_fcs(ln1_w, None, qkv_ws, stats["attn_ln_out_absmax"])
    p["input_layernorm"] = {**p["input_layernorm"], "weight": new_ln1}
    for name, w in zip(("q_proj", "k_proj", "v_proj"), new_qkv):
        p["self_attn"][name] = {**p["self_attn"][name], "weight": w}

    ln2_w = p["post_attention_layernorm"]["weight"]
    gu_ws = [p["mlp"][k]["weight"] for k in ("gate_proj", "up_proj")]
    new_ln2, _, new_gu = smooth_ln_fcs(ln2_w, None, gu_ws, stats["mlp_ln_out_absmax"])
    p["post_attention_layernorm"] = {**p["post_attention_layernorm"], "weight": new_ln2}
    for name, w in zip(("gate_proj", "up_proj"), new_gu):
        p["mlp"][name] = {**p["mlp"][name], "weight": w}

    up_w = p["mlp"]["up_proj"]["weight"]
    down_w = p["mlp"]["down_proj"]["weight"]
    new_up, _, new_down = smooth_llama_mlp(up_w, None, down_w, stats["down_proj_inp_absmax"])
    p["mlp"]["up_proj"] = {**p["mlp"]["up_proj"], "weight": new_up}
    p["mlp"]["down_proj"] = {**p["mlp"]["down_proj"], "weight": new_down}
    return p


def smooth_llama_layer_weight_only(layer_params: Dict) -> Dict:
    """Data-free weight smoothing recipe (reference: smooth.py:254-263)."""
    p = jax.tree_util.tree_map(lambda x: x, layer_params)
    ln1_w = p["input_layernorm"]["weight"]
    qkv_ws = [p["self_attn"][k]["weight"] for k in ("q_proj", "k_proj", "v_proj")]
    new_ln1, _, new_qkv = smooth_ln_fcs_weight(ln1_w, None, qkv_ws)
    p["input_layernorm"] = {**p["input_layernorm"], "weight": new_ln1}
    for name, w in zip(("q_proj", "k_proj", "v_proj"), new_qkv):
        p["self_attn"][name] = {**p["self_attn"][name], "weight": w}

    v_w = p["self_attn"]["v_proj"]["weight"]
    o_w = p["self_attn"]["o_proj"]["weight"]
    new_v, _, new_o = smooth_fc_weight(v_w, None, o_w)
    p["self_attn"]["v_proj"] = {**p["self_attn"]["v_proj"], "weight": new_v}
    p["self_attn"]["o_proj"] = {**p["self_attn"]["o_proj"], "weight": new_o}

    ln2_w = p["post_attention_layernorm"]["weight"]
    gu_ws = [p["mlp"][k]["weight"] for k in ("gate_proj", "up_proj")]
    new_ln2, _, new_gu = smooth_ln_fcs_weight(ln2_w, None, gu_ws)
    p["post_attention_layernorm"] = {**p["post_attention_layernorm"], "weight": new_ln2}
    for name, w in zip(("gate_proj", "up_proj"), new_gu):
        p["mlp"][name] = {**p["mlp"][name], "weight": w}

    up_w = p["mlp"]["up_proj"]["weight"]
    down_w = p["mlp"]["down_proj"]["weight"]
    new_up, _, new_down = smooth_fc_weight(up_w, None, down_w)
    p["mlp"]["up_proj"] = {**p["mlp"]["up_proj"], "weight": new_up}
    p["mlp"]["down_proj"] = {**p["mlp"]["down_proj"], "weight": new_down}
    return p
