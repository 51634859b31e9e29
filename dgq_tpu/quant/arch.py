"""Architecture adapters for the calibration driver.

The reference dispatches on HF module classes at every step
(convert_model/modelutils.py:95-111, smooth_module/smooth.py:230-316,
prepare_hook/smooth_hooker.py:65-99, get_blocks/modelutils.py:39-52).  Here
each architecture implements one adapter object consumed by the generic PTQ
driver (dgq_tpu/quant/calibrate.py):

  * ``embed``            token ids -> block-0 inputs (the Catcher equivalent;
                         includes positional embeddings for OPT)
  * ``make_aux``         static per-sequence data (masks, RoPE tables)
  * ``block``            pure block apply, optionally returning the collect
                         dict of intermediates (the hook replacement)
  * ``linears``          name -> (param path, collect key of its input)
  * ``max_absmax_keys``  collect keys tracked as running max of channel absmax
                         (sta_batch0/sta_batch1 semantics)
  * ``kv_keys``          collect keys tracked as running *min* (sta_batch_qkv)
  * ``minmax_keys``      keys needing running (max, min) for --meanact
  * ``smooth``/``meanact``  parameter rewrites given the collected stats
  * ``head``             final norm + lm head (for eval)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from dgq_tpu.models import llama as llama_mod
from dgq_tpu.models.llama import KVQuantState, QuantState
from dgq_tpu.quant import smooth as smooth_mod


class LlamaAdapter:
    name = "llama"

    linears = {
        "q_proj": (("self_attn", "q_proj"), "qkv_inp"),
        "k_proj": (("self_attn", "k_proj"), "qkv_inp"),
        "v_proj": (("self_attn", "v_proj"), "qkv_inp"),
        "o_proj": (("self_attn", "o_proj"), "o_proj_inp"),
        "gate_proj": (("mlp", "gate_proj"), "gate_up_inp"),
        "up_proj": (("mlp", "up_proj"), "gate_up_inp"),
        "down_proj": (("mlp", "down_proj"), "down_proj_inp"),
    }
    # amax sources for the engine conversion (reference: loadutils.py:60-66)
    max_absmax_keys = ("attn_ln_out", "mlp_ln_out", "down_proj_inp", "o_proj_inp")
    kv_keys = ("q_rope", "k_rope", "v_rope")
    minmax_keys = ("attn_ln_out", "mlp_ln_out")
    hessian_fams = ("qkv_inp", "o_proj_inp", "gate_up_inp", "down_proj_inp")

    def __init__(self, cfg):
        self.cfg = cfg

    def layers(self, params):
        return params["layers"]

    def rebuild(self, params, new_layers):
        out = dict(params)
        out["layers"] = new_layers
        return out

    def embed(self, params, input_ids):
        return llama_mod.llama_embed(params, input_ids)

    def make_aux(self, seqlen, dtype):
        mask = llama_mod.causal_mask(seqlen, seqlen, dtype)
        cos, sin = llama_mod.rope_cos_sin(
            jnp.arange(seqlen), self.cfg.head_dim, self.cfg.rope_theta, dtype
        )
        return (mask, cos, sin)

    def block(self, layer, x, aux, qs: QuantState, kv_scales, collect_stats=False):
        mask, cos, sin = aux
        return llama_mod.llama_block(
            layer, x, mask, cos, sin, self.cfg, qs, kv_scales, collect_stats
        )

    def smooth(self, layer, stats: Dict[str, jax.Array]):
        return smooth_mod.smooth_llama_layer(
            layer,
            {
                "attn_ln_out_absmax": stats["attn_ln_out"],
                "mlp_ln_out_absmax": stats["mlp_ln_out"],
                "down_proj_inp_absmax": stats["down_proj_inp"],
            },
        )

    def meanact(self, layer, stats_max, stats_min):
        from dgq_tpu.quant.calibrate import apply_meanact_llama

        return apply_meanact_llama(layer, stats_max, stats_min)

    def head(self, params, x):
        return llama_mod.llama_head(params, x, self.cfg)

    def kv_state(self, stats_min) -> KVQuantState:
        maxq = 255.0
        return KVQuantState(
            q_scale=2.0 * jnp.max(stats_min["q_rope"]) / maxq,
            k_scale=2.0 * jnp.max(stats_min["k_rope"]) / maxq,
            v_scale=2.0 * jnp.max(stats_min["v_rope"]) / maxq,
        )


class OPTAdapter:
    name = "opt"

    linears = {
        "q_proj": (("self_attn", "q_proj"), "qkv_inp"),
        "k_proj": (("self_attn", "k_proj"), "qkv_inp"),
        "v_proj": (("self_attn", "v_proj"), "qkv_inp"),
        "out_proj": (("self_attn", "out_proj"), "out_proj_inp"),
        "fc1": (("fc1",), "fc1_inp"),
        "fc2": (("fc2",), "fc2_inp"),
    }
    max_absmax_keys = ("attn_ln_out", "final_ln_out", "out_proj_inp", "fc2_inp")
    kv_keys = ("q_states", "k_states", "v_states")
    minmax_keys = ("attn_ln_out", "final_ln_out")
    hessian_fams = ("qkv_inp", "out_proj_inp", "fc1_inp", "fc2_inp")

    def __init__(self, cfg):
        self.cfg = cfg

    def layers(self, params):
        return params["layers"]

    def rebuild(self, params, new_layers):
        out = dict(params)
        out["layers"] = new_layers
        return out

    def embed(self, params, input_ids):
        from dgq_tpu.models.opt import opt_embed

        return opt_embed(params, input_ids, self.cfg)

    def make_aux(self, seqlen, dtype):
        from dgq_tpu.models.llama import causal_mask

        return (causal_mask(seqlen, seqlen, dtype),)

    def block(self, layer, x, aux, qs: QuantState, kv_scales, collect_stats=False):
        from dgq_tpu.models.opt import opt_block

        (mask,) = aux
        return opt_block(layer, x, mask, self.cfg, qs, kv_scales, collect_stats)

    def smooth(self, layer, stats):
        from dgq_tpu.models.opt import smooth_opt_layer

        return smooth_opt_layer(layer, stats)

    def meanact(self, layer, stats_max, stats_min):
        from dgq_tpu.models.opt import meanact_opt_layer

        return meanact_opt_layer(layer, stats_max, stats_min)

    def head(self, params, x):
        from dgq_tpu.models.opt import opt_head

        return opt_head(params, x, self.cfg)

    def kv_state(self, stats_min) -> KVQuantState:
        maxq = 255.0
        return KVQuantState(
            q_scale=2.0 * jnp.max(stats_min["q_states"]) / maxq,
            k_scale=2.0 * jnp.max(stats_min["k_states"]) / maxq,
            v_scale=2.0 * jnp.max(stats_min["v_states"]) / maxq,
        )


class BloomAdapter:
    """BLOOM is calibration-only in the reference (engine absent, patched
    forward broken — SURVEY §7 quirks).  Fused QKV + alibi attention."""

    name = "bloom"

    linears = {
        "query_key_value": (("self_attention", "query_key_value"), "qkv_inp"),
        "dense": (("self_attention", "dense"), "dense_inp"),
        "dense_h_to_4h": (("mlp", "dense_h_to_4h"), "fc1_inp"),
        "dense_4h_to_h": (("mlp", "dense_4h_to_h"), "fc2_inp"),
    }
    max_absmax_keys = ("attn_ln_out", "post_ln_out", "dense_inp", "fc2_inp")
    kv_keys = ("q_states", "k_states", "v_states")
    minmax_keys = ("attn_ln_out", "post_ln_out")
    hessian_fams = ("qkv_inp", "dense_inp", "fc1_inp", "fc2_inp")

    def __init__(self, cfg):
        self.cfg = cfg

    def layers(self, params):
        return params["layers"]

    def rebuild(self, params, new_layers):
        out = dict(params)
        out["layers"] = new_layers
        return out

    def embed(self, params, input_ids):
        from dgq_tpu.models.bloom import bloom_embed

        return bloom_embed(params, input_ids, self.cfg)

    def make_aux(self, seqlen, dtype):
        from dgq_tpu.models.bloom import bloom_aux

        return bloom_aux(self.cfg, seqlen, dtype)

    def block(self, layer, x, aux, qs: QuantState, kv_scales, collect_stats=False):
        from dgq_tpu.models.bloom import bloom_block

        return bloom_block(layer, x, aux, self.cfg, qs, kv_scales, collect_stats)

    def smooth(self, layer, stats):
        from dgq_tpu.models.bloom import smooth_bloom_layer

        return smooth_bloom_layer(layer, stats)

    def meanact(self, layer, stats_max, stats_min):
        from dgq_tpu.models.bloom import meanact_bloom_layer

        return meanact_bloom_layer(layer, stats_max, stats_min)

    def head(self, params, x):
        from dgq_tpu.models.bloom import bloom_head

        return bloom_head(params, x, self.cfg)

    def kv_state(self, stats_min) -> KVQuantState:
        maxq = 255.0
        return KVQuantState(
            q_scale=2.0 * jnp.max(stats_min["q_states"]) / maxq,
            k_scale=2.0 * jnp.max(stats_min["k_states"]) / maxq,
            v_scale=2.0 * jnp.max(stats_min["v_states"]) / maxq,
        )


class MPTAdapter:
    """MPT (fused Wqkv, ALiBi) — the reference lists MPT only in its block
    dispatch (modelutils.py:39-52); full support here."""

    name = "mpt"

    linears = {
        "Wqkv": (("attn", "Wqkv"), "qkv_inp"),
        "out_proj": (("attn", "out_proj"), "out_proj_inp"),
        "up_proj": (("ffn", "up_proj"), "fc1_inp"),
        "down_proj": (("ffn", "down_proj"), "fc2_inp"),
    }
    max_absmax_keys = ("attn_ln_out", "ffn_ln_out", "out_proj_inp", "fc2_inp")
    kv_keys = ("q_states", "k_states", "v_states")
    minmax_keys = ("attn_ln_out", "ffn_ln_out")
    hessian_fams = ("qkv_inp", "out_proj_inp", "fc1_inp", "fc2_inp")

    def __init__(self, cfg):
        self.cfg = cfg

    def layers(self, params):
        return params["layers"]

    def rebuild(self, params, new_layers):
        out = dict(params)
        out["layers"] = new_layers
        return out

    def embed(self, params, input_ids):
        from dgq_tpu.models.mpt import mpt_embed

        return mpt_embed(params, input_ids, self.cfg)

    def make_aux(self, seqlen, dtype):
        from dgq_tpu.models.mpt import mpt_aux

        return mpt_aux(self.cfg, seqlen, dtype)

    def block(self, layer, x, aux, qs: QuantState, kv_scales, collect_stats=False):
        from dgq_tpu.models.mpt import mpt_block

        return mpt_block(layer, x, aux, self.cfg, qs, kv_scales, collect_stats)

    def smooth(self, layer, stats):
        from dgq_tpu.models.mpt import smooth_mpt_layer

        return smooth_mpt_layer(layer, stats)

    def meanact(self, layer, stats_max, stats_min):
        from dgq_tpu.models.mpt import meanact_mpt_layer

        return meanact_mpt_layer(layer, stats_max, stats_min)

    def head(self, params, x):
        from dgq_tpu.models.mpt import mpt_head

        return mpt_head(params, x, self.cfg)

    def kv_state(self, stats_min) -> KVQuantState:
        maxq = 255.0
        return KVQuantState(
            q_scale=2.0 * jnp.max(stats_min["q_states"]) / maxq,
            k_scale=2.0 * jnp.max(stats_min["k_states"]) / maxq,
            v_scale=2.0 * jnp.max(stats_min["v_states"]) / maxq,
        )


class FalconAdapter:
    """Falcon (parallel attention+MLP, MQA, rotary) — reference has block
    dispatch only; full support here."""

    name = "falcon"

    linears = {
        "query_key_value": (("self_attention", "query_key_value"), "qkv_inp"),
        "dense": (("self_attention", "dense"), "dense_inp"),
        "dense_h_to_4h": (("mlp", "dense_h_to_4h"), "fc1_inp"),
        "dense_4h_to_h": (("mlp", "dense_4h_to_h"), "fc2_inp"),
    }
    max_absmax_keys = ("attn_ln_out", "dense_inp", "fc2_inp")
    kv_keys = ("q_states", "k_states", "v_states")
    minmax_keys = ("attn_ln_out",)
    hessian_fams = ("qkv_inp", "dense_inp", "fc1_inp", "fc2_inp")

    def __init__(self, cfg):
        self.cfg = cfg

    def layers(self, params):
        return params["layers"]

    def rebuild(self, params, new_layers):
        out = dict(params)
        out["layers"] = new_layers
        return out

    def embed(self, params, input_ids):
        from dgq_tpu.models.falcon import falcon_embed

        return falcon_embed(params, input_ids, self.cfg)

    def make_aux(self, seqlen, dtype):
        from dgq_tpu.models.falcon import falcon_aux

        return falcon_aux(self.cfg, seqlen, dtype)

    def block(self, layer, x, aux, qs: QuantState, kv_scales, collect_stats=False):
        from dgq_tpu.models.falcon import falcon_block

        return falcon_block(layer, x, aux, self.cfg, qs, kv_scales, collect_stats)

    def smooth(self, layer, stats):
        from dgq_tpu.models.falcon import smooth_falcon_layer

        return smooth_falcon_layer(layer, stats)

    def meanact(self, layer, stats_max, stats_min):
        from dgq_tpu.models.falcon import meanact_falcon_layer

        return meanact_falcon_layer(layer, stats_max, stats_min)

    def head(self, params, x):
        from dgq_tpu.models.falcon import falcon_head

        return falcon_head(params, x, self.cfg)

    def kv_state(self, stats_min) -> KVQuantState:
        maxq = 255.0
        return KVQuantState(
            q_scale=2.0 * jnp.max(stats_min["q_states"]) / maxq,
            k_scale=2.0 * jnp.max(stats_min["k_states"]) / maxq,
            v_scale=2.0 * jnp.max(stats_min["v_states"]) / maxq,
        )


class MixtralAdapter:
    """Mixtral sparse-MoE (beyond-reference family; the reference has no MoE
    support at all).  The linear map is built per-instance — it depends on
    cfg.num_local_experts.  All experts' w1/w3 share the pre-routing
    activation family ("moe_inp"); each w2 gets its expert's DENSE
    intermediate (see models/mixtral.py module docstring for why).  The
    router gate is never quantized (tiny, control-flow-critical)."""

    name = "mixtral"

    kv_keys = ("q_rope", "k_rope", "v_rope")
    minmax_keys = ("attn_ln_out", "moe_ln_out")

    def __init__(self, cfg):
        self.cfg = cfg
        e = cfg.num_local_experts
        linears = {
            "q_proj": (("self_attn", "q_proj"), "qkv_inp"),
            "k_proj": (("self_attn", "k_proj"), "qkv_inp"),
            "v_proj": (("self_attn", "v_proj"), "qkv_inp"),
            "o_proj": (("self_attn", "o_proj"), "o_proj_inp"),
        }
        down_fams = []
        for i in range(e):
            base = ("block_sparse_moe", "experts", i)
            linears[f"e{i}.w1"] = (base + ("w1",), "moe_inp")
            linears[f"e{i}.w3"] = (base + ("w3",), "moe_inp")
            linears[f"e{i}.w2"] = (base + ("w2",), f"expert{i}_down_inp")
            down_fams.append(f"expert{i}_down_inp")
        self.linears = linears
        self.max_absmax_keys = (
            "attn_ln_out", "moe_ln_out", "o_proj_inp", *down_fams
        )
        self.hessian_fams = ("qkv_inp", "o_proj_inp", "moe_inp", *down_fams)

    def layers(self, params):
        return params["layers"]

    def rebuild(self, params, new_layers):
        out = dict(params)
        out["layers"] = new_layers
        return out

    def embed(self, params, input_ids):
        from dgq_tpu.models.mixtral import mixtral_embed

        return mixtral_embed(params, input_ids)

    def make_aux(self, seqlen, dtype):
        mask = llama_mod.causal_mask(seqlen, seqlen, dtype)
        cos, sin = llama_mod.rope_cos_sin(
            jnp.arange(seqlen), self.cfg.head_dim, self.cfg.rope_theta, dtype
        )
        return (mask, cos, sin)

    def block(self, layer, x, aux, qs: QuantState, kv_scales, collect_stats=False):
        from dgq_tpu.models.mixtral import mixtral_block

        mask, cos, sin = aux
        return mixtral_block(
            layer, x, mask, cos, sin, self.cfg, qs, kv_scales, collect_stats
        )

    def smooth(self, layer, stats):
        from dgq_tpu.models.mixtral import smooth_mixtral_layer

        e = self.cfg.num_local_experts
        s = {
            "attn_ln_out_absmax": stats["attn_ln_out"],
            "moe_ln_out_absmax": stats["moe_ln_out"],
        }
        for i in range(e):
            s[f"expert{i}_down_inp_absmax"] = stats[f"expert{i}_down_inp"]
        return smooth_mixtral_layer(layer, s)

    def meanact(self, layer, stats_max, stats_min):
        from dgq_tpu.models.mixtral import meanact_mixtral_layer

        return meanact_mixtral_layer(layer, stats_max, stats_min)

    def head(self, params, x):
        from dgq_tpu.models.mixtral import mixtral_head

        return mixtral_head(params, x, self.cfg)

    def kv_state(self, stats_min) -> KVQuantState:
        maxq = 255.0
        return KVQuantState(
            q_scale=2.0 * jnp.max(stats_min["q_rope"]) / maxq,
            k_scale=2.0 * jnp.max(stats_min["k_rope"]) / maxq,
            v_scale=2.0 * jnp.max(stats_min["v_rope"]) / maxq,
        )


def get_adapter(arch: str, cfg):
    return {
        "llama": LlamaAdapter,
        "opt": OPTAdapter,
        "bloom": BloomAdapter,
        "mpt": MPTAdapter,
        "falcon": FalconAdapter,
        "mixtral": MixtralAdapter,
    }[arch](cfg)
