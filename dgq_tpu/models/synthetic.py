"""Synthetic (random-weight) engines at real model shapes.

Used by the decode benchmarks (scripts/bench_decode.py, bench.py) and the
hardware probes: exercising the exact 7B engine dataflow without weights
on disk.  Weights are random but layout-exact — packed span nibbles,
8x-replicated scales for the prefill GEMM, compact hi/lo plane rows for
the plane-dot decode kernels (see models/engine.EngineLinear)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import EngineLayer, EngineLinear, EngineParams
from dgq_tpu.models.llama import LlamaConfig


def random_engine_linear(key, n_out: int, n_in: int, g: int = 128) -> EngineLinear:
    k1, k2, k3 = jax.random.split(key, 3)
    ws = jax.random.randint(k2, (n_in // g, n_out), 1, 4, jnp.int8)
    wz = jax.random.randint(k3, (n_in // g, n_out), 4, 12, jnp.int8)
    return EngineLinear(
        qweight=jax.random.randint(k1, (n_in // 2, n_out), -128, 128, jnp.int8),
        wscales=jnp.repeat(ws, 8, axis=0),
        wzeros=jnp.repeat(wz, 8, axis=0),
        alpha=jnp.full((n_out,), 1e-4, jnp.float32),
        bias=None,
        s_hi=ws[0::2],
        s_lo=ws[1::2],
        z_hi=wz[0::2],
        z_lo=wz[1::2],
    )


def build_llama_engine(cfg: LlamaConfig, seed: int = 0,
                       keep_span: bool = False) -> EngineParams:
    """Random engine params at cfg's exact shapes (MLP dim padded to the
    from_ptq pad_to granularity, as engine conversion would).  Like
    from_ptq, stores the rowpair (native-s4) layout only unless
    ``keep_span`` — dual storage doubles weight HBM."""
    d, f = cfg.hidden_size, cfg.intermediate_size
    f = -(-f // 1024) * 1024
    nq = cfg.num_attention_heads * cfg.head_dim
    nkv = cfg.num_key_value_heads * cfg.head_dim
    keys = jax.random.split(jax.random.PRNGKey(seed), cfg.num_hidden_layers * 7 + 2)
    per_layer = []
    ki = 0
    for _ in range(cfg.num_hidden_layers):
        per_layer.append(
            EngineLayer(
                ln1_weight=jnp.ones((d,), jnp.float32) * 10.0,
                ln1_bias=None,
                ln2_weight=jnp.ones((d,), jnp.float32) * 10.0,
                ln2_bias=None,
                qkv_proj=random_engine_linear(keys[ki + 0], nq + 2 * nkv, d),
                o_proj=random_engine_linear(keys[ki + 3], d, nq),
                gate_up_proj=random_engine_linear(keys[ki + 4], 2 * f, d),
                down_proj=random_engine_linear(keys[ki + 6], d, f),
                q_scale=jnp.float32(0.05),
                k_scale=jnp.float32(0.05),
                v_scale=jnp.float32(0.05),
                out_input_scale=jnp.float32(0.05),
                down_input_scale=jnp.float32(0.05),
            )
        )
        ki += 7
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    from dgq_tpu.models.engine import add_rowpair

    return add_rowpair(EngineParams(
        embed_tokens=jax.random.normal(keys[-2], (cfg.vocab_size, d), jnp.bfloat16) * 0.02,
        layers=stacked,
        norm_weight=jnp.ones((d,), jnp.float32),
        lm_head=jax.random.normal(keys[-1], (cfg.vocab_size, d), jnp.bfloat16) * 0.02,
        rms_eps=cfg.rms_norm_eps,
    ), drop_span=not keep_span)
