"""Smoothing transforms: function preservation and outlier reduction."""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import QuantState, llama_block, causal_mask, rope_cos_sin, tiny_llama_config, init_llama_params
from dgq_tpu.quant.smooth import (
    mean_ln_fcs,
    smooth_fc_weight,
    smooth_ln_fcs,
    smooth_ln_fcs_weight,
    smooth_llama_layer,
    smooth_llama_mlp,
)


def test_smooth_ln_fcs_preserves_function():
    """LN(x)*s then fc/s == original composition."""
    rng = np.random.default_rng(0)
    d, n = 64, 32
    ln_w = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    fc_w = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    act = jnp.asarray((np.abs(rng.normal(size=(d,))) + 0.1).astype(np.float32))
    act = act.at[0].set(50.0)  # an outlier channel
    new_ln, _, (new_fc,) = smooth_ln_fcs(ln_w, None, [fc_w], act)

    # simulate: y = fc @ (ln_w * h); smoothing must keep y identical
    h = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    y0 = fc_w @ (ln_w * h)
    y1 = new_fc @ (new_ln * h)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-4, atol=1e-4)


def test_smooth_ln_fcs_reduces_outlier_ratio():
    rng = np.random.default_rng(1)
    d, n = 256, 64
    ln_w = jnp.ones((d,))
    fc_w = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    act = jnp.asarray((np.abs(rng.normal(size=(d,))) + 0.1).astype(np.float32))
    act = act.at[7].set(100.0)
    new_ln, _, _ = smooth_ln_fcs(ln_w, None, [fc_w], act)
    # the outlier channel's LN gain shrinks, flattening the activation range
    smoothed_act = np.asarray(act) * np.asarray(new_ln)
    assert smoothed_act.max() / np.median(smoothed_act) < float(act.max() / jnp.median(act))


def test_smooth_llama_mlp_preserves_function():
    rng = np.random.default_rng(2)
    d, f = 32, 64
    up_w = jnp.asarray(rng.normal(size=(f, d)).astype(np.float32))
    down_w = jnp.asarray(rng.normal(size=(d, f)).astype(np.float32))
    gate_out = jnp.asarray(np.abs(rng.normal(size=(f,))).astype(np.float32))  # silu(gate) output
    act = jnp.asarray((np.abs(rng.normal(size=(f,))) + 0.1).astype(np.float32))
    new_up, _, new_down = smooth_llama_mlp(up_w, None, down_w, act)

    x = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    # down(gate_out * up(x)) must be preserved
    y0 = down_w @ (gate_out * (up_w @ x))
    y1 = new_down @ (gate_out * (new_up @ x))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-3, atol=1e-3)


def test_smooth_fc_weight_preserves_function():
    rng = np.random.default_rng(3)
    d = 48
    v_w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    o_w = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32))
    new_v, _, new_o = smooth_fc_weight(v_w, None, o_w)
    x = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(o_w @ (v_w @ x)), np.asarray(new_o @ (new_v @ x)), rtol=1e-3, atol=1e-3
    )


def test_smooth_llama_layer_preserves_block_output():
    cfg = tiny_llama_config()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    layer = params["layers"][0]
    s = 16
    x = jax.random.normal(jax.random.PRNGKey(1), (1, s, cfg.hidden_size))
    mask = causal_mask(s, s)
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.head_dim, cfg.rope_theta)
    qs = QuantState()
    y0, c = llama_block(layer, x, mask, cos, sin, cfg, qs, collect_stats=True)
    stats = {
        "attn_ln_out_absmax": jnp.max(jnp.abs(c["attn_ln_out"].reshape(-1, cfg.hidden_size)), axis=0),
        "mlp_ln_out_absmax": jnp.max(jnp.abs(c["mlp_ln_out"].reshape(-1, cfg.hidden_size)), axis=0),
        "down_proj_inp_absmax": jnp.max(jnp.abs(c["down_proj_inp"].reshape(-1, cfg.intermediate_size)), axis=0),
    }
    smoothed = smooth_llama_layer(layer, stats)
    y1 = llama_block(smoothed, x, mask, cos, sin, cfg, qs)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=5e-3, atol=5e-3)


def test_mean_ln_fcs_bias_fold():
    rng = np.random.default_rng(4)
    d, n = 16, 8
    ln_w = jnp.ones((d,))
    fc_w = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    med = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    new_ln_b, (new_fc_b,) = mean_ln_fcs(ln_w, None, [fc_w], [None], med)
    # (h - med) @ fc.T + fc @ med == h @ fc.T
    h = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    y0 = fc_w @ h
    y1 = fc_w @ (h + new_ln_b) + new_fc_b
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-4, atol=1e-4)
