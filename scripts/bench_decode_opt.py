"""OPT-6.7B-shaped single-chip decode throughput (second engine family on
real hardware)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import EngineLinear
from dgq_tpu.models.opt import OPTConfig
from dgq_tpu.models.opt_engine import (
    OPTEngineConfig,
    OPTEngineLayer,
    OPTEngineParams,
    init_opt_kv_cache,
    opt_engine_forward,
)


import numpy as np


def build_opt_engine(cfg: OPTConfig, seed=0) -> OPTEngineParams:
    """Synthesize ONE layer of random weights on the HOST (~100MB), ship it
    once, and tile to L layers on-device.  Anything else is too slow through
    the axon tunnel: per-linear jax.random ops pay a round-trip each (~1200
    dispatches for 32 layers) and a host-side full build ships ~3.3GB.
    Layer-identical weights are fine for a throughput bench."""
    d, f, L = cfg.hidden_size, cfg.ffn_dim, cfg.num_hidden_layers
    rng = np.random.default_rng(seed)

    def lin(n_out, n_in, g=128):
        return EngineLinear(
            qweight=rng.integers(-128, 128, (n_in // 2, n_out), dtype=np.int8),
            wscales=np.repeat(rng.integers(1, 4, (n_in // g, n_out), dtype=np.int8), 8, axis=0),
            wzeros=np.repeat(rng.integers(4, 12, (n_in // g, n_out), dtype=np.int8), 8, axis=0),
            alpha=np.full((n_out,), 1e-4, np.float32),
            bias=np.zeros((n_out,), np.float32),
        )

    one = OPTEngineLayer(
        ln1_weight=np.full((d,), 10.0, np.float32),
        ln1_bias=np.zeros((d,), np.float32),
        qkv_proj=lin(3 * d, d),
        out_proj=lin(d, d),
        ln2_weight=np.full((d,), 10.0, np.float32),
        ln2_bias=np.zeros((d,), np.float32),
        fc1=lin(f, d),
        fc2=lin(d, f),
        q_scale=np.float32(0.05),
        k_scale=np.float32(0.05),
        v_scale=np.float32(0.05),
        out_input_scale=np.float32(0.05),
        fc2_input_scale=np.float32(0.05),
    )
    one = jax.tree_util.tree_map(jnp.asarray, one)
    tile = jax.jit(lambda t: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (L,) + x.shape) + jnp.zeros_like(x[None]), t))
    stacked = jax.block_until_ready(tile(one))
    # zero embeds/lm_head: created on-device, no tunnel transfer; content is
    # irrelevant for throughput (TPUs don't skip zeros)
    return OPTEngineParams(
        embed_tokens=jnp.zeros((cfg.vocab_size, d), jnp.bfloat16),
        embed_positions=jnp.zeros((cfg.max_position_embeddings + 2, d), jnp.bfloat16),
        layers=stacked,
        final_ln_weight=jnp.ones((d,), jnp.float32),
        final_ln_bias=jnp.zeros((d,), jnp.float32),
        lm_head=jnp.zeros((cfg.vocab_size, d), jnp.bfloat16),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prefill", type=int, default=128)
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--layers", type=int, default=32)
    args = p.parse_args()

    cfg = OPTConfig(num_hidden_layers=args.layers)
    on_tpu = jax.default_backend() not in ("cpu",)
    ecfg = OPTEngineConfig(cfg=cfg, use_kernel=on_tpu, bm_decode=32)

    print(f"building OPT-6.7B-shaped engine ({args.layers} layers)...", flush=True)
    eng = build_opt_engine(cfg)
    cache = init_opt_kv_cache(cfg, args.batch, args.max_len)
    ids = jnp.zeros((args.batch, args.prefill), jnp.int32)

    t0 = time.perf_counter()
    logits, cache = opt_engine_forward(ecfg, eng, ids, cache)
    tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    jax.device_get(tok)
    print(f"prefill({args.prefill}) + compile: {time.perf_counter() - t0:.1f}s", flush=True)

    logits, cache = opt_engine_forward(ecfg, eng, tok, cache)
    tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    jax.device_get(tok)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        logits, cache = opt_engine_forward(ecfg, eng, tok, cache)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    jax.device_get(tok)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"OPT decode: {dt*1e3:.2f} ms/step, {args.batch/dt:.1f} tok/s "
          f"(batch={args.batch}, kernel={ecfg.use_kernel})", flush=True)


if __name__ == "__main__":
    main()
