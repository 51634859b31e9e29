"""Paged vs dense KV decode A/B at LLaMA-7B shapes (single chip).

Two comparisons, both dependency-chained (token t+1 depends on logits t) so
wall-clock + device_get is honest through the axon tunnel:

  1. raw decode attention: int8_paged_decode_attention (page-table kernel)
     vs int8_decode_attention (whole-cache) vs the chunked kernel at the
     same context — isolates the page-gather cost;
  2. batched decode step: paged_decode_multi vs engine_decode_multi at the
     same slot occupancy, including the paged win when sequences are much
     shorter than max_len (the paged table is bucketed to allocated pages;
     the dense kernel always streams Smax).

Run ONE at a time through the tunnel; smoke first:
  python scripts/bench_paged.py --layers 2 --steps 8
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import jax

if "--cpu" in sys.argv:
    # the axon plugin re-pins jax_platforms programmatically; the env var
    # alone is not enough (and a wedged tunnel hangs even backend init)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def bench_attention(args, on_tpu):
    from dgq_tpu.ops.attention import (
        int8_decode_attention,
        int8_decode_attention_chunked,
        int8_paged_decode_attention,
    )

    b, hk, dh = args.batch, 32, 128
    h = hk
    ps = args.page_size
    smax = args.max_len
    npg = smax // ps
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-127, 128, (b, h, dh)), jnp.int8)
    kt = jnp.asarray(rng.integers(-127, 128, (b, hk, dh, smax)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (b, hk, smax, dh)), jnp.int8)
    kt_pool = jnp.asarray(
        rng.integers(-127, 128, (b * npg + 1, hk, dh, ps)), jnp.int8)
    v_pool = jnp.asarray(
        rng.integers(-127, 128, (b * npg + 1, hk, ps, dh)), jnp.int8)
    table = jnp.asarray(
        1 + np.arange(b * npg, dtype=np.int32).reshape(b, npg))
    lengths = jnp.full((b,), smax - 3, jnp.int32)
    s = jnp.float32(0.01)
    interp = not on_tpu

    def chain(fn, iters):
        # dependency-chain via folding the output back into q's low bits
        qq = q
        out = None
        t0 = time.time()
        for _ in range(iters):
            out = fn(qq)
            qq = jnp.clip(jnp.round(out[:, :, :dh] * 1e-3), -127, 127).astype(jnp.int8)
        jax.device_get(out[0, 0, 0])
        return (time.time() - t0) / iters

    from dgq_tpu.ops.attention import int4_paged_decode_attention

    kt4_pool = jnp.asarray(
        rng.integers(-128, 128, (b * npg + 1, hk, dh // 2, ps)), jnp.int8)
    v4_pool = jnp.asarray(
        rng.integers(-128, 128, (b * npg + 1, hk, ps, dh // 2)), jnp.int8)
    cands = {
        "dense": lambda qq: int8_decode_attention(
            qq, kt, v, lengths, s, s, s, interpret=interp),
        "paged": lambda qq: int8_paged_decode_attention(
            qq, kt_pool, v_pool, table, lengths, s, s, s, interpret=interp),
        # nibble pages: half the page bytes stream into VMEM
        "paged4": lambda qq: int4_paged_decode_attention(
            qq, kt4_pool, v4_pool, table, lengths, s, s, s, interpret=interp),
    }
    if smax % 1024 == 0:
        cands["chunk1k"] = lambda qq: int8_decode_attention_chunked(
            qq, kt, v, lengths, s, s, s, chunk=1024, interpret=interp)
    for name, fn in cands.items():
        fn(q)  # compile
        jax.device_get(fn(q)[0, 0, 0])
        dt = min(chain(fn, args.steps) for _ in range(3))
        print(f"attention {name:8s}: {dt * 1e6:9.1f} us/call "
              f"(B={b}, Smax={smax}, ps={ps})", flush=True)


def bench_batcher_step(args, on_tpu):
    from dgq_tpu.models.engine import EngineConfig
    from dgq_tpu.models.llama import LlamaConfig
    from dgq_tpu.models.synthetic import build_llama_engine
    from dgq_tpu.serving.batch_engine import engine_decode_multi, init_batched_cache
    from dgq_tpu.serving.paged import (
        PagedBatcher,
        init_paged_cache,
        paged_decode_multi,
    )

    cfg = LlamaConfig(num_hidden_layers=args.layers)
    ecfg = EngineConfig(cfg=cfg, use_kernel=on_tpu)
    print(f"building 7B-shaped engine ({args.layers} layers)...", flush=True)
    eng = build_llama_engine(cfg)
    B = args.batch
    steps = args.steps
    ps = args.page_size

    # occupancy: every slot mid-generation at `occupied` tokens
    occupied = args.occupied
    toks = jnp.zeros((B,), jnp.int32)
    active = jnp.ones((B,), bool)

    dense = init_batched_cache(cfg, B, args.max_len)
    dense = dense._replace(lengths=jnp.full((B,), occupied, jnp.int32))
    t, c = engine_decode_multi(ecfg, eng, toks, dense, active, steps)
    jax.device_get(t[-1, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        t, _ = engine_decode_multi(ecfg, eng, toks, dense, active, steps)
        jax.device_get(t[-1, 0])
        best = min(best, (time.time() - t0) / steps)
    print(f"dense decode: {best * 1e3:7.2f} ms/step (B={B}, Smax={args.max_len}, "
          f"len={occupied})", flush=True)
    del dense, t, c  # free the dense cache before the pool (7B + both OOMs)

    # paged: pool sized to B * occupied'ish; table bucketed to allocated pages
    need = B * (-(-(occupied + steps) // ps))
    paged = init_paged_cache(cfg, B, need + 1, ps)
    paged = paged._replace(lengths=jnp.full((B,), occupied, jnp.int32))
    npg_slot = -(-(occupied + steps) // ps)
    tw = 1
    while tw < npg_slot:
        tw *= 2
    tw = min(tw, -(-args.max_len // ps))
    table = np.zeros((B, tw), np.int32)
    nxt = 1
    for bslot in range(B):
        for lp in range(npg_slot):
            table[bslot, lp] = nxt
            nxt += 1
    table = jnp.asarray(table)
    t, c = paged_decode_multi(ecfg, eng, toks, paged, table, active, steps)
    jax.device_get(t[-1, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        t, _ = paged_decode_multi(ecfg, eng, toks, paged, table, active, steps)
        jax.device_get(t[-1, 0])
        best = min(best, (time.time() - t0) / steps)
    print(f"paged decode: {best * 1e3:7.2f} ms/step (B={B}, table width={tw} "
          f"pages of {ps} = {tw * ps} visible tokens)", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--page-size", type=int, default=128)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--occupied", type=int, default=256,
                   help="tokens already in each slot (paged pays only these)")
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (smoke testing; interpret kernels)")
    p.add_argument("--skip-attention", action="store_true")
    p.add_argument("--skip-step", action="store_true")
    args = p.parse_args()

    on_tpu = jax.default_backend() not in ("cpu",)
    print(f"backend: {jax.default_backend()}", flush=True)
    if not args.skip_attention:
        bench_attention(args, on_tpu)
    if not args.skip_step:
        bench_batcher_step(args, on_tpu)


if __name__ == "__main__":
    main()
