"""A/B: flash-prefill Pallas kernel vs standard prefill at 7B, S=2048.

ROADMAP item 3 — decides the flash_prefill default.  One process builds the
engine once and compiles both paths; steady-state prefill is timed with
wall clock + device_get of a logits slice (prefill is a single dispatch, so
chained timing is unnecessary; repeats + median absorb tunnel jitter).
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import statistics
import time

import jax
import jax.numpy as jnp

from bench_decode import build_7b_engine  # same random 7B-shaped engine
from dgq_tpu.models.engine import EngineConfig, engine_forward, init_kv_cache
from dgq_tpu.models.llama import LlamaConfig


def time_prefill(ecfg, eng, ids, max_len, repeats):
    cache = init_kv_cache(ecfg.cfg, ids.shape[0], max_len)
    t0 = time.perf_counter()
    logits, _ = engine_forward(ecfg, eng, ids, cache)
    jax.device_get(logits[0, -1, :8])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        logits, _ = engine_forward(ecfg, eng, ids, cache)
        jax.device_get(logits[0, -1, :8])
        times.append(time.perf_counter() - t0)
    return compile_s, statistics.median(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prefill", type=int, default=2048)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()

    cfg = LlamaConfig(num_hidden_layers=args.layers)
    print(f"building 7B-shaped engine ({args.layers} layers)...", flush=True)
    eng = build_7b_engine(cfg)
    ids = jnp.zeros((1, args.prefill), jnp.int32)
    max_len = args.prefill + 64

    for flash in (False, True):
        ecfg = EngineConfig(cfg=cfg, use_kernel=True, flash_prefill=flash)
        c, dt = time_prefill(ecfg, eng, ids, max_len, args.repeats)
        toks = args.prefill / dt
        print(f"flash={flash}: compile {c:.1f}s, prefill({args.prefill}) "
              f"{dt*1e3:.1f} ms = {toks:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
