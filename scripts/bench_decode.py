"""LLaMA-7B-shaped single-chip decode throughput (BASELINE config 2).

Random dual-grained packed weights at real 7B shapes; greedy decode is
naturally dependency-chained (token t+1 depends on logits t), so wall-clock
over many steps with a device_get sync is honest even through the axon
tunnel.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.engine import (
    EngineConfig,
    engine_forward,
    init_kv_cache,
)
from dgq_tpu.models.llama import LlamaConfig


from dgq_tpu.models.synthetic import build_llama_engine as build_7b_engine  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--prefill", type=int, default=128)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--no-kernel", action="store_true")
    p.add_argument("--no-fused-decode", action="store_true",
                   help="disable the fused decode kernels (A/B baseline)")
    p.add_argument("--no-int4-mxu", action="store_true",
                   help="disable the native-s4 decode GEMVs (A/B baseline)")
    p.add_argument("--bm-decode", type=int, default=128)
    p.add_argument("--fused-loop", action="store_true",
                   help="run all decode steps in one on-device lax.scan")
    p.add_argument("--unroll", type=int, default=0,
                   help="unroll N decode steps per dispatch (isolates dispatch overhead)")
    args = p.parse_args()

    cfg = LlamaConfig(num_hidden_layers=args.layers)
    on_tpu = jax.default_backend() not in ("cpu",)
    ecfg = EngineConfig(cfg=cfg, use_kernel=on_tpu and not args.no_kernel, bm_decode=args.bm_decode,
                        fused_decode=not args.no_fused_decode,
                        int4_mxu=not args.no_int4_mxu)

    print(f"building 7B-shaped engine ({args.layers} layers)...", flush=True)
    # the int8 baseline leg needs the span layout (rp-only storage forces
    # the s4 path); the int4 leg stores rowpair only, like production
    eng = build_7b_engine(cfg, keep_span=args.no_int4_mxu)
    cache = init_kv_cache(cfg, args.batch, args.max_len)
    ids = jnp.zeros((args.batch, args.prefill), jnp.int32)

    if args.unroll:
        # skip prefill entirely: decode timing from an empty cache is
        # equivalent for dispatch-overhead isolation and halves compiles
        tok = jnp.zeros((args.batch, 1), jnp.int32)
    else:
        t0 = time.perf_counter()
        logits, cache = engine_forward(ecfg, eng, ids, cache)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        jax.device_get(tok)
        print(f"prefill({args.prefill}) + compile: {time.perf_counter() - t0:.1f}s", flush=True)

    # warm decode compile
    if not args.unroll:
        logits, cache = engine_forward(ecfg, eng, tok, cache)
        tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        jax.device_get(tok)

    if args.unroll:
        U = args.unroll

        # params MUST be a jit argument: closure-captured arrays are
        # re-materialized per call through the axon tunnel (~100x) and the
        # multi-GB constant capture explodes compile time
        @partial(jax.jit, static_argnames=("n",))
        def multi(e, tok0, cache0, n):
            tok, c = tok0, cache0
            for _ in range(n):
                lg, c = engine_forward(ecfg, e, tok, c)
                tok = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
            return tok, c

        t0 = time.perf_counter()
        tok_f, cache_f = multi(eng, tok, cache, n=U)
        jax.device_get(tok_f)
        print(f"unroll{U} compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
        n_calls = max(args.steps // U, 2)
        t0 = time.perf_counter()
        for _ in range(n_calls):
            tok, cache = multi(eng, tok, cache, n=U)
        jax.device_get(tok)
        dt = (time.perf_counter() - t0) / (n_calls * U)
        print(f"decode(unroll{U}): {dt*1e3:.2f} ms/step, {args.batch/dt:.1f} tok/s "
              f"(batch={args.batch}, kernel={ecfg.use_kernel})", flush=True)
        return
    if args.fused_loop:
        @jax.jit
        def multi_step(e, tok0, cache0):
            def body(carry, _):
                tok, c = carry
                lg, c = engine_forward(ecfg, e, tok, c)
                nt = jnp.argmax(lg[:, -1:, :], axis=-1).astype(jnp.int32)
                return (nt, c), None
            (tok_f, cache_f), _ = jax.lax.scan(body, (tok0, cache0), None, length=args.steps)
            return tok_f, cache_f

        tok_f, _ = multi_step(eng, tok, cache)  # compile
        jax.device_get(tok_f)
        t0 = time.perf_counter()
        tok_f, _ = multi_step(eng, tok, cache)
        jax.device_get(tok_f)
        dt = (time.perf_counter() - t0) / args.steps
    else:
        t0 = time.perf_counter()
        for _ in range(args.steps):
            logits, cache = engine_forward(ecfg, eng, tok, cache)
            tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        jax.device_get(tok)
        dt = (time.perf_counter() - t0) / args.steps
    print(
        f"decode: {dt*1e3:.2f} ms/step, {args.batch/dt:.1f} tok/s total "
        f"({1/dt:.1f} steps/s, batch={args.batch}, kernel={ecfg.use_kernel})",
        flush=True,
    )


if __name__ == "__main__":
    main()
