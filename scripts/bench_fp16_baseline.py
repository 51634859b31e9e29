"""W4A8 engine decode vs a bf16 dense baseline at identical shapes.

The reference's headline claim is efficient low-bit inference ("Efficient
CUTLASS kernel implementation for fast inference", README.md:6) — this
script quantifies the TPU equivalent: 7B-shaped greedy decode steps/s for

  (a) the INT8 engine (packed W4A8 weights, fused Pallas dequant-GEMM,
      INT8 KV cache) — the bench.py decode round's program, and
  (b) a straight bf16 transformer step (bf16 weights, bf16 KV cache,
      XLA-native matmuls) — what a non-quantized JAX deployment runs.

Both run a 32-step on-device lax.scan (amortizes the tunnel's per-dispatch
cost; see ROADMAP "decode attribution").  Memory is the story: a 7B bf16
step streams ~13.5 GB of weights vs ~3.8 GB packed W4A8 — on the
HBM-bound decode path the packed engine's ceiling is ~3.5x.

Usage:  python scripts/bench_fp16_baseline.py [--layers N] [--steps N] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bf16_decode_fns(cfg):
    """Minimal bf16 decoder step with a bf16 KV cache (the unquantized
    baseline; deliberately plain XLA — what jax users run without DGQ)."""
    from dgq_tpu.models.llama import rms_norm, rope_cos_sin, rotate_half

    dh = cfg.head_dim
    h = cfg.num_attention_heads
    hk = cfg.num_key_value_heads

    def init_params(key):
        d, f, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
        ks = jax.random.split(key, 8)
        L = cfg.num_hidden_layers

        def w(k, shape):
            return (jax.random.normal(k, shape, jnp.bfloat16) * 0.02)

        return {
            "embed": w(ks[0], (v, d)),
            "lm_head": w(ks[1], (v, d)),
            "norm": jnp.ones((d,), jnp.bfloat16),
            "ln1": jnp.ones((L, d), jnp.bfloat16),
            "ln2": jnp.ones((L, d), jnp.bfloat16),
            "wqkv": w(ks[2], (L, d, (h + 2 * hk) * dh)),
            "wo": w(ks[3], (L, h * dh, d)),
            "wgu": w(ks[4], (L, d, 2 * cfg.intermediate_size)),
            "wd": w(ks[5], (L, cfg.intermediate_size, d)),
        }

    def step(params, tok, k_cache, v_cache, length):
        # tok (B, 1); caches (L, B, Hkv, Smax, Dh) bf16
        b = tok.shape[0]
        x = params["embed"][tok].astype(jnp.bfloat16)  # (B, 1, D)
        pos_cos, pos_sin = rope_cos_sin(length[None], dh, cfg.rope_theta, jnp.float32)

        def body(x, layer):
            ln1, ln2, wqkv, wo, wgu, wd, kc, vc = layer
            xn = rms_norm(x.astype(jnp.float32), ln1.astype(jnp.float32),
                          cfg.rms_norm_eps).astype(jnp.bfloat16)
            qkv = xn @ wqkv
            q, k, v = jnp.split(qkv, [h * dh, (h + hk) * dh], axis=-1)
            q = q.reshape(b, 1, h, dh).transpose(0, 2, 1, 3).astype(jnp.float32)
            k = k.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3).astype(jnp.float32)
            v = v.reshape(b, 1, hk, dh).transpose(0, 2, 1, 3)
            cos = pos_cos[None, None]
            sin = pos_sin[None, None]
            q = q * cos + rotate_half(q) * sin
            k = k * cos + rotate_half(k) * sin
            kc = jax.lax.dynamic_update_slice(
                kc, k.astype(jnp.bfloat16), (0, 0, length, 0))
            vc = jax.lax.dynamic_update_slice(vc, v, (0, 0, length, 0))
            rep = h // hk
            qg = q.reshape(b, hk, rep, dh)
            scores = jnp.einsum("bgrd,bgsd->bgrs", qg,
                                kc.astype(jnp.float32)) / (dh ** 0.5)
            smax = kc.shape[2]
            mask = jnp.arange(smax)[None, None, None, :] <= length
            scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
            p = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bgrs,bgsd->bgrd", p, vc.astype(jnp.float32))
            ctx = ctx.reshape(b, 1, h * dh).astype(jnp.bfloat16)
            x = x + ctx @ wo
            xn = rms_norm(x.astype(jnp.float32), ln2.astype(jnp.float32),
                          cfg.rms_norm_eps).astype(jnp.bfloat16)
            gu = xn @ wgu
            g, u = jnp.split(gu, 2, axis=-1)
            x = x + (jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16) * u) @ wd
            return x, (kc, vc)

        x, (k_cache, v_cache) = jax.lax.scan(
            body, x,
            (params["ln1"], params["ln2"], params["wqkv"], params["wo"],
             params["wgu"], params["wd"], k_cache, v_cache),
        )
        xf = rms_norm(x.astype(jnp.float32), params["norm"].astype(jnp.float32),
                      cfg.rms_norm_eps)
        logits = jnp.einsum("bsd,vd->bsv", xf, params["lm_head"].astype(jnp.float32))
        return logits, k_cache, v_cache

    return init_params, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--smax", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dgq_tpu.models.engine import EngineConfig, engine_forward, init_kv_cache
    from dgq_tpu.models.llama import LlamaConfig
    from dgq_tpu.models.synthetic import build_llama_engine

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = (LlamaConfig(num_hidden_layers=args.layers) if on_tpu
           else LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                            num_hidden_layers=min(args.layers, 2),
                            num_attention_heads=4, num_key_value_heads=4))
    steps = args.steps if on_tpu else 2

    def timed(run, reps=3):
        run()  # compile
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            run()
            best = min(best, (time.time() - t0) / steps)
        return best

    # (a) INT8 engine
    ecfg = EngineConfig(cfg=cfg, use_kernel=on_tpu)
    eng = build_llama_engine(cfg)
    cache0 = init_kv_cache(cfg, 1, args.smax)
    tok0 = jnp.zeros((1, 1), jnp.int32)
    logits, cache0 = engine_forward(ecfg, eng, tok0, cache0)

    import functools

    @functools.partial(jax.jit, static_argnums=())
    def eng_scan(e, t, c):
        def body(carry, _):
            t, c = carry
            lg, c = engine_forward(ecfg, e, t, c)
            return (jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32), c), None

        (t, c), _ = jax.lax.scan(body, (t, c), None, length=steps)
        return t

    def run_eng():
        jax.device_get(eng_scan(eng, tok0, cache0))

    dt_eng = timed(run_eng)

    # free phase (a) before materializing the bf16 weights: 7B bf16 is
    # ~13.5 GB and the packed engine ~4 GB — both resident OOMs a 16 GB v5e
    del eng, cache0, logits, run_eng, eng_scan
    import gc

    gc.collect()

    # (b) bf16 dense baseline
    init_params, step = bf16_decode_fns(cfg)
    fp = init_params(jax.random.PRNGKey(0))
    kc0 = jnp.zeros((cfg.num_hidden_layers, 1, cfg.num_key_value_heads,
                     args.smax, cfg.head_dim), jnp.bfloat16)
    vc0 = jnp.zeros_like(kc0)

    @jax.jit
    def fp_scan(p, t, kc, vc):
        def body(carry, i):
            t, kc, vc = carry
            lg, kc, vc = step(p, t, kc, vc, i)
            return (jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32), kc, vc), None

        (t, kc, vc), _ = jax.lax.scan(body, (t, kc, vc),
                                      jnp.arange(1, steps + 1))
        return t

    def run_fp():
        jax.device_get(fp_scan(fp, tok0, kc0, vc0))

    dt_fp = timed(run_fp)

    print({
        "backend": jax.default_backend(),
        "layers": cfg.num_hidden_layers,
        "int8_engine_ms_per_step": round(dt_eng * 1e3, 2),
        "bf16_dense_ms_per_step": round(dt_fp * 1e3, 2),
        "speedup_w4a8_vs_bf16": round(dt_fp / dt_eng, 2),
    })


if __name__ == "__main__":
    main()
