"""Serving-throughput attribution probe (VERDICT r2 #2).

Replicates bench.py's worker_serving scenario (7B random engine, 8 slots,
16 requests x 48-token prompts x 64 new tokens) on the real chip and prints
the scheduler's per-dispatch-kind timing table, so the gap between device
capability (~262 tok/s at B=8) and end-to-end serving throughput is
attributed by measurement, not guesswork.

Usage: python scripts/probe_serving_breakdown.py [--steps N] [--slots N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--decode-steps", type=int, default=8)
    ap.add_argument("--reqs", type=int, default=16)
    ap.add_argument("--new-toks", type=int, default=64)
    ap.add_argument("--layers", type=int, default=32)
    args = ap.parse_args()

    import jax

    from dgq_tpu.models.engine import EngineConfig
    from dgq_tpu.models.llama import LlamaConfig
    from dgq_tpu.models.synthetic import build_llama_engine
    from dgq_tpu.serving.scheduler import ContinuousBatcher, Request

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = LlamaConfig(num_hidden_layers=args.layers) if on_tpu else LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4)
    eng = build_llama_engine(cfg)
    b = ContinuousBatcher(
        EngineConfig(cfg=cfg, use_kernel=on_tpu), eng,
        num_slots=args.slots, max_len=512, prefill_pad=128,
        admit_batch=4, decode_steps=args.decode_steps,
    )
    rng = np.random.default_rng(0)
    reqs = [Request(uid=i,
                    prompt_ids=rng.integers(0, cfg.vocab_size, 48).astype(np.int32),
                    max_new_tokens=args.new_toks)
            for i in range(args.reqs)]
    # warm every program shape the stream hits
    print("warming...", flush=True)
    b.add_request(Request(uid=10_000, prompt_ids=reqs[0].prompt_ids.copy(),
                          max_new_tokens=2))
    b.run()
    for i in range(b.num_slots):
        b.add_request(Request(uid=10_001 + i, prompt_ids=reqs[0].prompt_ids.copy(),
                              max_new_tokens=b.decode_steps + 2))
    b.run()
    b.finished = []
    b.timings = {}
    print("measuring...", flush=True)
    t0 = time.time()
    for r in reqs:
        b.add_request(r)
    done = b.run()
    dt = time.time() - t0
    toks = sum(len(r.output_ids) for r in done)
    m = b.metrics()
    out = {
        "serving_tok_s": round(toks / dt, 1),
        "wall_s": round(dt, 3),
        "tokens": toks,
        "requests": len(done),
        "timings": m.get("dispatch_timings", {}),
    }
    acc = sum(v["total_s"] for v in out["timings"].values())
    out["accounted_s"] = round(acc, 3)
    out["unaccounted_s"] = round(dt - acc, 3)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
