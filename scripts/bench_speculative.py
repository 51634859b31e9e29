"""7B speculative-decoding A/B on the real TPU.

Plain per-step greedy decode vs prompt-lookup speculative decode
(serving/speculative.py) on repetitive text (the favorable case — code and
structured text behave like this; worst case degrades to ~plain).

CAVEAT on this measurement through the axon tunnel: plain generate() keeps
tokens device-resident and pipelines its dispatches (no per-step host
sync), while speculation must device_get the acceptance result every step
— through the tunnel that blocking round trip costs tens of ms, so spec
measures SLOWER here (observed 0.33x at 2.09 accepted tok/step) even
though the device-side verify step is ~decode-cost.  On a direct-attached
production TPU the RTT is ~0.1 ms and the acceptance multiple is the
dominant term.  The number to read from this script is the accepted
tokens/step, not the tunnel-bound tok/s.

Usage: python scripts/bench_speculative.py [--layers N] [--tokens N]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.models.engine import EngineConfig, generate  # noqa: E402
from dgq_tpu.models.llama import LlamaConfig  # noqa: E402
from dgq_tpu.models.synthetic import build_llama_engine  # noqa: E402
from dgq_tpu.serving.speculative import generate_speculative  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=48)
    ap.add_argument("--spec-k", type=int, default=4)
    ap.add_argument("--chunk-steps", type=int, default=8)
    args = ap.parse_args()

    cfg = LlamaConfig(num_hidden_layers=args.layers)
    ecfg = EngineConfig(cfg=cfg)
    eng = build_llama_engine(cfg)
    # period-3 repetitive prompt: random-weight models loop, prompt-lookup accepts
    pat = [11, 523, 7042]
    prompt = jnp.asarray([(pat * 12)[:32]], jnp.int32)
    max_len = 32 + args.tokens + args.spec_k + 2

    print("compiling + warmup (plain)...", flush=True)
    t0 = time.time()
    ref = generate(ecfg, eng, prompt, max_new_tokens=args.tokens, max_len=max_len)
    jax.device_get(ref)
    print(f"  plain warm path done in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    ref = generate(ecfg, eng, prompt, max_new_tokens=args.tokens, max_len=max_len)
    jax.device_get(ref)
    t_plain = time.time() - t0

    print("compiling + warmup (speculative)...", flush=True)
    t0 = time.time()
    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=args.tokens,
                                      max_len=max_len, spec_k=args.spec_k)
    print(f"  spec warm path done in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=args.tokens,
                                      max_len=max_len, spec_k=args.spec_k)
    t_spec = time.time() - t0

    print("compiling + warmup (speculative, on-device scan)...", flush=True)
    max_len_d = 32 + args.tokens + args.chunk_steps * (args.spec_k + 1) + args.spec_k + 2
    t0 = time.time()
    out_d, stats_d = generate_speculative(
        ecfg, eng, prompt, max_new_tokens=args.tokens, max_len=max_len_d,
        spec_k=args.spec_k, ondevice=True, chunk_steps=args.chunk_steps)
    print(f"  on-device warm path done in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    out_d, stats_d = generate_speculative(
        ecfg, eng, prompt, max_new_tokens=args.tokens, max_len=max_len_d,
        spec_k=args.spec_k, ondevice=True, chunk_steps=args.chunk_steps)
    t_spec_dev = time.time() - t0

    ref_np, out_np = np.asarray(ref)[0], np.asarray(out)[0]
    if np.array_equal(ref_np, out_np):
        print("outputs identical (greedy-exact)")
    else:
        div = int(np.argmax(ref_np != out_np))
        print(f"outputs diverge at token {div}/{args.tokens}: "
              f"plain {ref_np[max(0,div-2):div+3]} vs spec {out_np[max(0,div-2):div+3]}")
        print("(kernel-path decode (fused GEMV) and verify (prefill GEMM) differ "
              "in fp rounding; near-tie argmax flips are expected on random weights)")
    print(f"plain    : {args.tokens/t_plain:6.1f} tok/s  ({t_plain*1e3/args.tokens:.1f} ms/tok)")
    print(f"spec host: {args.tokens/t_spec:6.1f} tok/s  ({t_spec*1e3/args.tokens:.1f} ms/tok)  "
          f"accepted {stats['tokens_per_step']:.2f} tok/step over {stats['steps']} steps")
    print(f"spec scan: {args.tokens/t_spec_dev:6.1f} tok/s  ({t_spec_dev*1e3/args.tokens:.1f} ms/tok)  "
          f"accepted {stats_d['tokens_per_step']:.2f} tok/step over {stats_d['steps']} steps")
    print(f"speedups vs plain: host {t_plain/t_spec:.2f}x, on-device scan {t_plain/t_spec_dev:.2f}x")


if __name__ == "__main__":
    main()
