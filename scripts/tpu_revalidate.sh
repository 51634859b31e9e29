#!/bin/bash
# One-command TPU revalidation after a tunnel outage (run from repo root).
# Sequence matters: probe first (a wedged tunnel hangs even trivial work),
# then ONE TPU process at a time, each under timeout.  See
# ROADMAP.md "Round-2 decode attribution" for the measurement rules.
set -u
cd "$(dirname "$0")/.."

echo "== 1/8 tunnel probe (tiny matmul) =="
timeout 180 python - <<'EOF' || { echo "TUNNEL WEDGED - aborting"; exit 1; }
import time, jax, jax.numpy as jnp
t0 = time.time()
y = jax.jit(lambda a: a @ a)(jnp.ones((256, 256), jnp.bfloat16))
print("probe ok:", float(jax.device_get(y[0, 0])), jax.devices()[0].device_kind,
      f"{time.time()-t0:.1f}s")
EOF

echo "== 2/8 hardware kernel compile gate (all Pallas entry points) =="
timeout 900 python scripts/tpu_kernel_compile_gate.py || echo "compile gate FAILED"

echo "== 3/8 TP=1-mesh kernel smoke (shard_map + real kernels on chip) =="
timeout 600 python scripts/tp1_kernel_smoke.py || echo "tp1 smoke FAILED"

echo "== 3b/8 native-s4 rowpair GEMV A/B (bit-exactness + rotated pairs) =="
timeout 900 python scripts/ab_rp_gemv.py || echo "ab_rp_gemv FAILED"

echo "== 4/8 paged vs dense decode attention (B=8, 2k ctx) =="
timeout 900 python scripts/bench_paged.py --batch 8 --max-len 2048 \
  --steps 16 --layers 2 --skip-step || echo "bench_paged attention FAILED"

echo "== 5/8 paged vs dense batched decode step (7B shapes, 2 layers) =="
timeout 900 python scripts/bench_paged.py --batch 8 --max-len 2048 \
  --steps 16 --layers 2 --occupied 256 --skip-attention \
  || echo "bench_paged step FAILED"

echo "== 6/8 W4A8 vs bf16-dense decode baseline (7B, 32 steps) =="
timeout 1800 python scripts/bench_fp16_baseline.py || echo "fp16 baseline FAILED"

echo "== 6b/8 chip-scale PTQ e2e proof (calibrate->pack->engine, ~0.5B) =="
timeout 5400 python scripts/tpu_ptq_e2e.py --layers 8 --seq 256 --nsamples 2 \
  || echo "ptq e2e FAILED"

echo "== 7/8 driver benchmark (GEMM roofline + decode) =="
timeout 5400 python bench.py || echo "bench.py FAILED"
echo "done"
