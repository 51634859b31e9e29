"""Single-chip fused dequant-GEMM benchmark vs the INT8 MXU roofline."""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed, w4a8_matmul_xla
from dgq_tpu.quant.packing import pack_linear_w4w8, PackedLinear
from dgq_tpu.quant.search import naive_quantize

# v5e ("lite") peak: ~394.7 INT8 TOPS/chip, 197.4 bf16 TFLOPS
PEAK_INT8_OPS = {
    "v5e": 394.7e12,
    "v5p": 918e12,
    "v4": 275e12,
    "v6e": 1836e12,
}


def make_packed(n, k, g=128, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, k)).astype(np.float32)
    scale, zero, wq = naive_quantize(jnp.asarray(w), groupsize=g)
    # synthesize integer group scales/scale8 for the dual-grained layout
    s8 = jnp.max(jnp.abs(jnp.asarray(w)), axis=1) / 127.0
    iscale = jnp.clip(jnp.round(scale / s8[:, None]), 1, None)
    return pack_linear_w4w8(wq, iscale, zero, s8, g, amax=jnp.asarray(3.0))


def bench(fn, iters=20, warmup=5):
    for _ in range(warmup):
        fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=2048)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--bm", type=int, default=256)
    p.add_argument("--bn", type=int, default=256)
    p.add_argument("--gen", type=str, default="v5e")
    p.add_argument("--sweep", action="store_true")
    args = p.parse_args()

    lin = make_packed(args.n, args.k)
    rng = np.random.default_rng(1)
    x_s8 = jnp.asarray(rng.integers(-127, 128, size=(args.m, args.k)), jnp.int8)
    alpha = lin.wscales8 * (3.0 / 127.0)

    flops = 2 * args.m * args.n * args.k
    peak = PEAK_INT8_OPS[args.gen]

    def run(bm, bn):
        f = jax.jit(
            lambda x: w4a8_matmul_packed(
                x, lin.qweight, lin.wscales, lin.wzeros, alpha, bm=bm, bn=bn
            )
        )
        dt = bench(lambda: f(x_s8))
        tops = flops / dt / 1e12
        print(
            f"M={args.m} N={args.n} K={args.k} bm={bm} bn={bn}: "
            f"{dt*1e6:.1f} us, {tops:.1f} TOPS, {100*tops*1e12/peak:.1f}% of int8 peak"
        )
        return tops

    if args.sweep:
        best = (0, None)
        for bm in (128, 256, 512, 1024):
            for bn in (128, 256, 512, 1024):
                if bm * bn > 1024 * 512:
                    continue
                try:
                    tops = run(bm, bn)
                except Exception as e:
                    print(f"bm={bm} bn={bn}: FAILED {type(e).__name__}")
                    continue
                if tops > best[0]:
                    best = (tops, (bm, bn))
        print("best:", best)
    else:
        run(args.bm, args.bn)

    # correctness spot-check vs XLA path
    y_kernel = w4a8_matmul_packed(
        x_s8, lin.qweight, lin.wscales, lin.wzeros, alpha, bm=args.bm, bn=args.bn
    )
    from dgq_tpu.quant.packing import dequantize_to_int8

    w_s8 = dequantize_to_int8(lin)
    y_ref = (
        jax.lax.dot_general(
            x_s8, w_s8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        * alpha[None, :]
    )
    err = jnp.max(jnp.abs(y_kernel - y_ref))
    print("max abs err vs xla:", float(err))


if __name__ == "__main__":
    main()
