"""Measure per-pallas_call overhead on the axon TPU.

Runs a jitted chain of n dependency-chained tiny dequant-GEMV launches
(same shapes as one 7B decode linear) for two values of n; the slope
(t(n2)-t(n1))/(n2-n1) is the marginal cost of ONE extra pallas launch,
independent of dispatch/tunnel constants.  This decides whether decode
must be megakernelized (launch-bound) or the time is in the kernels
themselves (compute/DMA-bound).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed  # noqa: E402


def build(k=4096, n=4096, seed=0):
    r = np.random.default_rng(seed)
    qw = jnp.asarray(r.integers(-128, 127, size=(k // 2, n)), jnp.int8)
    sc = jnp.asarray(r.integers(1, 4, size=(8 * k // 128, n)), jnp.int8)
    zr = jnp.asarray(r.integers(0, 16, size=(8 * k // 128, n)), jnp.int8)
    al = jnp.asarray(r.random(n), jnp.float32) * 1e-4
    return qw, sc, zr, al


def chain_fn(nlaunch, qw, sc, zr, al, x):
    for _ in range(nlaunch):
        y = w4a8_matmul_packed(x, qw, sc, zr, al, bm=8, bn=512, bk=256)
        # requant back to int8 so the next launch consumes this one's output
        x = jnp.clip(jnp.round(y * 1e-2), -127, 127).astype(jnp.int8)
    return x


def timed(fn, x, reps=5):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x)
        np.asarray(jax.device_get(out[0, :1]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    qw, sc, zr, al = build()
    x = jnp.asarray(np.random.default_rng(1).integers(-127, 127, (8, 4096)), jnp.int8)

    results = {}
    for n in (8, 64):
        f = jax.jit(lambda x, n=n: chain_fn(n, qw, sc, zr, al, x))
        t0 = time.perf_counter()
        f(x)[0, :1].block_until_ready()
        print(f"n={n}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        results[n] = timed(f, x)
        print(f"n={n}: best {results[n]*1e3:.2f} ms", flush=True)

    ns = sorted(results)
    slope = (results[ns[-1]] - results[ns[0]]) / (ns[-1] - ns[0])
    print(f"per-launch marginal cost: {slope*1e6:.1f} us", flush=True)
    # analytic floor for one launch: 8.4MB weight+scale read @ ~819GB/s
    print(f"(DMA floor per launch ~{(4096*4096/2 + 2*8*32*4096)/819e9*1e6:.1f} us)", flush=True)


if __name__ == "__main__":
    main()
