"""Does the v5e MXU consume int4 weights at 2x the int8 feed rate?

Decode is weight-feed-bound (probe_mxu_feed: time flat in M), and v5e
lists int4 at 2x int8 TOPS.  If an s4xs4 dot streams the weight operand
at 2x elem/s, the W4A8 GEMV can run natively in int4: split the int8
activation into two int4 planes (x = 16*x_hi + x_lo, stacked on M — M is
free when feed-bound) and keep the plane-dot corrections exact.

Times, at (K, N) = (4096, 12288), interleaved A/B/A/B to expose window
drift:
  a) int8 dot,   M=8   (reference feed rate)
  b) int4 dot,   M=16  (the candidate: same work, 2x feed if supported)
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

K, N = 4096, 12288


def main():
    r = np.random.default_rng(0)
    w8 = jnp.asarray(r.integers(-127, 127, (K, N)), jnp.int8)
    # int4 operands stay int8 at the jit boundary (the axon dispatch path
    # recurses on S4-typed arguments) and convert INSIDE the traced fn
    w4_s8 = jnp.asarray(r.integers(-8, 8, (K, N)), jnp.int8)
    x8 = jnp.asarray(r.integers(-127, 127, (8, K)), jnp.int8)
    x4_s8 = jnp.asarray(r.integers(-8, 8, (16, K)), jnp.int8)

    def dot8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    def dot4(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.int4), w.astype(jnp.int4), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def fb8(out, x):
        return (out[:, :K] & 0x7F).astype(jnp.int8)

    def fb4(out, x):
        return (out[:, :K] & 0x7).astype(jnp.int8)

    # Pipelined-dispatch timing (utils/benchmarking.device_time — the only
    # estimator validated through the tunnel; single giant-jit timings
    # return before the device finishes).  The per-call int8->int4
    # conversion is amortized by differencing a k=9-dot step against a
    # k=1-dot step: both steps pay one conversion, so it cancels.

    def mk_step(k, four):
        def step(x, w):
            wc = w.astype(jnp.int4) if four else w
            xc = x.astype(jnp.int4) if four else x
            d = None
            for _ in range(k):
                d = jax.lax.dot_general(
                    xc, wc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                xc = ((d[:, :K] & 0x7) - 4).astype(jnp.int4) if four \
                    else (d[:, :K] & 0x7F).astype(jnp.int8)
            return d

        return step

    def fb(out, x):
        return (out[:, :K] & 0x7F).astype(jnp.int8)

    kw = dict(feedback=fb, iters=48, base_iters=12)
    for rep in range(3):
        try:
            t8_1 = device_time(mk_step(1, False), x8, w8, **kw)
            t8_9 = device_time(mk_step(9, False), x8, w8, **kw)
            t8 = (t8_9 - t8_1) / 8
            print(f"[{rep}] int8 M=8 : {t8*1e6:7.1f} us/dot -> {K*N/t8/1e9:6.0f} G elem/s",
                  flush=True)
            t4_1 = device_time(mk_step(1, True), x4_s8, w4_s8, **kw)
            t4_9 = device_time(mk_step(9, True), x4_s8, w4_s8, **kw)
            t4 = (t4_9 - t4_1) / 8
            print(f"[{rep}] int4 M=16: {t4*1e6:7.1f} us/dot -> {K*N/t4/1e9:6.0f} G elem/s",
                  flush=True)
        except Exception as e:
            print(f"[{rep}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
            break


if __name__ == "__main__":
    main()
