"""Same-process decode-GEMV bakeoff at the qkv shape (K=4096, N=12288).

Interleaves candidates A/B/C/A/B/C with the hardened chain estimator so
tunnel window drift shows up as spread rather than bias:

  int8-xla   : s8 x s8 dot, M=8 (XLA reference feed rate)
  int4-xla   : s4 x s4 dot, M=16 (2x feed if the v5e int4 MXU path is real;
               x split into two int4 planes is exact: x = 16*hi + lo)
  plane-kern : the production fused_norm_gemv plane-dot Pallas kernel

int4 weights try to enter as device-resident S4 arrays (converted once on
device); if S4 jit arguments hit the axon dispatch recursion bug, falls
back to converting inside the step (reported separately — the conversion
then pollutes the number by ~K*N VPU ops per call).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.ops.fused_decode import fused_norm_gemv  # noqa: E402
from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

K, N = 4096, 12288


def main():
    r = np.random.default_rng(0)
    w8 = jnp.asarray(r.integers(-127, 127, (K, N)), jnp.int8)
    x8 = jnp.asarray(r.integers(-127, 127, (8, K)), jnp.int8)
    w4_s8 = jnp.asarray(r.integers(-8, 8, (K, N)), jnp.int8)
    x4_s8 = jnp.asarray(r.integers(-8, 8, (16, K)), jnp.int8)

    # production kernel operands
    qw = jnp.asarray(r.integers(-128, 127, (K // 2, N)), jnp.int8)
    g = K // 128
    sh, sl = (jnp.asarray(r.integers(1, 4, (g // 2, N)), jnp.int8) for _ in range(2))
    zh, zl = (jnp.asarray(r.integers(0, 16, (g // 2, N)), jnp.int8) for _ in range(2))
    al = jnp.asarray(r.random(N), jnp.float32) * 1e-4
    lnw = jnp.ones((K,), jnp.float32)

    def fb8(out, x):
        return (out[:, :K] & 0x7F).astype(jnp.int8)

    def dot8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    # --- int4 operand staging ---------------------------------------------
    s4_args_ok = True
    try:
        w4 = jax.jit(lambda w: w.astype(jnp.int4))(w4_s8)
        x4 = jax.jit(lambda x: x.astype(jnp.int4))(x4_s8)
        probe = jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
        )(x4, w4)
        np.asarray(jax.device_get(probe[0, :1]))
    except Exception as e:
        s4_args_ok = False
        print(f"S4-arg path unavailable: {type(e).__name__}: {str(e)[:150]}", flush=True)

    if s4_args_ok:
        def dot4(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )

        def fb4(out, x):
            return ((out[:, :K] & 0x7) - 4).astype(jnp.int4)

        int4_args = (x4, w4)
    else:
        def dot4(x, w):
            return jax.lax.dot_general(
                x.astype(jnp.int4), w.astype(jnp.int4), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

        def fb4(out, x):
            return ((out[:, :K] & 0x7) - 4).astype(jnp.int8)

        int4_args = (x4_s8, w4_s8)

    def kern(x, *args):
        y = fused_norm_gemv(x.astype(jnp.float32), lnw, None, *args)
        return y

    def fbk(out, x):
        return (out[:, :K].astype(jnp.int32) & 0x7F).astype(jnp.int8)

    cands = [
        ("int8-xla  ", dot8, (x8, w8), fb8, K * N),
        ("int4-xla  ", dot4, int4_args, fb4, K * N),
        ("plane-kern", kern, (x8, qw, sh, sl, zh, zl, al), fbk, K * N),
    ]
    for rep in range(3):
        for name, f, args, fb, elems in cands:
            try:
                t = device_time(f, *args, feedback=fb, iters=48, base_iters=12)
                print(f"[{rep}] {name}: {t*1e6:7.1f} us -> {elems/t/1e9:6.0f} G elem/s",
                      flush=True)
            except Exception as e:
                print(f"[{rep}] {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                      flush=True)


if __name__ == "__main__":
    main()
