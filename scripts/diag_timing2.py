"""Steady-state chained throughput: long dependency chains + device_get.

If per-iter time is flat in chain length, we're measuring real device
throughput; bf16 (known peak ~197 TFLOPS) calibrates the method.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M = N = K = 4096
FLOPS = 2 * M * N * K


def chain_time(g, x, w, iters):
    a = x
    # warm
    for _ in range(3):
        a = g(a, w)
    jax.device_get(jnp.sum(a[:1, :1]))
    a = x
    t0 = time.perf_counter()
    for _ in range(iters):
        a = g(a, w)
    jax.device_get(jnp.sum(a[:1, :1]))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    xb = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

    g8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.int8)
    )
    gb = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
    )

    for iters in (20, 80):
        dt = chain_time(gb, xb, wb, iters)
        print(f"bf16 chain iters={iters:3d}: {dt*1e6:8.1f} us/iter  {FLOPS/dt/1e12:6.1f} TFLOPS", flush=True)
    for iters in (20, 80):
        dt = chain_time(g8, x8, w8, iters)
        print(f"int8 chain iters={iters:3d}: {dt*1e6:8.1f} us/iter  {FLOPS/dt/1e12:6.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
