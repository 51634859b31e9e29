"""Establish a trustworthy timing method over the axon tunnel.

Checks whether block_until_ready actually awaits device completion by
comparing three methods on a known-FLOP workload:
  1. naive loop + block_until_ready on last
  2. dependency-chained loop (each iter consumes the previous result)
  3. chained + jax.device_get of a scalar reduction
Scaling iters should scale wall time linearly if timing is honest.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M = N = K = 4096
FLOPS = 2 * M * N * K


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)

    f = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    f(x, w).block_until_ready()

    for iters in (10, 40):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(x, w)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"naive       iters={iters:3d}: {dt*1e6:9.1f} us/iter  {FLOPS/dt/1e12:7.1f} TOPS")

    # dependency chain: feed output back into input (int8 wrap is fine)
    g = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.int8)
    )
    a = x
    g(a, w).block_until_ready()
    for iters in (10, 40):
        a = x
        t0 = time.perf_counter()
        for _ in range(iters):
            a = g(a, w)
        a.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"chained     iters={iters:3d}: {dt*1e6:9.1f} us/iter  {FLOPS/dt/1e12:7.1f} TOPS")

    for iters in (10, 40):
        a = x
        t0 = time.perf_counter()
        for _ in range(iters):
            a = g(a, w)
        s = jax.device_get(jnp.sum(a.astype(jnp.int32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"chained+get iters={iters:3d}: {dt*1e6:9.1f} us/iter  {FLOPS/dt/1e12:7.1f} TOPS (sum={s})")


if __name__ == "__main__":
    main()
