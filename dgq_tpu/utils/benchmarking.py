"""Honest device timing over async/tunneled backends.

``block_until_ready`` through the axon TPU tunnel does not await device
completion, so naive timing measures dispatch, not compute.  The harness
here chains N invocations with a real data dependency (each step's input is
derived from the previous step's output), fetches a scalar with
jax.device_get (the only truly synchronizing op), and differences two chain
lengths to cancel fixed dispatch/flush costs.

All operands are jit *arguments* (device-resident) — closure constants are
re-materialized per call on tunneled backends and poison measurements.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _default_chain(out: jax.Array, x: jax.Array) -> jax.Array:
    """Derive the next input from the output (forcing sequential device
    execution) while keeping x's shape/dtype and value distribution: add the
    output's low bit to one element of x."""
    bit = (out.reshape(-1)[0].astype(jnp.int32) & 1).astype(x.dtype)
    return x.at[(0,) * x.ndim].add(bit)


def device_time(
    fn: Callable,
    *args,
    iters: int = 24,
    base_iters: int = 8,
    chain: Optional[Callable] = None,
) -> float:
    """Seconds per invocation of fn(*args). ``chain(out, x)`` maps each
    output back into the next first-argument (default: perturb one element
    of x by the output's low bit, a true data dependency)."""
    chain = chain or _default_chain

    step = jax.jit(lambda x0, *rest: chain(fn(x0, *rest), x0))

    def run(n):
        x = args[0]
        for _ in range(n):
            x = step(x, *args[1:])
        jax.device_get(x.reshape(-1)[:1])

    run(2)  # warm compile + caches

    t0 = time.perf_counter()
    run(base_iters)
    t_short = time.perf_counter() - t0

    t0 = time.perf_counter()
    run(iters)
    t_long = time.perf_counter() - t0

    return max(t_long - t_short, 1e-9) / (iters - base_iters)


def gemm_tops(fn: Callable, args, m: int, n: int, k: int, **kw) -> Tuple[float, float]:
    """(seconds, TOPS) for a GEMM-shaped fn(*args)."""
    dt = device_time(fn, *args, **kw)
    return dt, 2.0 * m * n * k / dt / 1e12
