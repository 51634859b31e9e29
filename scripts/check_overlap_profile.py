"""Profile-based collective/compute overlap check (BASELINE config 5).

Measures whether XLA actually hides the row-parallel all-reduce under
independent compute on THIS mesh, by timing the same two-stream program
twice:

  free       : two independent microbatch chains; each layer is a
               row-parallel GEMM + psum.  XLA's latency-hiding scheduler
               may run stream B's GEMM while stream A's all-reduce is in
               flight.
  serialized : identical math, but jax.lax.optimization_barrier threads
               every psum result into BOTH streams' next inputs, forcing
               the schedule collective -> compute -> collective with no
               overlap window.

overlap_speedup = t_serialized / t_free.  ~1.0 = no overlap happening
(expected on a single host where 'collectives' are local copies);
meaningfully > 1 on a >= 2-host DCN/ICI mesh = the all-reduce is riding
under compute.  Run it when >= 2 hosts exist:

  python scripts/check_overlap_profile.py                 # real devices
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
    python scripts/check_overlap_profile.py --tp 8        # mechanism test

With --trace DIR it also captures a jax.profiler trace of the free
variant for manual inspection (look for overlapping all-reduce-start/done
spans under GEMM fusions in xplane).

The reference has no distributed layer at all (SURVEY §2.3); this check
exists because BASELINE config 5's exit criterion is measured overlap,
which needs hardware this environment lacks (single chip via tunnel).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=0, help="mesh size (0 = all devices)")
    ap.add_argument("--d", type=int, default=2048, help="model dim per chain")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    tp = args.tp or len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()[:tp]).reshape(tp), ("tp",))
    d, L = args.d, args.layers
    rng = np.random.default_rng(0)
    # row-parallel weights: (d/tp, d) shards contract the sharded dim -> psum
    w = jnp.asarray(rng.standard_normal((L, d, d)) * 0.02, jnp.bfloat16)
    xa = jnp.asarray(rng.standard_normal((256, d)) * 0.1, jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((256, d)) * 0.1, jnp.bfloat16)

    def chain_layer(x_loc, wl):
        # row-parallel GEMM: x_loc (B, d/tp) . wl (d/tp, d) -> partial (B, d)
        y = jax.lax.dot_general(x_loc, wl, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = jax.lax.psum(y, "tp")  # the collective under test
        k = y.shape[1] // tp
        r = jax.lax.axis_index("tp")
        # next layer's local column block of the replicated activation
        return jnp.tanh(jax.lax.dynamic_slice_in_dim(y, r * k, k, 1)).astype(
            jnp.bfloat16)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "tp"), P(None, "tp"), P(None, "tp", None)),
        out_specs=P(None, "tp"), check_rep=False,
    )
    def free(a, b, wsh):
        # two INDEPENDENT chains: XLA may overlap A's psum with B's GEMM
        for i in range(L):
            a = chain_layer(a, wsh[i])
            b = chain_layer(b, wsh[i])
        return a + b

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, "tp"), P(None, "tp"), P(None, "tp", None)),
        out_specs=P(None, "tp"), check_rep=False,
    )
    def serialized(a, b, wsh):
        # identical math; barriers thread each psum into BOTH next inputs,
        # leaving XLA no independent compute to hide the collective under
        for i in range(L):
            a = chain_layer(a, wsh[i])
            a, b = jax.lax.optimization_barrier((a, b))
            b = chain_layer(b, wsh[i])
            a, b = jax.lax.optimization_barrier((a, b))
        return a + b

    ffree = jax.jit(free)
    fser = jax.jit(serialized)
    ya = ffree(xa, xb, w)
    yb = fser(xa, xb, w)
    np.testing.assert_allclose(np.asarray(ya, np.float32),
                               np.asarray(yb, np.float32), rtol=2e-2, atol=2e-2)

    def bench(f):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            y = None
            a = xa
            for _ in range(args.iters):
                y = f(a, xb, w)
                a = y  # dependency chain: iter n+1 consumes iter n's output
            jax.device_get(y[0, 0])
            best = min(best, (time.time() - t0) / args.iters)
        return best

    t_free = bench(ffree)
    if args.trace:
        import jax.profiler

        with jax.profiler.trace(args.trace):
            jax.device_get(ffree(xa, xb, w)[0, 0])
        print(f"trace written to {args.trace}", flush=True)
    t_ser = bench(fser)
    ratio = t_ser / t_free
    print(f"devices={tp} d={d} layers={L}")
    print(f"free      : {t_free * 1e3:8.2f} ms/iter")
    print(f"serialized: {t_ser * 1e3:8.2f} ms/iter")
    print(f"overlap_speedup = {ratio:.3f} "
          f"({'overlap measured' if ratio > 1.05 else 'no overlap (expected on single-host/CPU)'})")


if __name__ == "__main__":
    main()
