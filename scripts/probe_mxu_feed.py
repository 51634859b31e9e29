"""Is small-M int8 GEMM weight-feed-bound on the MXU?

Times XLA int8 GEMMs at fixed (K, N) = (4096, 12288) for several M with
the hardened chain estimator (utils/benchmarking.device_time); if time is
~flat in M until the FLOP bound takes over, the decode GEMV cap is the
MXU's stationary-operand feed rate and launch fusion cannot help — the
fix must change the compute path (e.g. a VPU GEMV).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.utils.benchmarking import device_time, int8_gemm_feedback  # noqa: E402

K, N = 4096, 12288


def main():
    r = np.random.default_rng(0)
    w8 = jnp.asarray(r.integers(-127, 127, (K, N)), jnp.int8)
    wb = jnp.asarray(r.normal(size=(K, N)), jnp.bfloat16)

    def gemm8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    for m in (8, 32, 128, 512):
        x8 = jnp.asarray(r.integers(-127, 127, (m, K)), jnp.int8)
        t = device_time(gemm8, x8, w8, feedback=int8_gemm_feedback(m, K),
                       iters=64, base_iters=16)
        print(f"int8 M={m:4d}: {t*1e6:7.1f} us  -> {K*N/t/1e9:6.0f} G elem/s",
              flush=True)

    def gemmb(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def fb_b(out, x):
        return out[:, :K].astype(jnp.bfloat16) * jnp.bfloat16(1e-3)

    for m in (8, 128):
        xb = jnp.asarray(r.normal(size=(m, K)), jnp.bfloat16)
        t = device_time(gemmb, xb, wb, feedback=fb_b, iters=64, base_iters=16)
        print(f"bf16 M={m:4d}: {t*1e6:7.1f} us  -> {K*N/t/1e9:6.0f} G elem/s",
              flush=True)


if __name__ == "__main__":
    main()
