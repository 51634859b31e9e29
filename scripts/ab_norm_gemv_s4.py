"""On-chip A/B: fused_norm_gemv (int8 MXU) vs fused_norm_gemv_s4 (int4 MXU)
at the 7B qkv GEMV shape.  Round-robin interleaved; correctness asserted
first (the s4 decomposition is exact, so outputs must match to f32
noise)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.ops.fused_decode import (  # noqa: E402
    fused_norm_gemv,
    fused_norm_gemv_s4,
    plane_colsums,
)
from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

B, K, N = 1, 4096, 12288


def main():
    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(B, K)) * 2, jnp.float32)
    lnw = jnp.asarray(r.random(K) + 0.5, jnp.float32)
    qw = jnp.asarray(r.integers(-128, 128, (K // 2, N)), jnp.int8)
    g = K // 128
    sh = jnp.asarray(r.integers(1, 4, (g // 2, N)), jnp.int8)
    sl = jnp.asarray(r.integers(1, 4, (g // 2, N)), jnp.int8)
    zh = jnp.asarray(r.integers(0, 16, (g // 2, N)), jnp.int8)
    zl = jnp.asarray(r.integers(0, 16, (g // 2, N)), jnp.int8)
    al = jnp.asarray(r.random(N), jnp.float32) * 1e-4
    csh, csl = plane_colsums(qw)
    csh, csl = jax.device_put(csh), jax.device_put(csl)

    def f8(xx):
        return fused_norm_gemv(xx, lnw, None, qw, sh, sl, zh, zl, al)

    def f4(xx):
        return fused_norm_gemv_s4(xx, lnw, None, qw, sh, sl, zh, zl, al,
                                  None, csh, csl)

    y8 = np.asarray(jax.device_get(f8(x)))
    y4 = np.asarray(jax.device_get(f4(x)))
    np.testing.assert_allclose(y4, y8, rtol=1e-5, atol=1e-4)
    print(f"parity OK on chip (max |d| = {np.abs(y4 - y8).max():.2e})",
          flush=True)

    def fb(out, xx):
        return jnp.tanh(out[:, :K]) * 2.0

    res = {"int8": [], "int4": []}
    floor = K * N / 2 / 819e9  # packed weight bytes / HBM BW
    for rep in range(4):
        for name, f in (("int8", f8), ("int4", f4)):
            t = device_time(f, x, feedback=fb, iters=64, base_iters=16,
                            repeats=2, min_dt=floor)
            res[name].append(t * 1e6)
            print(f"[{rep}] {name}: {t*1e6:7.1f} us "
                  f"({K*N/t/1e9:5.0f} G welem/s)", flush=True)
    b8, b4 = min(res["int8"]), min(res["int4"])
    print(f"best int8 {b8:7.1f} us | best int4 {b4:7.1f} us | "
          f"speedup {b8/b4:.3f}x")


if __name__ == "__main__":
    main()
