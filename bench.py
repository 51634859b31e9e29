"""Driver benchmark: prints ONE JSON line.

Primary metric: fused W4A8 dequant-GEMM throughput as a fraction of the
INT8 MXU roofline on LLaMA-7B GEMM shapes (the BASELINE.json north-star:
>= 0.90).  Extra fields carry the raw TOPS and a decode-shaped GEMV
bandwidth figure.  ``vs_baseline`` = value / 0.90 (ratio vs the target).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


PEAK_INT8_OPS = {"v5e": 394.7e12, "v5p": 918e12, "v4": 275e12, "v6e": 1836e12}


def _tpu_gen():
    import os

    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if gen in PEAK_INT8_OPS:
        return gen
    kind = jax.devices()[0].device_kind.lower()
    for g in PEAK_INT8_OPS:
        if g in kind.replace(" ", ""):
            return g
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    return "v5e"


def _bench(fn, iters=30, warmup=5):
    for _ in range(warmup):
        fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
    from dgq_tpu.quant.packing import pack_linear_w4w8
    from dgq_tpu.quant.search import naive_quantize

    on_tpu = jax.default_backend() not in ("cpu",)
    m, n, k = (2048, 4096, 4096) if on_tpu else (256, 512, 512)
    g = 128

    rng = np.random.default_rng(0)
    w = rng.normal(size=(n, k)).astype(np.float32)
    scale, zero, wq = naive_quantize(jnp.asarray(w), groupsize=g)
    s8 = jnp.max(jnp.abs(jnp.asarray(w)), axis=1) / 127.0
    iscale = jnp.clip(jnp.round(scale / s8[:, None]), 1, None)
    lin = pack_linear_w4w8(wq, iscale, zero, s8, g, amax=jnp.asarray(3.0))
    alpha = lin.wscales8 * (3.0 / 127.0)
    x_s8 = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)

    bm, bn = (512, 512) if on_tpu else (128, 128)
    f = jax.jit(
        lambda x: w4a8_matmul_packed(
            x, lin.qweight, lin.wscales, lin.wzeros, alpha, bm=bm, bn=bn,
            interpret=not on_tpu,
        )
    )
    dt = _bench(lambda: f(x_s8), iters=30 if on_tpu else 2, warmup=5 if on_tpu else 1)
    tops = 2 * m * n * k / dt / 1e12
    peak = PEAK_INT8_OPS[_tpu_gen()] if on_tpu else 1e12
    frac = tops * 1e12 / peak

    result = {
        "metric": "fused W4A8 dequant-GEMM fraction of INT8 MXU roofline (M=2048 LLaMA-7B shape)",
        "value": round(frac, 4),
        "unit": "fraction_of_roofline",
        "vs_baseline": round(frac / 0.90, 4),
        "extra": {
            "tops": round(tops, 2),
            "gemm_us": round(dt * 1e6, 1),
            "shape_mnk": [m, n, k],
            "block_mn": [bm, bn],
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
