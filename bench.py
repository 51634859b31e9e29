"""Driver benchmark: prints ONE JSON line.

Primary metric: fused W4A8 dequant-GEMM throughput as a fraction of the
INT8 MXU roofline on LLaMA-7B GEMM shapes (the BASELINE.json north-star:
>= 0.90).  Measured with the dependency-chained harness
(dgq_tpu/utils/benchmarking.py) because block_until_ready through the axon
tunnel does not await device completion.  Extra fields carry the raw TOPS
and the XLA s8 GEMM reference measured identically.  ``vs_baseline`` =
value / 0.90 (ratio vs the target).
"""

import functools
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


PEAK_INT8_OPS = {"v5e": 394.7e12, "v5p": 918e12, "v4": 275e12, "v6e": 1836e12}


def _tpu_gen():
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "")
    if gen in PEAK_INT8_OPS:
        return gen
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    for g in PEAK_INT8_OPS:
        if g in kind:
            return g
    if "v5lite" in kind:
        return "v5e"
    return "v5e"


def main():
    from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
    from dgq_tpu.utils.benchmarking import gemm_tops

    on_tpu = jax.default_backend() not in ("cpu",)
    m, n, k, g = (2048, 4096, 4096, 128) if on_tpu else (256, 512, 512, 128)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    # fat-M blocks: scripts/sweep_gemm.py measured (2048, 512, bk=256) at
    # 339.8 TOPS (86.1% roofline) vs (1024, 1024) at 209.5 in the same
    # window — ~1.6x, reproduced across two tunnel windows
    bm, bn = (2048, 512) if on_tpu else (128, 128)
    kw = (
        dict(iters=96, base_iters=24, repeats=2)
        if on_tpu
        else dict(iters=3, base_iters=1, repeats=1)
    )

    fused = functools.partial(
        w4a8_matmul_packed, bm=bm, bn=bn, interpret=not on_tpu
    )

    def xla_s8(x_, w_):
        return jax.lax.dot_general(
            x_, w_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    # two interleaved measurement rounds: the tunnel has minutes-long
    # degraded windows; report the best sustained (max of per-round medians)
    rounds = 2 if on_tpu else 1
    best = (float("inf"), 0.0)
    best_ref = (float("inf"), 0.0)
    for _ in range(rounds):
        dt_i, tops_i = gemm_tops(fused, (x, qw, ws, wz, al), m, n, k, **kw)
        if tops_i > best[1]:
            best = (dt_i, tops_i)
        dtr_i, topsr_i = gemm_tops(xla_s8, (x, w8), m, n, k, **kw)
        if topsr_i > best_ref[1]:
            best_ref = (dtr_i, topsr_i)
    dt, tops = best
    dt_ref, tops_ref = best_ref

    peak = PEAK_INT8_OPS[_tpu_gen()] if on_tpu else 1e12
    frac = tops * 1e12 / peak

    result = {
        "metric": "fused W4A8 dequant-GEMM fraction of INT8 MXU roofline (M=2048 LLaMA-7B shape, best sustained of 2 rounds)",
        "value": round(frac, 4),
        "unit": "fraction_of_roofline",
        "vs_baseline": round(frac / 0.90, 4),
        "extra": {
            "fused_tops": round(tops, 1),
            "fused_us": round(dt * 1e6, 1),
            "xla_s8_tops": round(tops_ref, 1),
            "xla_s8_us": round(dt_ref * 1e6, 1),
            "fused_vs_xla_s8": round(tops / max(tops_ref, 1e-9), 3),
            "shape_mnk": [m, n, k],
            "block_mn": [bm, bn],
            "backend": jax.default_backend(),
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
