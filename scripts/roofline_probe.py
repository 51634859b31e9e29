"""Machine-ceiling probe: what fraction of the v5e INT8 roofline can ANY
GEMM reach here?

Measures, paired against the fused-kernel control:
  * a pure s8 Pallas GEMM (identical tiling, NO unpack/dequant) — if it
    matches the fused kernel, the dequant is fully hidden under the MXU and
    the fused kernel is at machine speed-of-light,
  * the same pure GEMM at other tilings (searching for a higher ceiling),
  * XLA's s8 dot_general (the framework baseline).

Run: timeout 2400 python scripts/roofline_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
from dgq_tpu.utils.benchmarking import gemm_tops

M, N, K, G = 2048, 4096, 4096, 128
PEAK = 394.7


def _s8_kernel(x_ref, w_ref, out_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def s8_matmul(x, w, *, bm, bn, bk):
    m, k = x.shape
    _, n = w.shape
    nk = k // bk
    return pl.pallas_call(
        functools.partial(_s8_kernel, nk=nk),
        grid=(m // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, w)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    kw = dict(iters=96, base_iters=24, repeats=5)

    control = functools.partial(w4a8_matmul_packed, bm=2048, bn=512, bk=256)

    def xla_s8(x_, w_):
        return jax.lax.dot_general(
            x_, w_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    cands = {
        "s8_pallas(2048,512,256)": (functools.partial(s8_matmul, bm=2048, bn=512, bk=256), (x, w8)),
        "s8_pallas(512,512,4096)": (functools.partial(s8_matmul, bm=512, bn=512, bk=4096), (x, w8)),
        "s8_pallas(1024,512,1024)": (functools.partial(s8_matmul, bm=1024, bn=512, bk=1024), (x, w8)),
        "s8_pallas(2048,512,512)": (functools.partial(s8_matmul, bm=2048, bn=512, bk=512), (x, w8)),
        "s8_pallas(2048,1024,256)": (functools.partial(s8_matmul, bm=2048, bn=1024, bk=256), (x, w8)),
        "xla_s8": (xla_s8, (x, w8)),
        "fused(512,512,4096)": (functools.partial(w4a8_matmul_packed, bm=512, bn=512, bk=4096), (x, qw, ws, wz, al)),
    }

    # warm compiles
    for name, (fn, args) in list(cands.items()):
        try:
            gemm_tops(fn, args, M, N, K, iters=4, base_iters=1, repeats=1)
        except Exception as e:  # noqa: BLE001
            print(f"warm {name} FAILED {repr(e)[:100]}", flush=True)
            del cands[name]
    gemm_tops(control, (x, qw, ws, wz, al), M, N, K, iters=4, base_iters=1, repeats=1)

    ratios = {n: [] for n in cands}
    best_abs = {n: 0.0 for n in list(cands) + ["control"]}
    for p in range(4):
        for name, (fn, args) in cands.items():
            try:
                _, t_ctrl = gemm_tops(control, (x, qw, ws, wz, al), M, N, K, **kw)
                _, t_cand = gemm_tops(fn, args, M, N, K, **kw)
            except Exception as e:  # noqa: BLE001
                print(f"pair {p} {name} failed {repr(e)[:80]}", flush=True)
                continue
            ratios[name].append(t_cand / t_ctrl)
            best_abs[name] = max(best_abs[name], t_cand)
            best_abs["control"] = max(best_abs["control"], t_ctrl)
            print(f"pair {p} {name}: cand {t_cand:6.1f} ctrl {t_ctrl:6.1f} "
                  f"ratio {t_cand/t_ctrl:.3f}", flush=True)

    print("\n== median paired ratio vs fused control ==")
    for name, rs in ratios.items():
        if rs:
            med = sorted(rs)[len(rs) // 2]
            print(f"{name}: {med:.3f}x  (spread {min(rs):.3f}-{max(rs):.3f}, "
                  f"best abs {best_abs[name]:.1f} TOPS = {100*best_abs[name]/PEAK:.1f}%)")
    print(f"control best abs: {best_abs['control']:.1f} TOPS "
          f"({100*best_abs['control']/PEAK:.1f}%)")


if __name__ == "__main__":
    main()
