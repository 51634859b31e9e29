"""Decode-shape microbenchmarks: each 7B GEMV kernel + decode attention,
measured individually with the chained harness.

Purpose (VERDICT r1 #3): decode at 7B/B=1 measured 16.1 ms/step vs the
4.7 ms weight-streaming floor with ~160 Pallas launches/step.  This script
attributes the residual: if a single GEMV runs near its weight-traffic
floor, the gap is inter-kernel glue / attention; if each launch carries a
large fixed cost, launch fusion is the fix.

Run: timeout 1800 python scripts/bench_gemv.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.ops.autotune import get_blocks
from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed
from dgq_tpu.utils.benchmarking import device_time

BW = 819e9  # v5e HBM bytes/s

# 7B decode GEMV shapes (N, K)
SHAPES = {
    "qkv": (12288, 4096),
    "o": (4096, 4096),
    "gate_up": (22528, 4096),
    "down": (4096, 11264),
}


def gemv_feedback(k):
    def fb(out, x):
        del x
        src = out[:, :k] if out.shape[1] >= k else jnp.pad(out, ((0, 0), (0, k - out.shape[1])))
        return (src.astype(jnp.int32) & 0x7F).astype(jnp.int8)
    return fb


def main():
    rng = np.random.default_rng(0)
    total = 0.0
    for name, (n, k) in SHAPES.items():
        x = jnp.asarray(rng.integers(-127, 128, (1, k)), jnp.int8)
        qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
        ws = jnp.asarray(rng.integers(1, 4, (k // 128, n)), jnp.int8)
        wz = jnp.asarray(rng.integers(0, 16, (k // 128, n)), jnp.int8)
        al = jnp.asarray(rng.random(n), jnp.float32)
        bm, bn, bk = get_blocks(1, n, k, groupsize=128, bm_hint=128)
        fn = functools.partial(w4a8_matmul_packed, bm=bm, bn=bn, bk=bk)
        dt = device_time(fn, x, qw, ws, wz, al,
                         feedback=gemv_feedback(k),
                         iters=128, base_iters=32, repeats=3)
        floor = (k // 2 * n) / BW
        total += dt
        print(f"{name:8s} N={n:5d} K={k:5d} blocks=({bm},{bn},{bk}): "
              f"{dt*1e6:7.1f} us  (weight floor {floor*1e6:6.1f} us, "
              f"{100*floor/dt:5.1f}%)", flush=True)

    print(f"\nsum of 4 GEMVs: {total*1e6:.1f} us; x32 layers = {total*32*1e3:.2f} ms "
          f"(7B floor ~4.2 ms)")

    # decode attention kernel at S=512, B=1
    from dgq_tpu.ops.attention import int8_decode_attention

    B, Hkv, H, Dh, Smax = 1, 32, 32, 128, 512
    q = jnp.asarray(rng.integers(-127, 128, (B, H, Dh)), jnp.int8)
    kc = jnp.asarray(rng.integers(-127, 128, (B, Hkv, Dh, Smax)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (B, Hkv, Smax, Dh)), jnp.int8)
    lengths = jnp.full((B,), 300, jnp.int32)

    def attn_fn(q_, kc_, vc_, lengths_):
        return int8_decode_attention(q_, kc_, vc_, lengths_,
                                     jnp.float32(0.05), jnp.float32(0.05),
                                     jnp.float32(0.05))

    def attn_feedback(out, q_):
        return (out.astype(jnp.int32) & 0x7F).astype(jnp.int8).reshape(q_.shape)

    try:
        dt = device_time(attn_fn, q, kc, vc, lengths,
                         feedback=attn_feedback,
                         iters=128, base_iters=32, repeats=3)
        print(f"decode_attention S={Smax}: {dt*1e6:.1f} us/call; "
              f"x32 layers = {dt*32*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        print("decode_attention bench failed:", repr(e)[:200])


if __name__ == "__main__":
    main()
