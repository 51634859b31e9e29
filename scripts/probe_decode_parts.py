"""Per-component decode-step budget on the real TPU.

Times dependency-chained launches of each decode component at exact
7B shapes (slope between two chain lengths cancels the tunnel's
dispatch constant), so the 19 ms/step budget can be attributed:
qkv GEMV / attention / o GEMV / MLP megakernel / glue.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.ops.attention import int8_decode_attention  # noqa: E402
from dgq_tpu.ops.fused_decode import (  # noqa: E402
    fused_mlp_decode,
    fused_norm_gemv,
    fused_requant_gemv,
)

D, NQKV, F, HK, DH, SMAX = 4096, 12288, 11264, 32, 128, 1024
B = 1


def mk_packed(k, n, seed):
    r = np.random.default_rng(seed)
    qw = jnp.asarray(r.integers(-128, 127, (k // 2, n)), jnp.int8)
    g = k // 128
    planes = tuple(
        jnp.asarray(r.integers(lo, hi, (g // 2, n)), jnp.int8)
        for lo, hi in ((1, 4), (1, 4), (0, 16), (0, 16))
    )
    repl = tuple(
        jnp.asarray(np.repeat(np.asarray(r.integers(lo, hi, (g, n)), np.int8), 8, 0))
        for lo, hi in ((1, 4), (0, 16))
    )
    al = jnp.asarray(r.random(n), jnp.float32) * 1e-4
    return qw, planes, repl, al


def timed_slope(make_fn, x0, ns=(8, 32), reps=4):
    ts = {}
    for n in ns:
        f = jax.jit(make_fn(n))
        out = f(x0)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x0)
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])


def main():
    lnw = jnp.ones((D,), jnp.float32)
    qkv_w = mk_packed(D, NQKV, 0)
    o_w = mk_packed(D, D, 1)
    gu_w = mk_packed(D, 2 * F, 2)
    dn_w = mk_packed(F, D, 3)
    x0 = jnp.asarray(np.random.default_rng(9).normal(size=(B, D)), jnp.float32)

    kt = jnp.asarray(np.random.default_rng(4).integers(-127, 127, (B, HK, DH, SMAX)), jnp.int8)
    vc = jnp.asarray(np.random.default_rng(5).integers(-127, 127, (B, HK, SMAX, DH)), jnp.int8)
    ln = jnp.asarray(512, jnp.int32)
    s = jnp.asarray(0.05, jnp.float32)

    def qkv_chain(n):
        qw, pl_, _, al = qkv_w

        def f(x):
            for _ in range(n):
                y = fused_norm_gemv(x, lnw, None, qw, *pl_, al)
                x = y[:, :D] * 1e-3
            return x
        return f

    def o_chain(n):
        qw, pl_, _, al = o_w

        def f(x):
            for _ in range(n):
                x = fused_requant_gemv(x, s, qw, *pl_, al, None, x) * 1e-3
            return x
        return f

    def mlp_chain(n):
        qw, pl_, _, al = gu_w
        dqw, _, drepl, dal = dn_w

        def f(x):
            for _ in range(n):
                x = fused_mlp_decode(x, lnw, None, qw, *pl_, al, s,
                                     dqw, *drepl, dal) * 1e-3
            return x
        return f

    def attn_chain(n):
        def f(x):
            q = jnp.clip(x[:, : HK * DH], -127, 127).astype(jnp.int8).reshape(B, HK, DH)
            for _ in range(n):
                ctx = int8_decode_attention(q, kt, vc, ln, s, s, s)
                q = jnp.clip(ctx.reshape(B, HK * DH) * 10, -127, 127).astype(jnp.int8).reshape(B, HK, DH)
            return q
        return f

    parts = [("qkv_gemv(4096x12288)", qkv_chain), ("o_gemv(4096x4096)", o_chain),
             ("mlp(4096,F=11264)", mlp_chain), ("attn(S=1024)", attn_chain)]
    total = 0.0
    for name, mk in parts:
        t0 = time.perf_counter()
        us = timed_slope(mk, x0) * 1e6
        print(f"{name}: {us:8.1f} us/iter   (probe took {time.perf_counter()-t0:.0f}s)", flush=True)
        total += us
    print(f"sum of parts x32 layers: {total*32/1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
