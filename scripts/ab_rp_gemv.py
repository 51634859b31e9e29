"""On-chip A/B: native-s4 ROWPAIR decode GEMV (fused_norm_gemv_rp) vs the
int8 plane-dot production kernel (fused_norm_gemv) vs the unpack-s4 variant
(fused_norm_gemv_s4), at the 7B fused-qkv decode shape, rotated pairs with
burn — the round-3 drift-cancelling protocol.

Also asserts the three kernels agree BIT-EXACTLY on the chip first.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from dgq_tpu.ops.fused_decode import (  # noqa: E402
    fused_norm_gemv,
    fused_norm_gemv_rp,
    fused_norm_gemv_s4,
    pack_rowpair_s4,
    plane_colsums,
    rowpair_cs_fold,
)
from dgq_tpu.quant.packing import pack_nibbles  # noqa: E402
from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

K, N, B = 4096, 12288, 1  # 7B fused qkv GEMV
G, SPAN = 128, 256


def main():
    r = np.random.default_rng(0)
    codes = r.integers(0, 16, (K, N)).astype(np.int8)
    qw = pack_nibbles(jnp.asarray(codes), span=SPAN)
    sc = r.integers(1, 4, (K // G, N)).astype(np.int8)
    zr = r.integers(0, 16, (K // G, N)).astype(np.int8)
    sh, sl = jnp.asarray(sc[0::2]), jnp.asarray(sc[1::2])
    zh, zl = jnp.asarray(zr[0::2]), jnp.asarray(zr[1::2])
    al = jnp.asarray(r.random(N).astype(np.float32) * 1e-4)
    lnw = jnp.asarray(r.random(K).astype(np.float32) + 0.5)
    x = jnp.asarray(r.normal(size=(B, K)).astype(np.float32) * 2)

    qw_rp = pack_rowpair_s4(qw, SPAN)
    csf = rowpair_cs_fold(qw, SPAN, sh, sl)
    csh, csl = plane_colsums(qw, SPAN)

    def k_plane(xx):
        return fused_norm_gemv(xx, lnw, None, qw, sh, sl, zh, zl, al)

    def k_s4(xx):
        return fused_norm_gemv_s4(xx, lnw, None, qw, sh, sl, zh, zl, al,
                                  None, csh, csl)

    def k_rp(xx):
        return fused_norm_gemv_rp(xx, lnw, None, qw_rp, sh, sl, zh, zl,
                                  csf, al)

    # ---- exactness on chip -------------------------------------------------
    o_plane = np.asarray(k_plane(x))
    o_s4 = np.asarray(k_s4(x))
    o_rp = np.asarray(k_rp(x))
    print(f"rp vs plane: max|d| = {np.abs(o_rp - o_plane).max()}", flush=True)
    print(f"s4 vs plane: max|d| = {np.abs(o_s4 - o_plane).max()}", flush=True)
    assert np.array_equal(o_rp, o_plane), "rp kernel NOT bit-identical"

    # ---- rotated paired timing --------------------------------------------
    def fb(out, xx):
        # feed a weight-independent function of the output back as x so the
        # chain cannot be optimized across iterations
        return (xx + 1e-12 * out[:, :K]).astype(jnp.float32)

    cands = {"plane": k_plane, "s4": k_s4, "rp": k_rp}
    stats = {n: [] for n in cands}
    names = list(cands)
    for rep in range(6):
        order = names[rep % 3:] + names[:rep % 3]
        for nm in order:
            t = device_time(cands[nm], x, feedback=fb, iters=48, base_iters=12)
            stats[nm].append(t)
        line = " | ".join(
            f"{nm} {stats[nm][-1]*1e6:7.1f} us ({K*N/stats[nm][-1]/1e9:5.0f} G)"
            for nm in names)
        print(f"[{rep}] {line}", flush=True)
    print("\nbest-sustained (min):", flush=True)
    for nm in names:
        t = min(stats[nm])
        print(f"  {nm:6s}: {t*1e6:7.1f} us -> {K*N/t/1e9:6.0f} G welem/s",
              flush=True)
    tp, tr = min(stats["plane"]), min(stats["rp"])
    print(f"\nplane/rp best ratio = {tp/tr:.3f}  "
          f"({'rp WINS' if tr < tp else 'plane wins'})", flush=True)


if __name__ == "__main__":
    main()
