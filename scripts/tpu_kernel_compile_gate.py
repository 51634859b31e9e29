"""Real-hardware compile gate: build + run EVERY Pallas kernel family once
on the actual TPU (non-interpret), tiny shapes.

Why this exists: interpret mode accepts ops Mosaic cannot legalize on
silicon — round 3 found int4_paged_decode_attention failing with
``arith.shli on vector<i8>`` on the chip after the whole CPU suite passed.
This gate turns "compiles in interpret mode" into "compiles on hardware"
for every kernel entry point, cheaply (compile time dominates; the runs are
tiny).

Run: python scripts/tpu_kernel_compile_gate.py           (~3-6 min)
     python scripts/tpu_kernel_compile_gate.py --only attention
Exit code 0 = all kernels compiled + ran + (where cheap) matched their XLA
reference; non-zero lists the failures.
"""

import argparse
import sys
import os
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _ok(name, results):
    print(f"PASS {name}", flush=True)
    results.append((name, None))


def _fail(name, e, results):
    print(f"FAIL {name}: {repr(e)[:200]}", flush=True)
    results.append((name, e))


def gate_quant_matmul(results):
    import jax.numpy as jnp
    from dgq_tpu.ops.quant_matmul import (
        w4a8_fpscale_matmul_packed,
        w4a8_matmul_packed,
        w4a8_matmul_pipe,
        w4a8_matmul_twopass,
        w4a8_matmul_wres,
    )

    rng = np.random.default_rng(0)
    m, k, n, g = 256, 1024, 512, 128
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (k // 2, n)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (k // g, n)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (k // g, n)), jnp.int8)
    al = jnp.asarray(rng.random(n), jnp.float32)
    wsf = jnp.asarray(rng.random((k // g, n)) + 0.5, jnp.float32)

    def _rp_pipe():
        from dgq_tpu.ops.fused_decode import pack_rowpair_s4
        from dgq_tpu.ops.quant_matmul import w4a8_matmul_rp_pipe

        qw_rp = pack_rowpair_s4(qw, 2 * g)
        return w4a8_matmul_rp_pipe(x, qw_rp, ws, wz, al, groupsize=g,
                                   bm=128, bn=256, bk=512)

    ref = None
    cands = [
        ("quant_matmul.packed", lambda: w4a8_matmul_packed(
            x, qw, ws, wz, al, bm=128, bn=256, bk=256)),
        ("quant_matmul.packed_split", lambda: w4a8_matmul_packed(
            x, qw, ws, wz, al, bm=128, bn=256, bk=256, split_dots=True)),
        ("quant_matmul.packed_int8out", lambda: w4a8_matmul_packed(
            x, qw, ws, wz, al, bm=128, bn=256, bk=256, out_dtype=jnp.int8)),
        ("quant_matmul.wres", lambda: w4a8_matmul_wres(
            x, qw, ws, wz, al, bm=128, bn=256)),
        ("quant_matmul.pipe", lambda: w4a8_matmul_pipe(
            x, qw, ws, wz, al, bm=128, bn=256, bk=512)),
        ("quant_matmul.rp_pipe", lambda: _rp_pipe()),
        ("quant_matmul.twopass", lambda: w4a8_matmul_twopass(
            x, qw, ws, wz, al)),
        ("quant_matmul.fpscale", lambda: w4a8_fpscale_matmul_packed(
            x, qw, wsf, jnp.asarray(wz, jnp.float32), al, bm=128, bn=256)),
    ]
    for name, fn in cands:
        try:
            out = np.asarray(fn())
            if name == "quant_matmul.packed":
                ref = out
            elif ref is not None and out.dtype == np.float32 and "fpscale" not in name:
                np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-3)
            _ok(name, results)
        except Exception as e:  # noqa: BLE001
            _fail(name, e, results)


def gate_attention(results):
    import jax.numpy as jnp
    from dgq_tpu.ops.attention import (
        int4_paged_decode_attention,
        int8_decode_attention,
        int8_decode_attention_chunked,
        int8_decode_attention_xla,
        int8_paged_decode_attention,
        int8_prefill_attention,
    )

    rng = np.random.default_rng(1)
    b, h, hk, dh, smax, ps = 2, 8, 4, 128, 512, 128
    npg = smax // ps
    q = jnp.asarray(rng.integers(-127, 128, (b, h, dh)), jnp.int8)
    kt = jnp.asarray(rng.integers(-127, 128, (b, hk, dh, smax)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (b, hk, smax, dh)), jnp.int8)
    kt_pool = jnp.asarray(
        rng.integers(-127, 128, (b * npg + 1, hk, dh, ps)), jnp.int8)
    v_pool = jnp.asarray(
        rng.integers(-127, 128, (b * npg + 1, hk, ps, dh)), jnp.int8)
    kt4_pool = jnp.asarray(
        rng.integers(-128, 128, (b * npg + 1, hk, dh // 2, ps)), jnp.int8)
    v4_pool = jnp.asarray(
        rng.integers(-128, 128, (b * npg + 1, hk, ps, dh // 2)), jnp.int8)
    table = jnp.asarray(1 + np.arange(b * npg, dtype=np.int32).reshape(b, npg))
    lengths = jnp.full((b,), smax - 5, jnp.int32)
    s = jnp.float32(0.02)
    slopes = jnp.asarray(rng.random(h), jnp.float32) * 0.1
    qp = jnp.asarray(rng.integers(-127, 128, (b, h, 256, dh)), jnp.int8)

    ref = None
    cands = [
        ("attention.decode", lambda: int8_decode_attention(
            q, kt, v, lengths, s, s, s)),
        ("attention.decode_alibi", lambda: int8_decode_attention(
            q, kt, v, lengths, s, s, s, alibi_slopes=slopes)),
        ("attention.decode_quant_pv", lambda: int8_decode_attention(
            q, kt, v, lengths, s, s, s, quant_pv=True)),
        ("attention.chunked", lambda: int8_decode_attention_chunked(
            q, kt, v, lengths, s, s, s, chunk=256)),
        # round-5 two-pass global-max quant_pv kernels (path invariance):
        # gated against the XLA quant_pv golden below, not just compiled
        ("attention.chunked_quant_pv", lambda: int8_decode_attention_chunked(
            q, kt, v, lengths, s, s, s, chunk=256, quant_pv=True)),
        ("attention.paged", lambda: int8_paged_decode_attention(
            q, kt_pool, v_pool, table, lengths, s, s, s)),
        ("attention.paged_quant_pv", lambda: int8_paged_decode_attention(
            q, kt_pool, v_pool, table, lengths, s, s, s, quant_pv=True)),
        ("attention.paged4", lambda: int4_paged_decode_attention(
            q, kt4_pool, v4_pool, table, lengths, s, s, s)),
        ("attention.flash_prefill", lambda: int8_prefill_attention(
            qp, kt, v, jnp.int32(256), s, s, s, bq=128, bkv=128)),
        ("attention.flash_prefill_alibi", lambda: int8_prefill_attention(
            qp, kt, v, jnp.int32(256), s, s, s, bq=128, bkv=128,
            alibi_slopes=slopes)),
    ]
    for name, fn in cands:
        try:
            out = np.asarray(fn())
            if name == "attention.decode":
                ref = out
                xla = np.asarray(int8_decode_attention_xla(
                    q, kt, v, lengths, s, s, s))
                np.testing.assert_allclose(out, xla, rtol=1e-4, atol=1e-3)
            elif name == "attention.chunked" and ref is not None:
                # chunked streams the softmax; fp32 accumulation order
                # differs from the whole-cache kernel on real hardware
                np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-3)
            elif name in ("attention.chunked_quant_pv",
                          "attention.paged_quant_pv"):
                # global-row-max codes must land on the dense quant rule
                if name.startswith("attention.chunked"):
                    gold = np.asarray(int8_decode_attention_xla(
                        q, kt, v, lengths, s, s, s, quant_pv=True))
                else:
                    from dgq_tpu.ops.attention import gather_paged_kv
                    ktd, vd = gather_paged_kv(kt_pool, v_pool, table)
                    gold = np.asarray(int8_decode_attention_xla(
                        q, ktd, vd, lengths, s, s, s, quant_pv=True))
                np.testing.assert_allclose(out, gold, rtol=1e-3, atol=5e-3)
            _ok(name, results)
        except Exception as e:  # noqa: BLE001
            _fail(name, e, results)


def gate_fused_decode(results):
    import jax.numpy as jnp
    from dgq_tpu.ops.fused_decode import (
        fused_mlp_decode,
        fused_mlp_decode_rp,
        fused_norm_gemv,
        fused_norm_gemv_rp,
        fused_norm_gemv_s4,
        fused_requant_gemv,
        fused_requant_gemv_rp,
        fused_requant_gemv_s4,
        pack_rowpair_s4,
        rowpair_cs_fold,
    )

    rng = np.random.default_rng(2)
    b, d, f, g = 1, 1024, 2816, 128
    span = 2 * g
    fpad = -(-f // 512) * 512  # bf=512 blocks
    x = jnp.asarray(rng.random((b, d)), jnp.float32)
    nw = jnp.asarray(rng.random(d) + 0.5, jnp.float32)

    def packw(kk, nn):
        """Packed weight + COMPACT plane scales (s_hi=even groups,
        s_lo=odd; cf. engine.py:176 s_hi=pl.wscales[0::2])."""
        ws = rng.integers(1, 4, (kk // g, nn)).astype(np.int8)
        wz = rng.integers(0, 16, (kk // g, nn)).astype(np.int8)
        return (
            jnp.asarray(rng.integers(-128, 128, (kk // 2, nn)), jnp.int8),
            jnp.asarray(ws[0::2]), jnp.asarray(ws[1::2]),
            jnp.asarray(wz[0::2]), jnp.asarray(wz[1::2]),
            jnp.asarray(rng.random(nn), jnp.float32),
            jnp.asarray(ws), jnp.asarray(wz),
        )

    qw, sh, sl, zh, zl, al2, _, _ = packw(d, d)
    qg, shg, slg, zhg, zlg, ag, _, _ = packw(d, 2 * fpad)
    qd, _, _, _, _, ad, sdf, zdf = packw(fpad, d)
    sd_rep = jnp.repeat(sdf, 8, axis=0)  # (8*Gf, D) replicated down scales
    zd_rep = jnp.repeat(zdf, 8, axis=0)

    cands = [
        ("fused_decode.norm_gemv", lambda: fused_norm_gemv(
            x, nw, None, qw, sh, sl, zh, zl, al2, span=span)),
        # int4-MXU path must match the int8 path bit for bit on silicon
        ("fused_decode.norm_gemv_s4", lambda: fused_norm_gemv_s4(
            x, nw, None, qw, sh, sl, zh, zl, al2, span=span)),
        ("fused_decode.requant_gemv", lambda: fused_requant_gemv(
            jnp.asarray(rng.random((b, d)), jnp.float32), jnp.float32(3.0),
            qw, sh, sl, zh, zl, al2, residual=x, span=span)),
        ("fused_decode.requant_gemv_s4", lambda: fused_requant_gemv_s4(
            jnp.asarray(rng.random((b, d)), jnp.float32), jnp.float32(3.0),
            qw, sh, sl, zh, zl, al2, residual=x, span=span)),
        ("fused_decode.mlp", lambda: fused_mlp_decode(
            x, nw, None, qg, shg, slg, zhg, zlg, ag, jnp.float32(3.0),
            qd, sd_rep, zd_rep, ad, span=span)),
    ]
    # native-s4 rowpair variants: must be BIT-IDENTICAL to their int8-path
    # siblings on silicon (the bitcast feed is the only difference)
    qw_rp = pack_rowpair_s4(qw, span)
    csf = rowpair_cs_fold(qw, span, sh, sl)
    qg_rp = pack_rowpair_s4(qg, span)
    csfg = rowpair_cs_fold(qg, span, shg, slg)
    qd_rp = pack_rowpair_s4(qd, span)
    csfd = rowpair_cs_fold(qd, span, jnp.asarray(np.asarray(sdf)[0::2]),
                           jnp.asarray(np.asarray(sdf)[1::2]))
    xr = jnp.asarray(rng.random((b, d)), jnp.float32)
    cands += [
        ("fused_decode.norm_gemv_rp", lambda: fused_norm_gemv_rp(
            x, nw, None, qw_rp, sh, sl, zh, zl, csf, al2, span=span)),
        ("fused_decode.requant_gemv_rp", lambda: fused_requant_gemv_rp(
            xr, jnp.float32(3.0),
            qw_rp, sh, sl, zh, zl, csf, al2, residual=x, span=span)),
        ("fused_decode.mlp_rp", lambda: fused_mlp_decode_rp(
            x, nw, None, qg_rp, shg, slg, zhg, zlg, csfg, ag,
            jnp.float32(3.0), qd_rp, sd_rep, zd_rep, csfd, ad, span=span)),
    ]
    pairs = {"fused_decode.norm_gemv_rp": "fused_decode.norm_gemv",
             "fused_decode.requant_gemv_rp": None,  # different x draw order
             "fused_decode.mlp_rp": "fused_decode.mlp"}
    outs = {}
    for name, fn in cands:
        try:
            outs[name] = np.asarray(fn())
            sib = pairs.get(name)
            if sib and sib in outs:
                np.testing.assert_array_equal(outs[name], outs[sib])
            _ok(name, results)
        except Exception as e:  # noqa: BLE001
            _fail(name, e, results)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["quant_matmul", "attention",
                                       "fused_decode"], default=None)
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})", flush=True)
    if backend == "cpu":
        print("NOTE: cpu backend — this gate only proves anything on real "
              "TPU hardware", flush=True)

    results = []
    gates = {
        "quant_matmul": gate_quant_matmul,
        "attention": gate_attention,
        "fused_decode": gate_fused_decode,
    }
    for name, fn in gates.items():
        if args.only and name != args.only:
            continue
        try:
            fn(results)
        except Exception as e:  # noqa: BLE001 — import/setup failure
            traceback.print_exc()
            results.append((f"{name}.<setup>", e))

    failures = [(n, e) for n, e in results if e is not None]
    print(f"\n{len(results) - len(failures)}/{len(results)} kernels passed "
          f"the hardware gate", flush=True)
    if failures:
        for n, e in failures:
            print(f"  FAILED: {n}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
