"""Pallas fused dequant-GEMM golden tests (interpret mode on CPU).

Mirrors the reference's kernel test strategy
(reference: dgq/test/test_linear_kernels.py): a python dequant golden vs the
fused kernel, loose fp tolerance — but runs without accelerator hardware via
interpret=True (SURVEY §4 implication).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.ops.quant_matmul import (
    quantize_static_int8,
    w4a8_matmul,
    w4a8_matmul_packed,
    w4a8_matmul_xla,
)
from dgq_tpu.quant.packing import (
    dequantize_linear,
    dequantize_to_int8,
    pack_linear_w4w8,
    pack_nibbles,
    unpack_nibbles,
)
from dgq_tpu.quant.search import search_quantize


def _make_packed(n=256, k=512, g=128, seed=0, with_bias=False):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, k)).astype(np.float32)
    xcal = rng.normal(size=(64, k)).astype(np.float32)
    res = search_quantize(jnp.asarray(w), jnp.asarray(xcal), groupsize=g, w4w8=True)
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32)) if with_bias else None
    amax = jnp.asarray(3.0, jnp.float32)
    return pack_linear_w4w8(
        res.qweight_fp, res.scale, res.zero, res.scale8, g, bias=bias, amax=amax
    )


def test_span_nibble_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(512, 128)).astype(np.int8)
    packed = pack_nibbles(jnp.asarray(codes), span=256)
    back = np.asarray(unpack_nibbles(packed, span=256))
    np.testing.assert_array_equal(back, codes)


def test_kernel_matches_xla_golden_fp32():
    lin = _make_packed()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(100, 512)).astype(np.float32))
    want = np.asarray(w4a8_matmul_xla(x, lin))
    got = np.asarray(w4a8_matmul(x, lin, interpret=True, bm=128, bn=128))
    # identical integer path; only epilogue fp order differs
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_matches_fp_reference_loose():
    """vs the fp fake-quant matmul: quantization error only (the reference's
    atol=0.5 style tolerance at test_linear_kernels.py:42)."""
    lin = _make_packed()
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.normal(size=(64, 512)) * 0.3).astype(np.float32))
    w_fp = dequantize_linear(lin)  # (K, N)
    xq = quantize_static_int8(x, lin.amax).astype(jnp.float32) * (lin.amax / 127.0)
    want = np.asarray(xq @ w_fp)
    got = np.asarray(w4a8_matmul(x, lin, interpret=True, bm=128, bn=128))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_kernel_int8_out_matches_xla():
    lin = _make_packed()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(32, 512)).astype(np.float32))
    want = np.asarray(w4a8_matmul_xla(x, lin, out_dtype=jnp.int8))
    got = np.asarray(w4a8_matmul(x, lin, out_dtype=jnp.int8, interpret=True, bm=128, bn=128))
    # rounding at the int8 boundary may differ by 1 on exact .5 ties
    assert (np.abs(got.astype(np.int32) - want.astype(np.int32)) <= 1).all()


def test_kernel_handles_unaligned_m():
    lin = _make_packed()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(7, 512)).astype(np.float32))
    want = np.asarray(w4a8_matmul_xla(x, lin))
    got = np.asarray(w4a8_matmul(x, lin, interpret=True, bm=128, bn=128))
    assert got.shape == (7, 256)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_with_bias():
    lin = _make_packed(with_bias=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 512)).astype(np.float32))
    want = np.asarray(w4a8_matmul_xla(x, lin))
    got = np.asarray(w4a8_matmul(x, lin, interpret=True, bm=128, bn=128))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kernel_batched_input_shape():
    lin = _make_packed()
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(2, 9, 512)).astype(np.float32))
    got = np.asarray(w4a8_matmul(x, lin, interpret=True, bm=128, bn=128))
    assert got.shape == (2, 9, 256)
    want = np.asarray(w4a8_matmul_xla(x, lin))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fpscale_kernel_matches_dequant_golden():
    """w4w8-fallback GEMM (fp group scales, decomposed dot) vs the exact
    dequantized matmul."""
    from dgq_tpu.ops.quant_matmul import w4a8_fpscale_matmul_packed
    from dgq_tpu.quant.packing import pack_linear

    rng = np.random.default_rng(10)
    n, k, g = 256, 512, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    wg = w.reshape(-1, g)
    xmin = np.minimum(wg.min(1), 0)
    xmax = np.maximum(wg.max(1), 0)
    scale = (xmax - xmin) / 15
    zero = np.round(-xmin / scale)
    pl_ = pack_linear(jnp.asarray(w), jnp.asarray(scale), jnp.asarray(zero), g,
                      amax=jnp.asarray(3.0))
    assert not pl_.w4w8 and pl_.span == 2 * g

    x_s8 = jnp.asarray(rng.integers(-127, 128, (64, k)), jnp.int8)
    input_scale = 3.0 / 127.0
    alpha = jnp.full((n,), input_scale, jnp.float32)

    got = np.asarray(w4a8_fpscale_matmul_packed(
        x_s8, pl_.qweight, pl_.wscales, pl_.wzeros, alpha,
        bm=128, bn=128, interpret=True,
    ))
    w_fp = np.asarray(dequantize_linear(pl_))  # (K, N)
    want = (np.asarray(x_s8, np.float32) @ w_fp) * input_scale
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_bmm_s8_api():
    """Reference BMM_S8T_S8N_F32T contract: alpha * (a @ b^T)."""
    from dgq_tpu.ops.bmm import BMM_S8T_S8N_F32T, bmm_s8t_s8n_f32t

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.integers(-127, 128, (2, 4, 16, 32)), jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, (2, 4, 24, 32)), jnp.int8)
    got = np.asarray(bmm_s8t_s8n_f32t(a, b, 0.5))
    want = 0.5 * np.einsum(
        "bhmk,bhnk->bhmn", np.asarray(a, np.int64), np.asarray(b, np.int64)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    mod = BMM_S8T_S8N_F32T.from_scale(0.25, 2.0)
    np.testing.assert_allclose(np.asarray(mod(a, b)), want, rtol=1e-6)


def test_multi_span_bk_matches_single_span():
    """bk = n*span static unroll must be exact vs one span per step."""
    lin = _make_packed(n=256, k=1024, g=128)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(32, 1024)).astype(np.float32))
    base = np.asarray(w4a8_matmul(x, lin, interpret=True, bm=128, bn=128))
    from dgq_tpu.ops.quant_matmul import quantize_static_int8, w4a8_matmul_packed

    x_s8 = quantize_static_int8(x, lin.amax)
    alpha = lin.wscales8 * (lin.amax / 127.0)
    for bk in (512, 1024):
        got = np.asarray(w4a8_matmul_packed(
            x_s8, lin.qweight, lin.wscales, lin.wzeros, alpha,
            bm=128, bn=128, bk=bk, interpret=True,
        ))
        np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


def test_int8_out_with_fused_beta():
    """The OPT B8O8 path: int8 output with bias folded pre-rounding."""
    from dgq_tpu.ops.quant_matmul import w4a8_matmul_packed

    lin = _make_packed(n=256, k=512)
    rng = np.random.default_rng(13)
    x_s8 = jnp.asarray(rng.integers(-127, 128, (16, 512)), jnp.int8)
    alpha = jnp.asarray(rng.random(256).astype(np.float32)) * 1e-3
    beta = jnp.asarray(rng.normal(size=256).astype(np.float32))

    got = np.asarray(w4a8_matmul_packed(
        x_s8, lin.qweight, lin.wscales, lin.wzeros, alpha, beta,
        bm=128, bn=128, out_dtype=jnp.int8, interpret=True,
    ))
    from dgq_tpu.quant.packing import dequantize_to_int8

    w_s8 = np.asarray(dequantize_to_int8(lin))
    acc = np.asarray(x_s8, np.int64) @ w_s8.astype(np.int64)
    want = np.clip(np.round(acc * np.asarray(alpha) + np.asarray(beta)), -128, 127)
    assert (np.abs(got.astype(np.int64) - want.astype(np.int64)) <= 1).all()
    assert got.dtype == np.int8


def test_decode_attention_high_gqa_ratio():
    """rep=8 (llama-70B-style GQA) through the decode kernel."""
    from dgq_tpu.ops.attention import int8_decode_attention, int8_decode_attention_xla

    rng = np.random.default_rng(14)
    b, h, hk, dh, smax = 1, 16, 2, 128, 256
    q = jnp.asarray(rng.integers(-127, 128, (b, h, dh)), jnp.int8)
    kt = jnp.asarray(rng.integers(-127, 128, (b, hk, dh, smax)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (b, hk, smax, dh)), jnp.int8)
    args = (q, kt, v, jnp.asarray(100, jnp.int32),
            jnp.float32(0.02), jnp.float32(0.03), jnp.float32(0.05))
    want = np.asarray(int8_decode_attention_xla(*args))
    got = np.asarray(int8_decode_attention(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wres_kernel_matches_blocked_kernel():
    """Dequant-once w-resident GEMM (w4a8_matmul_wres) is bit-identical to
    the k-blocked kernel on f32 and int8 outputs, including M padding."""
    from dgq_tpu.ops.quant_matmul import w4a8_matmul_wres

    rng = np.random.default_rng(7)
    M, K, N, G = 192, 1024, 768, 128
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)
    bt = jnp.asarray(rng.random(N), jnp.float32)

    ref = w4a8_matmul_packed(x, qw, ws, wz, al, bt, bm=64, bn=256, bk=256,
                             interpret=True)
    got = w4a8_matmul_wres(x, qw, ws, wz, al, bt, bm=64, bn=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-5)

    ref8 = w4a8_matmul_packed(x, qw, ws, wz, al, bt, bm=64, bn=256, bk=256,
                              out_dtype=jnp.int8, interpret=True)
    got8 = w4a8_matmul_wres(x, qw, ws, wz, al, bt, bm=64, bn=256,
                            out_dtype=jnp.int8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got8), np.asarray(ref8))


def test_split_dots_matches_concat():
    """split_dots=True (two half-span dots, no concat copy) is bit-exact vs
    the concat kernel for every bk and both out dtypes."""
    from dgq_tpu.ops.quant_matmul import quantize_static_int8, w4a8_matmul_packed

    lin = _make_packed(n=256, k=1024, g=128)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(32, 1024)).astype(np.float32))
    x_s8 = quantize_static_int8(x, lin.amax)
    alpha = lin.wscales8 * (lin.amax / 127.0)
    for bk in (256, 512):
        for od in (jnp.float32, jnp.int8):
            base = np.asarray(w4a8_matmul_packed(
                x_s8, lin.qweight, lin.wscales, lin.wzeros, alpha,
                bm=128, bn=128, bk=bk, out_dtype=od, interpret=True))
            got = np.asarray(w4a8_matmul_packed(
                x_s8, lin.qweight, lin.wscales, lin.wzeros, alpha,
                bm=128, bn=128, bk=bk, out_dtype=od, interpret=True,
                split_dots=True))
            np.testing.assert_array_equal(got, base)


def test_pipe_kernel_matches_blocked_kernel():
    """Software-pipelined GEMM (w4a8_matmul_pipe: K grid + 1 drain step,
    revolving dequant scratch) is bit-identical to the k-blocked kernel on
    f32 and int8 outputs, at single- and multi-span bk, including M
    padding."""
    from dgq_tpu.ops.quant_matmul import w4a8_matmul_pipe

    rng = np.random.default_rng(11)
    M, K, N, G = 192, 1024, 768, 128
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)
    bt = jnp.asarray(rng.random(N), jnp.float32)

    ref = w4a8_matmul_packed(x, qw, ws, wz, al, bt, bm=64, bn=256, bk=256,
                             interpret=True)
    for bk in (256, 512):
        got = w4a8_matmul_pipe(x, qw, ws, wz, al, bt, bm=64, bn=256, bk=bk,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)

    ref8 = w4a8_matmul_packed(x, qw, ws, wz, al, bt, bm=64, bn=256, bk=256,
                              out_dtype=jnp.int8, interpret=True)
    got8 = w4a8_matmul_pipe(x, qw, ws, wz, al, bt, bm=64, bn=256, bk=512,
                            out_dtype=jnp.int8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got8), np.asarray(ref8))


def test_twopass_matches_blocked_kernel():
    """Kernel-free two-pass path (XLA dequant fusion + XLA s8 dot) matches
    the fused kernel on f32 and int8 outputs."""
    from dgq_tpu.ops.quant_matmul import w4a8_matmul_twopass

    rng = np.random.default_rng(13)
    M, K, N, G = 64, 512, 256, 128
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    qw = jnp.asarray(rng.integers(-128, 128, (K // 2, N)), jnp.int8)
    ws = jnp.asarray(rng.integers(1, 4, (K // G, N)), jnp.int8)
    wz = jnp.asarray(rng.integers(0, 16, (K // G, N)), jnp.int8)
    al = jnp.asarray(rng.random(N), jnp.float32)
    bt = jnp.asarray(rng.random(N), jnp.float32)

    ref = w4a8_matmul_packed(x, qw, ws, wz, al, bt, bm=64, bn=128, bk=256,
                             interpret=True)
    got = w4a8_matmul_twopass(x, qw, ws, wz, al, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)
    ref8 = w4a8_matmul_packed(x, qw, ws, wz, al, bt, bm=64, bn=128, bk=256,
                              out_dtype=jnp.int8, interpret=True)
    got8 = w4a8_matmul_twopass(x, qw, ws, wz, al, bt, out_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(got8), np.asarray(ref8))


def test_rp_pipe_matches_span_pipe_bitexact():
    """w4a8_matmul_rp_pipe (rowpair-shifted native-s4 layout) must equal
    w4a8_matmul_pipe on the same quantized layer BIT FOR BIT — the bitcast
    feed changes only where the unpack work happens."""
    from dgq_tpu.ops.fused_decode import pack_rowpair_s4
    from dgq_tpu.ops.quant_matmul import (
        w4a8_matmul_pipe,
        w4a8_matmul_rp_pipe,
        w4a8_matmul_rp_xla,
    )

    rng = np.random.default_rng(5)
    k, n, g = 512, 384, 128
    qw = pack_nibbles(jnp.asarray(rng.integers(0, 16, (k, n)).astype(np.int8)),
                      span=2 * g)
    ws = jnp.asarray(rng.integers(1, 4, (k // g, n)).astype(np.int8))
    wz = jnp.asarray(rng.integers(0, 16, (k // g, n)).astype(np.int8))
    al = jnp.asarray(rng.random(n).astype(np.float32) * 0.01)
    bias = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    x = jnp.asarray(rng.integers(-127, 128, (64, k)).astype(np.int8))
    qw_rp = pack_rowpair_s4(qw, 2 * g)

    want = np.asarray(w4a8_matmul_pipe(
        x, qw, ws, wz, al, bias, groupsize=g, span=2 * g,
        bm=64, bn=128, bk=256, interpret=True))
    got = np.asarray(w4a8_matmul_rp_pipe(
        x, qw_rp, ws, wz, al, bias, groupsize=g,
        bm=64, bn=128, bk=256, interpret=True))
    np.testing.assert_array_equal(got, want)
    got_xla = np.asarray(w4a8_matmul_rp_xla(
        x, qw_rp, ws, wz, al, bias, groupsize=g))
    np.testing.assert_allclose(got_xla, want, rtol=1e-6, atol=1e-5)
    # int8-out epilogue too
    w8 = np.asarray(w4a8_matmul_pipe(
        x, qw, ws, wz, al, bias, groupsize=g, span=2 * g,
        bm=64, bn=128, bk=256, out_dtype=jnp.int8, interpret=True))
    g8 = np.asarray(w4a8_matmul_rp_pipe(
        x, qw_rp, ws, wz, al, bias, groupsize=g,
        bm=64, bn=128, bk=256, out_dtype=jnp.int8, interpret=True))
    np.testing.assert_array_equal(g8, w8)
