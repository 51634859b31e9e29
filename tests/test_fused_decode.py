"""Fused decode kernels (ops/fused_decode.py): goldens + engine integration.

Mirrors the reference's kernel-test strategy
(reference: dgq/test/test_linear_kernels.py) in interpret mode on CPU."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.ops.fused_decode import (
    fused_mlp_decode,
    fused_norm_gemv,
    fused_requant_gemv,
)
from dgq_tpu.quant.packing import pack_nibbles

SPAN, G = 256, 128


def _mk(k, n, seed):
    """(qw, planes, replicated, alpha, w_s8): planes = compact (G/2, N)
    hi/lo plane scale rows, replicated = the 8x prefill layout."""
    r = np.random.default_rng(seed)
    codes = r.integers(0, 16, size=(k, n)).astype(np.int8)
    qw = pack_nibbles(jnp.asarray(codes), span=SPAN)
    sc = r.integers(1, 4, size=(k // G, n)).astype(np.int8)
    zr = r.integers(0, 16, size=(k // G, n)).astype(np.int8)
    al = r.random(n).astype(np.float32) * 0.01
    w_s8 = ((codes.astype(np.int32) - np.repeat(zr, G, 0)) * np.repeat(sc, G, 0)).astype(np.int8)
    planes = tuple(jnp.asarray(a) for a in (sc[0::2], sc[1::2], zr[0::2], zr[1::2]))
    repl = (jnp.repeat(jnp.asarray(sc), 8, 0), jnp.repeat(jnp.asarray(zr), 8, 0))
    return qw, planes, repl, jnp.asarray(al), w_s8


def _rmsq(x, w, b, eps=1e-6):
    v = np.mean(x * x, -1, keepdims=True)
    y = x / np.sqrt(v + eps) * w + b
    return np.clip(np.round(y), -128, 127).astype(np.int8)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    D, N = 512, 768
    B = 2
    x = rng.normal(size=(B, D)).astype(np.float32) * 3
    lnw = rng.random(D).astype(np.float32) + 0.5
    lnb = rng.normal(size=(D,)).astype(np.float32) * 0.1
    beta = rng.normal(size=(N,)).astype(np.float32)
    return rng, D, N, x, lnw, lnb, beta


def test_fused_norm_gemv_golden(setup):
    rng, D, N, x, lnw, lnb, beta = setup
    qw, planes, _, al, w_s8 = _mk(D, N, 1)
    xq = _rmsq(x, lnw, lnb)
    want = xq.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None]
    got = np.asarray(fused_norm_gemv(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb),
        qw, *planes, al, jnp.asarray(beta), bn=256, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_norm_gemv_s4_matches_int8_path(setup):
    """The int4-MXU variant is bit-identical to the int8-path kernel AND
    the golden (the x-plane decomposition + colsum algebra is exact)."""
    from dgq_tpu.ops.fused_decode import fused_norm_gemv_s4, plane_colsums

    rng, D, N, x, lnw, lnb, beta = setup
    qw, planes, _, al, w_s8 = _mk(D, N, 1)
    xq = _rmsq(x, lnw, lnb)
    want = xq.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None]
    csh, csl = plane_colsums(qw)
    for cs in ((csh, csl), (None, None)):  # precomputed and derived paths
        got = np.asarray(fused_norm_gemv_s4(
            jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb),
            qw, *planes, al, jnp.asarray(beta), cs[0], cs[1],
            bn=256, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # extreme activations: the hi4/lo4 split must be exact at the int8 edges
    xe = np.zeros_like(x)
    xe[:, :8] = 127.0
    xe[:, 8:16] = -128.0
    xqe = _rmsq(xe, lnw, lnb)
    we = xqe.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None]
    ge = np.asarray(fused_norm_gemv_s4(
        jnp.asarray(xe), jnp.asarray(lnw), jnp.asarray(lnb),
        qw, *planes, al, jnp.asarray(beta), bn=256, interpret=True))
    np.testing.assert_allclose(ge, we, rtol=1e-5, atol=1e-4)


def test_pack_rowpair_s4_roundtrip():
    """The rowpair-shifted byte layout decodes back to (codes - 8) with
    row 2r = low nibble / 2r+1 = high nibble — the on-chip bitcast order
    (scripts/probe_s4_bitcast_numerics.py)."""
    from dgq_tpu.ops.fused_decode import pack_rowpair_s4
    from dgq_tpu.quant.packing import pack_nibbles

    r = np.random.default_rng(7)
    codes = r.integers(0, 16, size=(512, 256)).astype(np.int8)
    qw = pack_nibbles(jnp.asarray(codes), span=SPAN)
    rp = np.asarray(pack_rowpair_s4(qw, SPAN)).astype(np.uint8)
    lo = ((rp & 0xF).astype(np.int32) ^ 8) - 8
    hi = ((rp >> 4).astype(np.int32) ^ 8) - 8
    got = np.stack([lo, hi], axis=1).reshape(512, 256)
    np.testing.assert_array_equal(got, codes.astype(np.int32) - 8)
    # stacked (L, K//2, N) input
    qw3 = jnp.stack([qw, qw])
    rp3 = np.asarray(pack_rowpair_s4(qw3, SPAN))
    assert rp3.shape == (2,) + rp.shape
    np.testing.assert_array_equal(rp3[0].astype(np.uint8), rp)


def test_fused_norm_gemv_rp_matches_golden(setup):
    """The native-s4 rowpair variant is bit-identical to the golden (the
    folded-colsum algebra is exact int32)."""
    from dgq_tpu.ops.fused_decode import (
        fused_norm_gemv_rp, pack_rowpair_s4, rowpair_cs_fold,
    )

    rng, D, N, x, lnw, lnb, beta = setup
    qw, planes, _, al, w_s8 = _mk(D, N, 1)
    qw_rp = pack_rowpair_s4(qw, SPAN)
    csf = rowpair_cs_fold(qw, SPAN, planes[0], planes[1])
    xq = _rmsq(x, lnw, lnb)
    want = xq.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None]
    got = np.asarray(fused_norm_gemv_rp(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb),
        qw_rp, *planes, csf, al, jnp.asarray(beta), bn=256, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # extreme activations: hi4/lo4 split exact at the int8 edges
    xe = np.zeros_like(x)
    xe[:, :8] = 127.0
    xe[:, 8:16] = -128.0
    xqe = _rmsq(xe, lnw, lnb)
    we = xqe.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None]
    ge = np.asarray(fused_norm_gemv_rp(
        jnp.asarray(xe), jnp.asarray(lnw), jnp.asarray(lnb),
        qw_rp, *planes, csf, al, jnp.asarray(beta), bn=256, interpret=True))
    np.testing.assert_allclose(ge, we, rtol=1e-5, atol=1e-4)


def test_fused_requant_gemv_rp_matches_golden(setup):
    from dgq_tpu.ops.fused_decode import (
        fused_requant_gemv_rp, pack_rowpair_s4, rowpair_cs_fold,
    )

    rng, D, N, x, lnw, lnb, beta = setup
    qw, planes, _, al, w_s8 = _mk(D, N, 1)
    qw_rp = pack_rowpair_s4(qw, SPAN)
    csf = rowpair_cs_fold(qw, SPAN, planes[0], planes[1])
    scale = np.float32(0.07)
    resid = rng.normal(size=(x.shape[0], N)).astype(np.float32)
    xq = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    want = xq.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None] + resid
    got = np.asarray(fused_requant_gemv_rp(
        jnp.asarray(x), jnp.asarray(scale), qw_rp, *planes, csf, al,
        jnp.asarray(beta), jnp.asarray(resid), bn=256, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_mlp_decode_rp_matches_golden(setup):
    from dgq_tpu.ops.fused_decode import (
        fused_mlp_decode_rp, pack_rowpair_s4, rowpair_cs_fold,
    )

    rng, D, N, x, lnw, lnb, beta = setup
    F = 1024
    qwg, planesg, _, alg, wg_s8 = _mk(D, 2 * F, 2)  # [gate | up]
    qwd, planesd, repld, ald, wd_s8 = _mk(F, D, 3)
    g_rp = pack_rowpair_s4(qwg, SPAN)
    g_csf = rowpair_cs_fold(qwg, SPAN, planesg[0], planesg[1])
    d_rp = pack_rowpair_s4(qwd, SPAN)
    d_csf = rowpair_cs_fold(qwd, SPAN, planesd[0], planesd[1])
    hscale = np.float32(0.05)
    dbias = rng.normal(size=(D,)).astype(np.float32) * 0.1

    xq = _rmsq(x, lnw, lnb)
    gu = xq.astype(np.int32) @ wg_s8.astype(np.int32) * alg[None]
    g, u = gu[:, :F], gu[:, F:]
    h = (g * (1 / (1 + np.exp(-g)))) * u
    h_s8 = np.clip(np.round(h / hscale), -128, 127).astype(np.int8)
    want = h_s8.astype(np.int32) @ wd_s8.astype(np.int32) * ald[None] + dbias[None] + x
    got = np.asarray(fused_mlp_decode_rp(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb),
        g_rp, *planesg, g_csf, alg, jnp.asarray(hscale),
        d_rp, *repld, d_csf, ald, jnp.asarray(dbias),
        bf=512, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_fused_requant_gemv_golden(setup):
    rng, D, N, x, lnw, lnb, beta = setup
    qw, planes, _, al, w_s8 = _mk(D, N, 1)
    scale = np.float32(0.07)
    resid = rng.normal(size=(x.shape[0], N)).astype(np.float32)
    xq = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    want = xq.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None] + resid
    got = np.asarray(fused_requant_gemv(
        jnp.asarray(x), jnp.asarray(scale), qw, *planes, al,
        jnp.asarray(beta), jnp.asarray(resid), bn=256, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_requant_gemv_s4_matches_int8_path(setup):
    from dgq_tpu.ops.fused_decode import fused_requant_gemv_s4, plane_colsums

    rng, D, N, x, lnw, lnb, beta = setup
    qw, planes, _, al, w_s8 = _mk(D, N, 1)
    scale = np.float32(0.07)
    resid = rng.normal(size=(x.shape[0], N)).astype(np.float32)
    xq = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    want = xq.astype(np.int32) @ w_s8.astype(np.int32) * al[None] + beta[None] + resid
    csh, csl = plane_colsums(qw)
    got = np.asarray(fused_requant_gemv_s4(
        jnp.asarray(x), jnp.asarray(scale), qw, *planes, al,
        jnp.asarray(beta), jnp.asarray(resid), csh, csl,
        bn=256, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_fused_mlp_decode_golden(setup):
    rng, D, N, x, lnw, lnb, beta = setup
    F = 1024
    qwg, planesg, _, alg, wg_s8 = _mk(D, 2 * F, 2)  # [gate | up]
    qwd, _, repld, ald, wd_s8 = _mk(F, D, 3)
    hscale = np.float32(0.05)
    dbias = rng.normal(size=(D,)).astype(np.float32) * 0.1

    xq = _rmsq(x, lnw, lnb)
    gu = xq.astype(np.int32) @ wg_s8.astype(np.int32) * alg[None]
    g, u = gu[:, :F], gu[:, F:]
    h = (g * (1 / (1 + np.exp(-g)))) * u
    h_s8 = np.clip(np.round(h / hscale), -128, 127).astype(np.int8)
    want = h_s8.astype(np.int32) @ wd_s8.astype(np.int32) * ald[None] + dbias[None] + x
    got = np.asarray(fused_mlp_decode(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb),
        qwg, *planesg, alg, jnp.asarray(hscale),
        qwd, *repld, ald, jnp.asarray(dbias),
        bf=512, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_fused_mlp_no_residual(setup):
    """fuse_residual=False returns the bare MLP output (the TP partial)."""
    rng, D, N, x, lnw, lnb, beta = setup
    F = 512
    qwg, planesg, _, alg, _ = _mk(D, 2 * F, 4)
    qwd, _, repld, ald, _ = _mk(F, D, 5)
    hscale = np.float32(0.05)
    with_res = np.asarray(fused_mlp_decode(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb),
        qwg, *planesg, alg, jnp.asarray(hscale),
        qwd, *repld, ald, None, bf=512, interpret=True))
    without = np.asarray(fused_mlp_decode(
        jnp.asarray(x), jnp.asarray(lnw), jnp.asarray(lnb),
        qwg, *planesg, alg, jnp.asarray(hscale),
        qwd, *repld, ald, None, bf=512, fuse_residual=False, interpret=True))
    np.testing.assert_allclose(with_res - without, x, rtol=1e-4, atol=1e-4)


def test_engine_fused_decode_matches_unfused():
    """End-to-end: the fused-decode engine path equals the unfused kernel
    path (both interpret mode) on a multi-token decode chain."""
    from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
    from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
    from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
    from dgq_tpu.quant.calibrate import ptq_llama
    from dgq_tpu.utils.datautils import synthetic_stream

    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       kvquant=True)
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)

    fused = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                         bm_prefill=128, bm_decode=128)  # fused_decode default ON
    unfused = dataclasses.replace(fused, fused_decode=False)

    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=9).reshape(1, 8))

    def chain(ecfg):
        cache = init_kv_cache(cfg, 1, 32)
        logits, cache = engine_forward(ecfg, eng, ids, cache)
        outs = []
        tok = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)
        for _ in range(3):
            lg, cache = engine_forward(ecfg, eng, tok, cache)
            outs.append(np.asarray(lg))
            tok = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
        return outs

    for a, b in zip(chain(fused), chain(unfused)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_engine_fused_short_window_matches_unfused():
    """s <= 8 multi-token windows (speculative verification) ride the fused
    row kernels via the (B, S, D) -> (B*S, D) flatten; logits must match
    the unfused kernel path (both interpret mode)."""
    from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
    from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
    from dgq_tpu.models.llama import init_llama_params, tiny_llama_config
    from dgq_tpu.quant.calibrate import ptq_llama
    from dgq_tpu.utils.datautils import synthetic_stream

    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       kvquant=True)
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)

    fused = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                         bm_prefill=128, bm_decode=128)
    unfused = dataclasses.replace(fused, fused_decode=False)

    prompt = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=9).reshape(1, 8))
    window = jnp.asarray(synthetic_stream(cfg.vocab_size, 5, seed=4).reshape(1, 5))

    def run(ecfg):
        cache = init_kv_cache(cfg, 1, 32)
        _, cache = engine_forward(ecfg, eng, prompt, cache)
        lg, _ = engine_forward(ecfg, eng, window, cache)  # s=5 verify-shaped
        return np.asarray(lg)

    np.testing.assert_allclose(run(fused), run(unfused), rtol=2e-4, atol=2e-4)
