"""INT8-dataflow engine tests: conversion from PTQ, prefill/decode parity,
INT8 KV cache behavior."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import (
    EngineConfig,
    engine_forward,
    from_ptq,
    generate,
    init_kv_cache,
)
from dgq_tpu.models.llama import QuantState, init_llama_params, llama_apply, tiny_llama_config
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.utils.datautils import synthetic_stream


@pytest.fixture(scope="module")
def engine_setup():
    # hidden sizes chosen so every linear K is a multiple of one 128-group
    # span (256): hidden 256, intermediate 512
    cfg = tiny_llama_config(hidden_size=256, intermediate_size=512, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 64).reshape(2, 64))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=128),
        smoothquant=True,
        kvquant=True,
    )
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    eng = from_ptq(res.params, res.kv_scales, cfg)
    return cfg, params, res, eng


def test_engine_prefill_close_to_fake_quant(engine_setup):
    cfg, params, res, eng = engine_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 32, seed=9).reshape(1, 32))
    cache = init_kv_cache(cfg, 1, 64)
    logits, cache2 = engine_forward(ecfg, eng, ids, cache)
    assert logits.shape == (1, 32, cfg.vocab_size)
    assert int(cache2.length) == 32
    assert bool(jnp.isfinite(logits).all())

    # engine int8 dataflow vs fake-quant path: same weights, requant points
    # inject extra noise — top-1 agreement on most positions is the bar
    qs = QuantState(actq=True, wtq=True, kv=True)
    fq_logits = llama_apply(res.params, ids, cfg, qs, res.kv_scales)
    top1_eng = np.asarray(jnp.argmax(logits[0], -1))
    top1_fq = np.asarray(jnp.argmax(fq_logits[0], -1))
    agree = (top1_eng == top1_fq).mean()
    assert agree > 0.8, f"engine/fake-quant top-1 agreement too low: {agree}"


def test_engine_kernel_matches_xla_path(engine_setup):
    cfg, params, res, eng = engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 16, seed=3).reshape(1, 16))
    cache = init_kv_cache(cfg, 1, 32)
    lx, _ = engine_forward(EngineConfig(cfg=cfg, use_kernel=False), eng, ids, cache)
    lk, _ = engine_forward(
        EngineConfig(cfg=cfg, use_kernel=True, interpret=True, bm_prefill=128, bm_decode=128),
        eng, ids, cache,
    )
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lk), rtol=2e-4, atol=2e-4)


def test_engine_decode_matches_prefill(engine_setup):
    """Decoding token-by-token with the INT8 cache must reproduce the
    prefill logits (static cache correctness).  quant_pv is pinned OFF so
    decode's p@V matches prefill's fp path bit-for-bit-ish; the quantized
    p@V error budget is gated separately in tests/test_quant_pv.py."""
    cfg, params, res, eng = engine_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 12, seed=5).reshape(1, 12))

    cache = init_kv_cache(cfg, 1, 16)
    logits_all, _ = engine_forward(ecfg, eng, ids, cache)

    cache = init_kv_cache(cfg, 1, 16)
    step_logits = []
    for t in range(12):
        lg, cache = engine_forward(ecfg, eng, ids[:, t : t + 1], cache)
        step_logits.append(lg[:, 0])
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(logits_all), np.asarray(step_logits), rtol=2e-3, atol=2e-3
    )


def test_engine_generate_runs(engine_setup):
    cfg, params, res, eng = engine_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=7).reshape(1, 8))
    toks = generate(ecfg, eng, prompt, max_new_tokens=4, max_len=16)
    assert toks.shape == (1, 4)
    assert bool((toks >= 0).all()) and bool((toks < cfg.vocab_size).all())


def test_kv_cache_is_int8(engine_setup):
    cfg, params, res, eng = engine_setup
    cache = init_kv_cache(cfg, 1, 16)
    assert cache.k.dtype == jnp.int8 and cache.v.dtype == jnp.int8
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 4, seed=2).reshape(1, 4))
    _, cache2 = engine_forward(ecfg, eng, ids, cache)
    # K is stored transposed (L, B, Hkv, Dh, Smax): written region is the
    # first 4 positions of the LAST axis; unwritten region untouched
    assert int(jnp.abs(cache2.k[..., :4]).sum()) > 0
    assert int(jnp.abs(cache2.k[..., 4:]).sum()) == 0


def test_engine_flash_prefill_matches_xla_path(engine_setup):
    """s=128 routes through the flash prefill kernel when use_kernel."""
    cfg, params, res, eng = engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 128, seed=21).reshape(1, 128))
    cache = init_kv_cache(cfg, 1, 256)
    lx, cx = engine_forward(EngineConfig(cfg=cfg, use_kernel=False), eng, ids, cache)
    lk, ck = engine_forward(
        EngineConfig(cfg=cfg, use_kernel=True, interpret=True, bm_prefill=128,
                     bm_decode=128, flash_prefill=True),
        eng, ids, cache,
    )
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lk), rtol=3e-4, atol=3e-4)
    np.testing.assert_array_equal(np.asarray(cx.k), np.asarray(ck.k))


def test_mixed_fallback_engine(engine_setup):
    """Mixed w4w8/fallback models run through the fp-scale engine mode and
    track the fake-quant path (BASELINE config 3)."""
    cfg, params, res, eng = engine_setup
    from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
    from dgq_tpu.models.engine import from_ptq_auto
    from dgq_tpu.quant.calibrate import ptq_llama
    from dgq_tpu.quant.packing import PackedLinear

    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 64).reshape(2, 64))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(),
        wt_quant=WtQuantConfig(groupsize=128, w4w8=True, w4w8_fallback_ratio=0.0),
        smoothquant=True, kvquant=True,
    )
    res2 = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    # all layers fell back to fp scales at ratio 0.0
    assert not res2.params["layers"][0]["self_attn"]["q_proj"].w4w8

    ecfg2, eng2 = from_ptq_auto(res2.params, res2.kv_scales, cfg, use_kernel=False)
    assert ecfg2.fp_scales
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 16, seed=31).reshape(1, 16))
    cache = init_kv_cache(cfg, 1, 32)
    logits, _ = engine_forward(ecfg2, eng2, ids, cache)
    assert bool(jnp.isfinite(logits).all())

    qs = QuantState(actq=True, wtq=True, kv=True)
    fq = llama_apply(res2.params, ids, cfg, qs, res2.kv_scales)
    agree = (np.asarray(jnp.argmax(logits[0], -1)) == np.asarray(jnp.argmax(fq[0], -1))).mean()
    assert agree > 0.8, f"fp-scale engine agreement too low: {agree}"

    # the kernel path matches the XLA path in interpret mode
    ecfg3 = EngineConfig(cfg=cfg, use_kernel=True, interpret=True, fp_scales=True,
                         bm_prefill=128, bm_decode=128)
    lk, _ = engine_forward(ecfg3, eng2, ids, cache)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(lk), rtol=5e-3, atol=5e-3)


def test_engine_chunked_decode_attention(engine_setup):
    """decode_attn_chunk engages the chunked kernel and matches the
    monolithic path."""
    cfg, params, res, eng = engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=41).reshape(1, 8))
    base = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                        bm_prefill=128, bm_decode=128)
    chunked = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                           bm_prefill=128, bm_decode=128, decode_attn_chunk=16)
    c1 = init_kv_cache(cfg, 1, 64)
    l1, c1 = engine_forward(base, eng, ids, c1)
    t1 = jnp.argmax(l1[:, -1:, :], axis=-1).astype(jnp.int32)
    d1, _ = engine_forward(base, eng, t1, c1)

    c2 = init_kv_cache(cfg, 1, 64)
    l2, c2 = engine_forward(chunked, eng, ids, c2)
    t2 = jnp.argmax(l2[:, -1:, :], axis=-1).astype(jnp.int32)
    d2, _ = engine_forward(chunked, eng, t2, c2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-4, atol=2e-4)


def test_engine_16k_context_auto_chunk(engine_setup):
    """A 16k-token cache selects the VMEM-bounded chunked decode kernel
    automatically (decode_attn_chunk left at its AUTO default) and matches
    the forced monolithic kernel (VERDICT r1 #9: no manual knobs)."""
    from dgq_tpu.ops.attention import auto_decode_chunk

    assert auto_decode_chunk(16384) == 4096
    assert auto_decode_chunk(8192) == 0  # still VMEM-resident
    assert auto_decode_chunk(24576) == 4096

    cfg, params, res, eng = engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=43).reshape(1, 8))
    auto = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                        bm_prefill=128, bm_decode=128)  # default AUTO
    mono = dataclasses.replace(auto, decode_attn_chunk=0)

    c1 = init_kv_cache(cfg, 1, 16384)
    l1, c1 = engine_forward(mono, eng, ids, c1)
    t1 = jnp.argmax(l1[:, -1:, :], axis=-1).astype(jnp.int32)
    d1, _ = engine_forward(mono, eng, t1, c1)

    c2 = init_kv_cache(cfg, 1, 16384)
    l2, c2 = engine_forward(auto, eng, ids, c2)
    t2 = jnp.argmax(l2[:, -1:, :], axis=-1).astype(jnp.int32)
    d2, _ = engine_forward(auto, eng, t2, c2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=2e-4, atol=2e-4)


def test_engine_flash_prefill_non_128_prompt(engine_setup):
    """Flash prefill engages for S % 128 != 0 via automatic query padding
    (VERDICT r1 #9: no silent fallback to (S, Smax) score materialization)
    and matches the XLA path."""
    cfg, params, res, eng = engine_setup
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 100, seed=44).reshape(1, 100))
    flash = EngineConfig(cfg=cfg, use_kernel=True, interpret=True,
                         bm_prefill=128, bm_decode=128, flash_prefill=True)
    xla = EngineConfig(cfg=cfg, use_kernel=False)

    c1 = init_kv_cache(cfg, 1, 256)  # Smax % 128 == 0: flash path eligible
    l1, _ = engine_forward(flash, eng, ids, c1)
    c2 = init_kv_cache(cfg, 1, 256)
    l2, _ = engine_forward(xla, eng, ids, c2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=5e-3, atol=5e-3)


def test_meanact_engine_conversion(engine_setup):
    """meanact-calibrated models carry an LN bias through engine conversion
    (previously silently dropped)."""
    cfg, params, res, eng = engine_setup
    from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
    from dgq_tpu.models.engine import from_ptq
    from dgq_tpu.quant.calibrate import ptq_llama

    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
        smoothquant=True, meanact=True, kvquant=True,
    )
    res2 = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    assert res2.params["layers"][0]["input_layernorm"].get("bias") is not None
    eng2 = from_ptq(res2.params, res2.kv_scales, cfg)
    assert eng2.layers.ln1_bias is not None

    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 16, seed=51).reshape(1, 16))
    cache = init_kv_cache(cfg, 1, 32)
    logits, _ = engine_forward(ecfg, eng2, ids, cache)
    assert bool(jnp.isfinite(logits).all())

    qs = QuantState(actq=True, wtq=True, kv=True)
    fq = llama_apply(res2.params, ids, cfg, qs, res2.kv_scales)
    agree = (np.asarray(jnp.argmax(logits[0], -1)) == np.asarray(jnp.argmax(fq[0], -1))).mean()
    assert agree > 0.75, f"meanact engine agreement too low: {agree}"


@pytest.mark.parametrize("g", [32, 64])
def test_linear_s8_infers_non128_groupsize(g):
    """Regression: _linear_s8 / _linear_s8_int8out must infer groupsize from
    the packed buffers — they used to assume 128, so any other --groupsize
    dequantized wrong (or shape-errored) in every INT8 engine."""
    from dgq_tpu.models.engine import _engine_linear, _linear_s8
    from dgq_tpu.models.opt_engine import _linear_s8_int8out
    from dgq_tpu.quant.packing import dequantize_to_int8, pack_linear_w4w8
    from dgq_tpu.quant.search import search_quantize

    rng = np.random.default_rng(g)
    n, k = 128, 256
    w = rng.normal(size=(n, k)).astype(np.float32)
    xcal = rng.normal(size=(32, k)).astype(np.float32)
    res = search_quantize(jnp.asarray(w), jnp.asarray(xcal), groupsize=g, w4w8=True)
    pl = pack_linear_w4w8(res.qweight_fp, res.scale, res.zero, res.scale8, g)
    input_scale = jnp.float32(0.05)
    lin = _engine_linear(pl, input_scale)

    x_s8 = jnp.asarray(rng.integers(-127, 128, size=(4, k)).astype(np.int8))
    got = _linear_s8(lin, x_s8, use_kernel=False)
    w_s8 = dequantize_to_int8(pl)  # (K, N) int8
    want = (np.asarray(x_s8, np.float32) @ np.asarray(w_s8, np.float32)) * np.asarray(lin.alpha)[None, :]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    got8 = _linear_s8_int8out(lin, x_s8, use_kernel=False, bm=128, interpret=False)
    want8 = np.clip(np.round(want), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(got8), want8)


def test_generate_decode_unroll_matches_single_step(engine_setup):
    """decode_unroll must be a pure dispatch-batching change: greedy tokens
    identical to the step-by-step loop (incl. a remainder chunk)."""
    cfg, params, res, eng = engine_setup
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    ids = jnp.asarray(synthetic_stream(cfg.vocab_size, 8, seed=21).reshape(1, 8))
    base = generate(ecfg, eng, ids, max_new_tokens=6, max_len=32)
    unrolled = generate(ecfg, eng, ids, max_new_tokens=6, max_len=32, decode_unroll=4)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(unrolled))
