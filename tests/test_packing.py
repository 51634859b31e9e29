"""Round-trip and schema tests for INT4 nibble packing."""

import numpy as np
import jax.numpy as jnp

from dgq_tpu.quant.packing import (
    dequantize_linear,
    dequantize_to_int8,
    pack_linear,
    pack_linear_w4w8,
    pack_nibbles,
    unpack_nibbles,
)
from dgq_tpu.quant.search import search_quantize


def test_nibble_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(64, 32)).astype(np.int8)
    packed = pack_nibbles(jnp.asarray(codes))
    assert packed.shape == (32, 32) and packed.dtype == jnp.int8
    back = np.asarray(unpack_nibbles(packed))
    np.testing.assert_array_equal(back, codes)


def test_nibble_packing_order_matches_reference_scheme():
    # byte = (hi << 4) | lo with hi = even-K code (reference python_compress
    # packs pair[0] into the high nibble; quant_linear.py:9-13)
    codes = jnp.asarray([[0xA], [0x5]], dtype=jnp.int8)  # K=2, N=1
    packed = np.asarray(pack_nibbles(codes))
    assert packed[0, 0] == np.int8(0xA5 - 256)


def test_pack_linear_roundtrip_plain():
    rng = np.random.default_rng(1)
    n, k, g = 8, 256, 64
    w = rng.normal(size=(n, k)).astype(np.float32)
    # derive naive grouped params
    wg = w.reshape(-1, g)
    xmin = np.minimum(wg.min(1), 0)
    xmax = np.maximum(wg.max(1), 0)
    scale = (xmax - xmin) / 15
    zero = np.round(-xmin / scale)
    pl = pack_linear(jnp.asarray(w), jnp.asarray(scale), jnp.asarray(zero), g)
    wq = np.asarray(dequantize_linear(pl))  # (K, N)
    assert wq.shape == (k, n)
    # dequantized weight should be within half a (bf16-rounded) scale step
    err = np.abs(wq.T - w)
    step = scale.reshape(n, k // g).repeat(g, axis=1)
    assert (err <= step * 0.51 + 1e-5).all()


def test_pack_linear_w4w8_int8_dequant_fits_int8():
    rng = np.random.default_rng(2)
    n, k, g = 16, 256, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(32, k)).astype(np.float32)
    res = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True)
    pl = pack_linear_w4w8(jnp.asarray(w), res.scale, res.zero, res.scale8, g)
    w_s8 = np.asarray(dequantize_to_int8(pl))
    assert w_s8.dtype == np.int8
    # int8 * per-channel fp scale must reconstruct the fake-quant weight
    recon = w_s8.astype(np.float32) * np.asarray(pl.wscales8.astype(jnp.float32))[None, :]
    full = np.asarray(dequantize_linear(pl))
    np.testing.assert_allclose(recon, full, rtol=1e-3, atol=1e-3)


def test_w4w8_pack_matches_search_fake_weight():
    """Packed+dequantized weight must equal the search's own fake-quant
    weight (the invariant the reference relies on when packW4W8 re-quantizes
    the already-quantized layer weight)."""
    rng = np.random.default_rng(3)
    n, k, g = 8, 256, 128
    w = rng.normal(size=(n, k)).astype(np.float32)
    x = rng.normal(size=(64, k)).astype(np.float32)
    res = search_quantize(jnp.asarray(w), jnp.asarray(x), groupsize=g, w4w8=True)
    pl = pack_linear_w4w8(jnp.asarray(w), res.scale, res.zero, res.scale8, g)
    wq = np.asarray(dequantize_linear(pl)).T  # (N, K)
    np.testing.assert_allclose(wq, np.asarray(res.qweight_fp), rtol=2e-2, atol=2e-2)


def test_pack_linear_wbits8_unpacked_storage():
    # wbits >= 8 stores codes unpacked (reference quant_linear.py:118-121
    # branches on wbits < 8); previously this path silently clipped codes
    # to 15 and produced garbage
    rng = np.random.default_rng(3)
    n, k, g = 8, 256, 64
    w = rng.normal(size=(n, k)).astype(np.float32)
    wg = w.reshape(-1, g)
    xmin = np.minimum(wg.min(1), 0)
    xmax = np.maximum(wg.max(1), 0)
    scale = (xmax - xmin) / 255
    zero = np.round(-xmin / scale)
    pl = pack_linear(jnp.asarray(w), jnp.asarray(scale), jnp.asarray(zero), g, bits=8)
    assert pl.wbits == 8 and pl.qweight.shape == (k, n) and pl.qweight.dtype == jnp.uint8
    wq = np.asarray(dequantize_linear(pl))
    err = np.abs(wq.T - w)
    step = scale.reshape(n, k // g).repeat(g, axis=1)
    # bf16 scale rounding adds up to ~0.4% relative on top of the half-step
    assert (err <= step * 0.51 + np.abs(w) * 0.01 + 1e-5).all()


def test_pack_linear_wbits2_clips_to_bit_range():
    rng = np.random.default_rng(4)
    n, k, g = 4, 128, 64
    w = rng.normal(size=(n, k)).astype(np.float32)
    wg = w.reshape(-1, g)
    xmin = np.minimum(wg.min(1), 0)
    xmax = np.maximum(wg.max(1), 0)
    scale = (xmax - xmin) / 3
    zero = np.round(-xmin / scale)
    pl = pack_linear(jnp.asarray(w), jnp.asarray(scale), jnp.asarray(zero), g, bits=2)
    codes = np.asarray(unpack_nibbles(pl.qweight, pl.span))
    assert codes.max() <= 3, "2-bit codes must stay in [0, 3]"
