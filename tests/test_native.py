"""Native C nibble codec: parity with the jnp packing and the numpy
fallback."""

import numpy as np
import jax.numpy as jnp
import pytest

from dgq_tpu.native import get_codec, pack_nibbles_np, quantize_pack_np, unpack_nibbles_np
from dgq_tpu.quant.packing import pack_nibbles, unpack_nibbles


@pytest.mark.parametrize("span", [0, 256])
def test_c_codec_matches_jnp_pack(span):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(512, 128)).astype(np.uint8)
    want = np.asarray(pack_nibbles(jnp.asarray(codes.astype(np.int8)), span))
    got = pack_nibbles_np(codes, span)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("span", [0, 256])
def test_c_codec_roundtrip(span):
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 16, size=(512, 64)).astype(np.uint8)
    packed = pack_nibbles_np(codes, span)
    back = unpack_nibbles_np(packed, span)
    np.testing.assert_array_equal(back, codes)


def test_c_codec_available():
    # the build environment ships gcc; the codec must actually compile here
    assert get_codec() is not None, "C codec failed to build"


def test_quantize_pack_matches_two_step():
    rng = np.random.default_rng(2)
    k, n, g = 512, 64, 128
    w = rng.normal(size=(k, n)).astype(np.float32)
    scales = (np.abs(rng.normal(size=(k // g, n))) + 0.1).astype(np.float32)
    zeros = rng.integers(0, 16, size=(k // g, n)).astype(np.float32)
    got = quantize_pack_np(w, scales, zeros, g, span=256)
    scales_k = np.repeat(scales, g, axis=0)
    zeros_k = np.repeat(zeros, g, axis=0)
    codes = np.clip(np.round(w / scales_k + zeros_k), 0, 15).astype(np.uint8)
    want = pack_nibbles_np(codes, 256)
    np.testing.assert_array_equal(got, want)
