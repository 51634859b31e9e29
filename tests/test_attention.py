"""INT8-KV decode attention kernel golden tests (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from dgq_tpu.ops.attention import int8_decode_attention, int8_decode_attention_xla


def _setup(b=2, h=8, hk=4, dh=128, smax=256, length=100, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.integers(-127, 128, (b, h, dh)), jnp.int8)
    kt = jnp.asarray(rng.integers(-127, 128, (b, hk, dh, smax)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (b, hk, smax, dh)), jnp.int8)
    return q, kt, v, jnp.asarray(length, jnp.int32)


def test_decode_attention_matches_xla():
    q, kt, v, ln = _setup()
    args = (q, kt, v, ln, jnp.float32(0.02), jnp.float32(0.03), jnp.float32(0.05))
    want = np.asarray(int8_decode_attention_xla(*args))
    got = np.asarray(int8_decode_attention(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_decode_attention_respects_length():
    q, kt, v, _ = _setup(smax=128)
    a = (q, kt, v)
    scales = (jnp.float32(0.02), jnp.float32(0.03), jnp.float32(0.05))
    out_short = np.asarray(
        int8_decode_attention(*a, jnp.asarray(10, jnp.int32), *scales, interpret=True)
    )
    out_long = np.asarray(
        int8_decode_attention(*a, jnp.asarray(100, jnp.int32), *scales, interpret=True)
    )
    assert not np.allclose(out_short, out_long)
    # matches masked-xla at each length
    want_short = np.asarray(
        int8_decode_attention_xla(*a, jnp.asarray(10, jnp.int32), *scales)
    )
    np.testing.assert_allclose(out_short, want_short, rtol=1e-5, atol=1e-5)


def test_decode_attention_mha_no_gqa():
    q, kt, v, ln = _setup(h=4, hk=4)
    args = (q, kt, v, ln, jnp.float32(0.01), jnp.float32(0.01), jnp.float32(0.01))
    want = np.asarray(int8_decode_attention_xla(*args))
    got = np.asarray(int8_decode_attention(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_prefill_attention_matches_xla():
    import jax
    from dgq_tpu.ops.attention import int8_prefill_attention, int8_prefill_attention_xla

    rng = np.random.default_rng(7)
    b, h, hk, dh, s, smax = 1, 4, 2, 128, 256, 512
    q = jnp.asarray(rng.integers(-127, 128, (b, h, s, dh)), jnp.int8)
    kt = jnp.asarray(rng.integers(-127, 128, (b, hk, dh, smax)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (b, hk, smax, dh)), jnp.int8)
    args = (q, kt, v, jnp.asarray(s, jnp.int32),
            jnp.float32(0.02), jnp.float32(0.03), jnp.float32(0.05))
    want = np.asarray(int8_prefill_attention_xla(*args))
    got = np.asarray(int8_prefill_attention(*args, bq=128, bkv=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_prefill_attention_respects_prompt_len():
    from dgq_tpu.ops.attention import int8_prefill_attention, int8_prefill_attention_xla

    rng = np.random.default_rng(8)
    b, h, hk, dh, s, smax = 1, 2, 2, 128, 128, 256
    q = jnp.asarray(rng.integers(-127, 128, (b, h, s, dh)), jnp.int8)
    kt = jnp.asarray(rng.integers(-127, 128, (b, hk, dh, smax)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (b, hk, smax, dh)), jnp.int8)
    scales = (jnp.float32(0.02), jnp.float32(0.03), jnp.float32(0.05))
    # padded prompt: only first 70 tokens are real
    want = np.asarray(int8_prefill_attention_xla(q, kt, v, jnp.asarray(70, jnp.int32), *scales))
    got = np.asarray(int8_prefill_attention(q, kt, v, jnp.asarray(70, jnp.int32), *scales,
                                            bq=128, bkv=128, interpret=True))
    # rows < 70 are fully determined; compare those
    np.testing.assert_allclose(got[:, :, :70], want[:, :, :70], rtol=2e-4, atol=2e-4)


def test_chunked_decode_matches_monolithic():
    from dgq_tpu.ops.attention import (
        int8_decode_attention_chunked,
        int8_decode_attention_xla,
    )

    q, kt, v, ln = _setup(b=2, h=8, hk=4, dh=128, smax=512, length=300)
    args = (q, kt, v, ln, jnp.float32(0.02), jnp.float32(0.03), jnp.float32(0.05))
    want = np.asarray(int8_decode_attention_xla(*args))
    got = np.asarray(int8_decode_attention_chunked(*args, chunk=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_chunked_decode_fully_masked_chunks():
    """Chunks entirely beyond `length` must contribute nothing."""
    from dgq_tpu.ops.attention import (
        int8_decode_attention_chunked,
        int8_decode_attention_xla,
    )

    q, kt, v, _ = _setup(b=1, h=4, hk=4, dh=128, smax=512)
    scales = (jnp.float32(0.02), jnp.float32(0.03), jnp.float32(0.05))
    short = jnp.asarray(100, jnp.int32)  # chunks 1..3 fully masked at chunk=128
    want = np.asarray(int8_decode_attention_xla(q, kt, v, short, *scales))
    got = np.asarray(int8_decode_attention_chunked(q, kt, v, short, *scales,
                                                   chunk=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
