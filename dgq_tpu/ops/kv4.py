"""INT4 KV-cache packing (kv_bits=4 engine mode).

Beyond the reference (INT8 KV only, llama_a8w4.py:113-120): K/V quantize to
symmetric INT4 [-7, 7] and pack two values per byte along the HEAD dim, so
every cache position stays byte-aligned for positional writes:

  K cache (B, Hkv, Dh,   Smax) int8  ->  (B, Hkv, Dh//2, Smax) packed
  V cache (B, Hkv, Smax, Dh)   int8  ->  (B, Hkv, Smax, Dh//2) packed

Scales derive from the calibrated INT8 scales (absmax-based):
``scale4 = scale8 * (127 / 7)`` maps the same absmax onto the int4 range.
Attention paths unpack with arithmetic shifts (sign-extended nibbles) and
fold scale4 into the score / p@V epilogues.  Device memory halves; the
dual-grained weight path is untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# int8->int4 range ratio: same absmax, 4-bit symmetric grid
KV4_RATIO = 127.0 / 7.0


def quantize_kv4(x: jax.Array, scale8: jax.Array) -> jax.Array:
    """fp -> int4 codes in [-7, 7] (stored in int8), using the calibrated
    int8 scale: scale4 = scale8 * 127/7."""
    s4 = scale8 * KV4_RATIO
    return jnp.clip(jnp.round(x / s4), -7, 7).astype(jnp.int8)


def pack_nibbles(x4: jax.Array, axis: int = -1) -> jax.Array:
    """Pack int4 codes pairwise along ``axis`` (must have even length):
    even indices -> low nibble, odd -> high nibble."""
    assert x4.shape[axis] % 2 == 0, (x4.shape, axis)
    lo = jnp.take(x4, jnp.arange(0, x4.shape[axis], 2), axis=axis)
    hi = jnp.take(x4, jnp.arange(1, x4.shape[axis], 2), axis=axis)
    return ((hi.astype(jnp.uint8) << 4) | (lo.astype(jnp.uint8) & 0xF)).astype(jnp.int8)


def unpack_nibbles(packed: jax.Array, axis: int = -1) -> jax.Array:
    """Inverse of pack_nibbles: int8 bytes -> sign-extended int4 values,
    interleaved back to the original order along ``axis``."""
    lo = (packed << 4) >> 4  # arithmetic shifts sign-extend the low nibble
    hi = packed >> 4
    stacked = jnp.stack([lo, hi], axis=axis + 1 if axis >= 0 else packed.ndim + axis + 1)
    shape = list(packed.shape)
    ax = axis if axis >= 0 else packed.ndim + axis
    shape[ax] = shape[ax] * 2
    return stacked.reshape(shape)
