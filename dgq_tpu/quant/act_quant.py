"""Activation fake-quantization functions.

Pure-function counterparts of the reference's activation quantizers
(reference: dgq/quant/quant_linear.py:25-71).  Each takes and returns an fp
array; the static variant takes the calibrated absmax.  All run under jit.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def quantize_activation_static(t: jax.Array, absmax: jax.Array, n_bits: int = 8) -> jax.Array:
    """Static per-tensor symmetric. reference: quant_linear.py:66-71."""
    q_max = 2 ** (n_bits - 1) - 1
    scale = absmax.astype(jnp.float32) / q_max
    tq = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -q_max, q_max) * scale
    return tq.astype(t.dtype)


def quantize_activation_per_token_absmax(t: jax.Array, n_bits: int = 8) -> jax.Array:
    """Dynamic per-token absmax. reference: quant_linear.py:25-32."""
    q_max = 2 ** (n_bits - 1) - 1
    tf = t.astype(jnp.float32)
    scales = jnp.max(jnp.abs(tf), axis=-1, keepdims=True)
    scales = jnp.clip(scales, 1e-5, None) / q_max
    tq = jnp.clip(jnp.round(tf / scales), -q_max - 1, q_max) * scales
    return tq.astype(t.dtype)


def quantize_activation_per_tensor_absmax(t: jax.Array, n_bits: int = 8) -> jax.Array:
    """Dynamic per-tensor absmax with the reference's top-10 robust clip:
    scale = min(2 * 10th-largest channel absmax, largest channel absmax)
    (reference: quant_linear.py:35-48).
    """
    q_max = 2 ** (n_bits - 1) - 1
    tf = t.astype(jnp.float32)
    flat = tf.reshape(-1, tf.shape[-1])
    if flat.shape[1] > 10:
        maxs = jnp.max(jnp.abs(flat), axis=0)
        maxs = jnp.sort(maxs)
        scale = jnp.minimum(maxs[-10] * 2, maxs[-1])
    else:
        scale = jnp.max(jnp.abs(flat))
    scale = jnp.clip(scale, 1e-5, None) / q_max
    tq = jnp.clip(jnp.round(tf / scale), -q_max - 1, q_max) * scale
    return tq.astype(t.dtype)


def quantize_activation_per_tensor_asym(t: jax.Array, n_bits: int = 8) -> jax.Array:
    """Dynamic per-tensor asymmetric, skipping the first 3 rows when there are
    more than 10 (the reference's BOS-outlier heuristic,
    reference: quant_linear.py:50-64)."""
    q_max = 2**n_bits - 1
    tf = t.astype(jnp.float32)
    flat = tf.reshape(-1, tf.shape[-1])
    if flat.shape[0] > 10:
        minv = jnp.min(flat[3:])
        maxv = jnp.max(flat[3:])
    else:
        minv = jnp.min(flat)
        maxv = jnp.max(flat)
    scale = jnp.clip(maxv - minv, 1e-5, None) / q_max
    tq = jnp.clip(jnp.round((tf - minv) / scale), 0, q_max) * scale + minv
    return tq.astype(t.dtype)


def make_act_quant_fn(method: Optional[str], n_bits: int = 8) -> Callable:
    """Dispatch mirroring reference prepare_actfun (quant_linear.py:122-133).

    The static variant takes (t, absmax); dynamic variants take (t, absmax)
    too but ignore absmax, so call sites are uniform.
    """
    if method is None:
        return lambda t, absmax=None: t
    if method == "static":
        return lambda t, absmax: quantize_activation_static(t, absmax, n_bits)
    if method == "per_tensor":
        return lambda t, absmax=None: quantize_activation_per_tensor_absmax(t, n_bits)
    if method == "per_token":
        return lambda t, absmax=None: quantize_activation_per_token_absmax(t, n_bits)
    if method == "per_tensor_asym":
        return lambda t, absmax=None: quantize_activation_per_tensor_asym(t, n_bits)
    raise NotImplementedError(method)
