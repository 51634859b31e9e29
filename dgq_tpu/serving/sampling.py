"""Token sampling for generation/serving.

The reference generates nothing (its CLI only evaluates); greedy decoding
plus standard temperature / top-k / top-p sampling are table-stakes for a
serving engine, implemented as pure jittable functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0  # 1.0 => disabled

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def sample_logits(
    logits: jax.Array,  # (B, V) f32
    params: SamplingParams,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """(B,) int32 sampled token ids."""
    if params.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    assert key is not None, "non-greedy sampling needs a PRNG key"
    x = logits.astype(jnp.float32) / params.temperature

    if params.top_k > 0:
        kth = jnp.sort(x, axis=-1)[:, -params.top_k][:, None]
        x = jnp.where(x < kth, -jnp.inf, x)

    if params.top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p (always
        # keep the argmax)
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1)  # (B,)
        kth = jnp.take_along_axis(sorted_x, cutoff_idx[:, None], axis=-1)
        x = jnp.where(x < kth, -jnp.inf, x)

    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)
