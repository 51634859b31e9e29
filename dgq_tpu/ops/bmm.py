"""INT8 batched matmul — the reference's BMM_S8T_S8N_F32T API surface.

The reference needs a custom CUTLASS kernel because torch has no int8
batched GEMM (reference: dgq/kernels/bmm.cu:10-80, dgq/models/bmm.py:5-24).
On TPU the MXU multiplies int8 natively through dot_general, so this is a
thin, API-compatible wrapper: ``bmm_s8t_s8n_f32t(a, b, alpha)`` computes
``alpha * (a @ b^T)`` for row-major a and b — exactly the reference's
contract (b arrives "col-major" i.e. transposed, models/bmm.py:18-24).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bmm_s8t_s8n_f32t(a_s8: jax.Array, b_s8: jax.Array, alpha) -> jax.Array:
    """(..., M, K) int8 x (..., N, K) int8 -> (..., M, N) f32, scaled.

    reference: bmm.cu:10-80 / models/bmm.py:18-24 (alpha = s_a * s_b).
    """
    s32 = jnp.einsum(
        "...mk,...nk->...mn", a_s8, b_s8, preferred_element_type=jnp.int32
    )
    return s32.astype(jnp.float32) * jnp.asarray(alpha, jnp.float32)


class BMM_S8T_S8N_F32T:
    """Stateful wrapper mirroring the reference module (models/bmm.py:5)."""

    def __init__(self, alpha: float = 1.0):
        self.alpha = jnp.asarray(alpha, jnp.float32)

    @classmethod
    def from_scale(cls, a_scale, b_scale):
        out = cls()
        out.alpha = jnp.asarray(a_scale, jnp.float32) * jnp.asarray(b_scale, jnp.float32)
        return out

    def __call__(self, a_s8: jax.Array, b_s8: jax.Array) -> jax.Array:
        return bmm_s8t_s8n_f32t(a_s8, b_s8, self.alpha)
