"""TPU smoke + A/B for the quant_pv decode-attention path at 7B shape.

Checks the f32->int8 prob quantization lowers through Mosaic on real
hardware (interpret-mode correctness is covered in tests/test_quant_pv.py)
and gives a same-window fp-p@V vs int8-p@V timing pair.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dgq_tpu.ops.attention import int8_decode_attention  # noqa: E402
from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

B, H, HK, DH, SMAX = 1, 32, 32, 128, 2048


def main():
    r = np.random.default_rng(0)
    q = jnp.asarray(r.integers(-127, 128, (B, H, DH)), jnp.int8)
    kt = jnp.asarray(r.integers(-127, 128, (B, HK, DH, SMAX)), jnp.int8)
    v = jnp.asarray(r.integers(-127, 128, (B, HK, SMAX, DH)), jnp.int8)
    length = jnp.asarray([SMAX], jnp.int32)
    qs = ks = vs = jnp.float32(0.01)

    def fb(out, qin):
        del qin
        return jnp.clip(jnp.round(out * 8.0), -127, 127).astype(jnp.int8)

    for name, qpv in (("fp p@V  ", False), ("int8 p@V", True)):
        f = lambda a: int8_decode_attention(a, kt, v, length, qs, ks, vs, quant_pv=qpv)  # noqa: E731
        y = f(q)
        print(f"{name}: out[0,0,:3] = {np.asarray(jax.device_get(y[0, 0, :3]))}")
        t = device_time(f, q, feedback=fb, iters=64, base_iters=16, repeats=2)
        print(f"{name}: {t*1e6:7.1f} us/call", flush=True)


if __name__ == "__main__":
    main()
