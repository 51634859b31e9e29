"""Native-S4 weight storage probe (ROADMAP round-4 decisive design).

Both the int8 plane-dot GEMV and the nibble-unpack s4 GEMV are
VPU-unpack-bound at their best (~495 G welem/s, ab_norm_gemv_s4 second
A/B): the per-element shift/mask/cast of the packed nibble stream is the
ceiling, not the MXU feed.  A dense jnp.int4 (K, N) array occupies the
same HBM bytes as the packed-nibble int8 layout but the MXU consumes it
DIRECTLY — zero unpack on the critical path.  This probe answers, on the
real chip, interleaved in one window:

  A. int8-dense     : s8 x s8 dot at M=8 — the production feed-rate floor
  B. s4-prestaged   : s4 x s4 dot, weights staged to s4 on device once
                      (device-resident s4 jit args; known-crashy on some
                      axon versions — guarded)
  C. s4-bitcast     : weights live as int8 (K, N//2) jit args (tunnel
                      safe), bitcast_convert_type -> (K, N//2, 2) s4 ->
                      reshape (K, N) INSIDE the jit.  If XLA lowers the
                      bitcast+reshape as a free relayout the rate matches
                      B; if it materializes, the copy shows up.
  D. pallas-s4ref   : minimal Pallas GEMV whose weight REF is s4
                      (staged via astype outside).  Tests Mosaic s4 VMEM
                      loads + direct s4 dots without the i32->i4 cast
                      chain the current _plane_dot_s4 pays.
  E. plane-kern     : production fused_norm_gemv (int8 plane dot) as the
                      same-window baseline.

Also verifies the bitcast nibble ORDER (element 0 = low nibble?) so the
engine pack layout can match XLA's native int4 packing.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dgq_tpu.ops.fused_decode import fused_norm_gemv  # noqa: E402
from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

K, N = 4096, 12288
B = 8  # decode rows (int4 paths run 2B stacked rows)


def check_bitcast_order():
    """Which nibble of the int8 byte becomes s4 element 0?"""
    b = jnp.asarray([[0x21]], jnp.int8)  # hi=2, lo=1
    got = jax.jit(lambda v: jax.lax.bitcast_convert_type(v, jnp.int4)
                  .astype(jnp.int32))(b)
    pair = np.asarray(got)[0, 0]
    print(f"bitcast(0x21) -> {pair.tolist()}  "
          f"({'elem0=LO nibble' if pair[0] == 1 else 'elem0=HI nibble'})",
          flush=True)


def main():
    r = np.random.default_rng(0)
    w8 = jnp.asarray(r.integers(-127, 127, (K, N)), jnp.int8)
    x8 = jnp.asarray(r.integers(-127, 127, (B, K)), jnp.int8)
    x4_8 = jnp.asarray(r.integers(-8, 8, (2 * B, K)), jnp.int8)
    # packed int8 carrier for the bitcast path: (K, N//2), random bytes
    wb = jnp.asarray(r.integers(-128, 128, (K, N // 2)), jnp.int8)

    check_bitcast_order()

    def dot(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    # ---- A: int8 dense --------------------------------------------------
    def fb8(out, x):
        return (out[:, :K] & 0x7F).astype(jnp.int8)

    # ---- B: prestaged s4 -------------------------------------------------
    s4_ok = True
    try:
        w4 = jax.jit(lambda w: (w & 0x7).astype(jnp.int4))(w8)
        x4 = jax.jit(lambda x: x.astype(jnp.int4))(x4_8)
        probe = jax.jit(dot)(x4, w4)
        np.asarray(jax.device_get(probe[0, :1]))

        def fb4(out, x):
            return ((out[:, :K] & 0x7) - 4).astype(jnp.int4)
    except Exception as e:  # noqa: BLE001
        s4_ok = False
        print(f"B prestaged-s4 unavailable: {type(e).__name__}: {str(e)[:140]}",
              flush=True)

    # ---- C: bitcast staging inside jit ----------------------------------
    def dot_bitcast(x, wbytes):
        w4c = jax.lax.bitcast_convert_type(wbytes, jnp.int4).reshape(K, N)
        return dot(x.astype(jnp.int4), w4c)

    def fbc(out, x):
        return ((out[:, :K] & 0x7) - 4).astype(jnp.int8)

    # ---- D: pallas s4-ref GEMV -------------------------------------------
    bn = 512

    def _s4_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.int4), w_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @jax.jit
    def pallas_s4(x, w4a):
        return pl.pallas_call(
            _s4_kernel,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((2 * B, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * B, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * B, N), jnp.int32),
        )(x, w4a)

    pallas_s4_ok = s4_ok
    if s4_ok:
        try:
            out = pallas_s4(x4_8, w4)
            ref = dot(x4_8.astype(jnp.int32), np.asarray(w4).astype(np.int32))
            ok = np.array_equal(np.asarray(out), np.asarray(ref))
            print(f"D pallas-s4ref correctness: {'EXACT' if ok else 'MISMATCH'}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            pallas_s4_ok = False
            print(f"D pallas-s4ref unavailable: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # ---- D2: pallas s4-ref with packed-int8 input + in-kernel bitcast ----
    def _s4_bitcast_kernel(x_ref, wb_ref, o_ref):
        w4c = pltpu.bitcast(wb_ref[:], jnp.int4)  # (K, bn//2) i8 -> ? s4
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.int4), w4c.reshape(K, -1),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    @jax.jit
    def pallas_s4_bitcast(x, wbytes):
        return pl.pallas_call(
            _s4_bitcast_kernel,
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((2 * B, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn // 2), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * B, bn), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * B, N), jnp.int32),
        )(x, wbytes)

    try:
        out = pallas_s4_bitcast(x4_8, wb)
        np.asarray(out[0, :1])
        print("D2 pallas in-kernel pltpu.bitcast i8->s4: COMPILES", flush=True)
        d2_ok = True
    except Exception as e:  # noqa: BLE001
        d2_ok = False
        print(f"D2 pallas in-kernel bitcast unavailable: "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # ---- E: production plane kernel --------------------------------------
    g = K // 128
    sh, sl = (jnp.asarray(r.integers(1, 4, (g // 2, N)), jnp.int8) for _ in range(2))
    zh, zl = (jnp.asarray(r.integers(0, 16, (g // 2, N)), jnp.int8) for _ in range(2))
    al = jnp.asarray(r.random(N), jnp.float32) * 1e-4
    lnw = jnp.ones((K,), jnp.float32)
    qw = jnp.asarray(r.integers(-128, 128, (K // 2, N)), jnp.int8)

    def kern(x, *args):
        return fused_norm_gemv(x.astype(jnp.float32), lnw, None, *args)

    def fbk(out, x):
        return (out[:, :K].astype(jnp.int32) & 0x7F).astype(jnp.int8)

    cands = [("A int8-dense ", dot, (x8, w8), fb8)]
    if s4_ok:
        cands.append(("B s4-staged  ", dot, (x4, w4), fb4))
    cands.append(("C s4-bitcast ", dot_bitcast, (x4_8, wb), fbc))
    if pallas_s4_ok:
        def fbp(out, x):
            return ((out[:, :K] & 0x7) - 4).astype(jnp.int8)
        cands.append(("D pallas-s4  ", pallas_s4, (x4_8, w4), fbp))
    if d2_ok:
        def fbp2(out, x):
            return ((out[:, :K] & 0x7) - 4).astype(jnp.int8)
        cands.append(("D2 pl-bitcast", pallas_s4_bitcast, (x4_8, wb), fbp2))
    cands.append(("E plane-kern ", kern, (x8, qw, sh, sl, zh, zl, al), fbk))

    for rep in range(3):
        for name, f, args, fb in cands:
            try:
                t = device_time(f, *args, feedback=fb, iters=48, base_iters=12)
                print(f"[{rep}] {name}: {t*1e6:7.1f} us -> "
                      f"{K*N/t/1e9:6.0f} G welem/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[{rep}] {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
