"""Isolate where the quant_pv decode-attention cost goes on real hardware.

Five kernel variants at the 7B decode shape (rep x Smax scores per
(b, head) program), all sharing the scores+softmax prologue:
  fp        : p @ f32-dequantized V                  (the fast baseline)
  quant     : round(e*127) -> s8 dot -> epilogue     (the shipped quant_pv)
  noround   : (e*127) cast s8 without rounding       (is jnp.round the cost?)
  nodeq     : p @ V.astype(f32) (no *v_scale)        (is the scale mul free?)
  s32dot    : e f32 -> s8 -> dot -> skip epilogue    (is the epilogue the cost?)

Run: python scripts/probe_quant_pv_parts.py   (~2-4 min on the chip)
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from dgq_tpu.utils.benchmarking import device_time  # noqa: E402

B, H, HK, DH, SMAX = 1, 32, 32, 128, 2048


def _body(len_ref, scale_ref, q_ref, kt_ref, v_ref, out_ref, *, mode):
    rep, dh = q_ref.shape[2], q_ref.shape[3]
    smax = kt_ref.shape[3]
    length = len_ref[pl.program_id(0)]
    q = q_ref[0, 0]
    kt = kt_ref[0, 0]
    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    s = scores.astype(jnp.float32) * scale_ref[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (rep, smax), 1)
    s = jnp.where(pos < length, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    v_scale = scale_ref[1]
    if mode == "fp":
        p = e / denom
        vf = v_ref[0, 0].astype(jnp.float32) * v_scale
        out_ref[0, 0] = jax.lax.dot_general(
            p, vf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    elif mode == "nodeq":
        p = e / denom
        vf = v_ref[0, 0].astype(jnp.float32)
        out_ref[0, 0] = jax.lax.dot_general(
            p, vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * v_scale
    else:
        if mode == "quant":
            qe = jnp.round(e * 127.0).astype(jnp.int8)
        elif mode == "quant_fast":  # shipped rule: round-half-up via trunc
            qe = (e * 127.0 + 0.5).astype(jnp.int8)
        else:  # noround / s32dot
            qe = (e * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qe, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if mode == "s32dot":
            out_ref[0, 0] = acc.astype(jnp.float32)
        else:
            out_ref[0, 0] = acc.astype(jnp.float32) * ((v_scale / 127.0) / denom)


@functools.partial(jax.jit, static_argnames=("mode",))
def attn(q_s8, kt, v, length, mode):
    b, h, dh = q_s8.shape
    hk = kt.shape[1]
    rep = h // hk
    qg = q_s8.reshape(b, hk, rep, dh)
    scales = jnp.stack([jnp.float32(0.01 * 0.01 / 11.3), jnp.float32(0.01),
                        jnp.float32(0)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hk),
        in_specs=[
            pl.BlockSpec((1, 1, rep, dh), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh, SMAX), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SMAX, dh), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, dh), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_body, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hk, rep, dh), jnp.float32),
    )(length, scales, qg, kt, v).reshape(b, h, dh)


def main():
    r = np.random.default_rng(0)
    q = jnp.asarray(r.integers(-127, 128, (B, H, DH)), jnp.int8)
    kt = jnp.asarray(r.integers(-127, 128, (B, HK, DH, SMAX)), jnp.int8)
    v = jnp.asarray(r.integers(-127, 128, (B, HK, SMAX, DH)), jnp.int8)
    length = jnp.full((B,), SMAX, jnp.int32)

    def fb(out, qin):
        del qin
        return jnp.clip(jnp.round(out * 8.0), -127, 127).astype(jnp.int8)

    # warm all programs first, then measure ROUND-ROBIN so window drift hits
    # every variant equally (the tunnel swings 2x across minutes)
    modes = ("fp", "nodeq", "quant", "quant_fast", "noround", "s32dot")
    fns = {}
    for mode in modes:
        f = functools.partial(attn, kt=kt, v=v, length=length, mode=mode)
        fns[mode] = lambda a, f=f: f(a)
        jax.device_get(fns[mode](q))
    ncyc = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    res = {m: [] for m in modes}
    for rep in range(ncyc):
        for mode in modes:
            t = device_time(fns[mode], q, feedback=fb, iters=48, base_iters=12,
                            repeats=1)
            res[mode].append(t * 1e6)
    for mode in modes:
        v3 = ", ".join(f"{x:7.1f}" for x in res[mode])
        print(f"{mode:10s}: best {min(res[mode]):7.1f} us  reps [{v3}]",
              flush=True)
    # paired per-cycle ratios cancel slow window drift (both legs of a pair
    # sit in the same ~second of tunnel time); median over cycles kills the
    # remaining spikes
    for mode in modes[1:]:
        ratios = sorted(res[mode][i] / res["fp"][i] for i in range(ncyc))
        med = ratios[len(ratios) // 2]
        print(f"paired {mode:10s}/fp: median {med:5.2f}  "
              f"[{', '.join(f'{x:4.2f}' for x in ratios)}]", flush=True)


if __name__ == "__main__":
    main()
