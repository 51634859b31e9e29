"""Chip-scale end-to-end PTQ integration proof (VERDICT r4 #7).

Real LLaMA weights do not exist in this environment, so BASELINE configs
1-3 can't produce a real ppl number; this script de-risks them beyond
tiny-model CPU parity by running the FULL calibrate -> pack -> engine
pipeline on a mid-size RANDOM model ON the TPU:

  1. init a ~0.4-0.8B LLaMA-shaped model (default 24 layers x 2048 hidden,
     real 7B-like head_dim 128, groupsize 128) on device,
  2. wall-clock ptq() — the exact 3-pass calibration order
     (reference: quant_sequence.py:17-115) with smoothing, two-stage DGQ
     grid searches and KV calibration at REAL layer shapes,
  3. convert with from_ptq (rowpair s4 packing included) and
  4. gate engine prefill logits against the fake-quant reference path
     (llama_apply with QuantState all-on) — the same contract
     tests/test_engine.py gates on tiny shapes, here at scale.

Prints one JSON line with the wall-clock splits so tpu_revalidate can
archive it.  Usage:
  python scripts/tpu_ptq_e2e.py [--layers 24] [--hidden 2048] [--seq 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--hidden", type=int, default=2048)
    # intermediate must have an EVEN group count (span packing pairs two
    # groups per byte row; every real LLaMA size does: 11008/128=86): 5632
    # keeps ~0.7B scale with 44 groups
    ap.add_argument("--intermediate", type=int, default=5632)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--kv-heads", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--seq", type=int, default=512, help="calib sample length")
    ap.add_argument("--nsamples", type=int, default=4)
    ap.add_argument("--prefill", type=int, default=128,
                    help="engine-vs-fakequant gate prompt length")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
    from dgq_tpu.models.engine import EngineConfig, engine_forward, from_ptq, init_kv_cache
    from dgq_tpu.models.llama import LlamaConfig, QuantState, init_llama_params, llama_apply
    from dgq_tpu.quant.calibrate import ptq_llama
    from dgq_tpu.utils.datautils import synthetic_stream

    out = {"ok": False, "backend": jax.default_backend(),
           "device": jax.devices()[0].device_kind}
    cfg = LlamaConfig(
        vocab_size=args.vocab, hidden_size=args.hidden,
        intermediate_size=args.intermediate, num_hidden_layers=args.layers,
        num_attention_heads=args.heads, num_key_value_heads=args.kv_heads,
        max_position_embeddings=max(2 * args.seq, 1024),
    )
    n_params = (
        cfg.vocab_size * cfg.hidden_size * 2
        + cfg.num_hidden_layers * (
            4 * cfg.hidden_size * cfg.hidden_size
            + 3 * cfg.hidden_size * cfg.intermediate_size)
    )
    out["model"] = {"layers": args.layers, "hidden": args.hidden,
                    "intermediate": args.intermediate,
                    "params_m": round(n_params / 1e6, 1)}

    t0 = time.time()
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    out["t_init_s"] = round(time.time() - t0, 1)

    calib = jnp.asarray(
        synthetic_stream(cfg.vocab_size, args.nsamples * args.seq)
        .reshape(args.nsamples, args.seq))
    qcfg = QuantConfig(act_quant=ActQuantConfig(),
                       wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)

    t0 = time.time()
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)
    jax.block_until_ready(res.params)
    out["t_ptq_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    eng = from_ptq(res.params, res.kv_scales, cfg)
    jax.block_until_ready(eng.layers)
    out["t_convert_s"] = round(time.time() - t0, 1)

    # gate: engine INT8 dataflow vs the fake-quant reference forward
    ids = jnp.asarray(
        synthetic_stream(cfg.vocab_size, args.prefill, seed=9)
        .reshape(1, args.prefill))
    on_tpu = jax.default_backend() not in ("cpu",)
    ecfg = EngineConfig(cfg=cfg, use_kernel=on_tpu)
    cache = init_kv_cache(cfg, 1, 2 * args.prefill)
    t0 = time.time()
    logits, cache2 = engine_forward(ecfg, eng, ids, cache)
    jax.block_until_ready(logits)
    out["t_engine_prefill_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    qs = QuantState(actq=True, wtq=True, kv=True)
    fq = llama_apply(res.params, ids, cfg, qs, res.kv_scales)
    jax.block_until_ready(fq)
    out["t_fakequant_s"] = round(time.time() - t0, 1)

    top1_eng = np.asarray(jnp.argmax(logits[0], -1))
    top1_fq = np.asarray(jnp.argmax(fq[0], -1))
    agree = float((top1_eng == top1_fq).mean())
    lp_e = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    lp_f = jax.nn.log_softmax(fq[0].astype(jnp.float32), axis=-1)
    drift = float(jnp.mean(jnp.abs(lp_e - lp_f)))
    out["engine_vs_fakequant"] = {"top1_agreement": round(agree, 4),
                                  "mean_abs_logprob_drift": round(drift, 4)}
    out["finite"] = bool(jnp.isfinite(logits).all())

    # the tiny-model contract (tests/test_engine.py) at scale
    out["ok"] = bool(out["finite"] and agree > 0.8)
    print(json.dumps(out), flush=True)
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
