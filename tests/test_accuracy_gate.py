"""Accuracy-gate plumbing (BASELINE config 1): fake-quant ppl and engine
ppl must agree on tiny models, and the published-numbers gate must be armed
(VERDICT r1 #6).  The full 7B gate fires via scripts/repro_llama7b.sh the
moment a weights dir exists."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
from dgq_tpu.models.engine import EngineConfig, from_ptq
from dgq_tpu.models.llama import (
    QuantState,
    init_llama_params,
    llama_apply,
    tiny_llama_config,
)
from dgq_tpu.quant.calibrate import ptq_llama
from dgq_tpu.utils.datautils import synthetic_stream
from dgq_tpu.utils.evalutils import ppl_eval, ppl_eval_engine

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fake_quant_and_engine_ppl_agree_tiny():
    cfg = tiny_llama_config(
        hidden_size=256, intermediate_size=512, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
    )
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 64).reshape(2, 64))
    qcfg = QuantConfig(
        act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(method="search", w4w8=True, groupsize=128),
    )
    res = ptq_llama(params, cfg, calib, qcfg, verbose=False)

    stream = synthetic_stream(cfg.vocab_size, 4 * 64, seed=5)
    qs = QuantState(actq=True, wtq=True, kv=True)

    def fq_logits(ps, ids):
        p, kv = ps
        return llama_apply(p, ids, cfg, qs, kv)

    ppl_fq = ppl_eval(fq_logits, (res.params, res.kv_scales), stream, seqlen=64)

    eng = from_ptq(res.params, res.kv_scales, cfg)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    ppl_eng = ppl_eval_engine(ecfg, eng, stream, seqlen=64)

    # engine requant points inject bounded extra noise; the two ppls must
    # track each other closely (the 7B gate asserts |diff| < 0.05 on real
    # text; random tiny models are noisier, so gate relatively)
    assert np.isfinite(ppl_fq) and np.isfinite(ppl_eng)
    assert abs(ppl_eng - ppl_fq) / ppl_fq < 0.05, (ppl_fq, ppl_eng)


def test_published_gate_is_armed():
    with open(os.path.join(REPO, "BASELINE.json")) as f:
        pub = json.load(f)["published"]
    table = pub["wikitext2_ppl_seqlen2048"]
    for fam in ("llama-7b", "llama-13b", "llama-30b", "llama-65b"):
        assert fam in table["fp16"] and fam in table["dgq_a8w4_g128"]
        # quantized ppl must degrade (sanity of transcription)
        assert table["dgq_a8w4_g128"][fam] > table["fp16"][fam]
    assert os.path.exists(os.path.join(REPO, "scripts", "repro_llama7b.sh"))
    # provenance must be acknowledged, not silently dropped (VERDICT r2 #7):
    # while the quantized row is unverified-against-paper, the approx flag
    # must be present AND the gate script must surface it; deleting the
    # flag without re-verifying the constants fails here
    assert table.get("dgq_a8w4_g128_approx") is True, (
        "dgq_a8w4_g128_approx flag missing: if the numbers were re-verified "
        "against the paper, update this test; otherwise restore the flag"
    )
    with open(os.path.join(REPO, "scripts", "repro_llama7b.sh")) as f:
        gate_src = f.read()
    assert "dgq_a8w4_g128_approx" in gate_src and "WARNING" in gate_src, (
        "gate script must print the provenance caveat"
    )
