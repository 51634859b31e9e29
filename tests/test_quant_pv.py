"""Quantized-probs p @ V path (EngineConfig.quant_pv).

The reference attempted int8 softmax output and abandoned it for accuracy
(reference: opt_a8w4.py:176-179).  The rule here quantizes the
unnormalized exp-weights against the GLOBAL row max with the constant
scale 1/127 (ops/attention._quantize_exp) — path-invariant across the
whole-cache, chunked (two-pass) and paged (two-pass) kernels.  These
tests are the quality gate: every kernel must match the XLA golden, sit
within a tight error of fp p @ V, and not move a tiny engine's NLL; the
cross-path token-equality contracts live in test_path_consistency.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgq_tpu.ops.attention import (
    int8_decode_attention,
    int8_decode_attention_chunked,
    int8_decode_attention_xla,
)


def _rand_attn(b=2, h=4, hk=2, dh=64, smax=256, seed=0):
    r = np.random.default_rng(seed)
    q = jnp.asarray(r.integers(-127, 128, (b, h, dh)), jnp.int8)
    kt = jnp.asarray(r.integers(-127, 128, (b, hk, dh, smax)), jnp.int8)
    v = jnp.asarray(r.integers(-127, 128, (b, hk, smax, dh)), jnp.int8)
    scales = tuple(jnp.float32(s) for s in (0.02, 0.015, 0.01))
    return q, kt, v, scales


def test_decode_kernel_quant_pv_matches_xla_golden():
    q, kt, v, (qs, ks, vs) = _rand_attn()
    length = jnp.asarray([100, 256], jnp.int32)
    ker = int8_decode_attention(q, kt, v, length, qs, ks, vs,
                                interpret=True, quant_pv=True)
    ref = int8_decode_attention_xla(q, kt, v, length, qs, ks, vs, quant_pv=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quant_pv_error_vs_fp_is_small():
    q, kt, v, (qs, ks, vs) = _rand_attn(seed=1)
    length = jnp.asarray([200, 256], jnp.int32)
    fp = int8_decode_attention_xla(q, kt, v, length, qs, ks, vs, quant_pv=False)
    qv = int8_decode_attention_xla(q, kt, v, length, qs, ks, vs, quant_pv=True)
    fp, qv = np.asarray(fp), np.asarray(qv)
    # relative L2 error of the context vectors: per-row scales keep the
    # dominant prob components at ~0.4% code granularity.  Random int8
    # inputs make near-uniform probs — the worst case for row-max scaling
    # (every prob sits at the code granularity); peaked real attention does
    # better.  Gate at the random-input worst case.
    rel = np.linalg.norm(qv - fp) / np.linalg.norm(fp)
    assert rel < 0.03, rel


def test_chunked_kernel_quant_pv_close_to_fp():
    """Error budget vs fp AND exactness vs the dense quant rule: the
    two-pass chunked kernel quantizes against the GLOBAL row max, so it
    must land on the dense XLA golden (same codes), and its fp distance is
    the same worst-case-random ~3% budget the dense rule is gated at."""
    q, kt, v, (qs, ks, vs) = _rand_attn(smax=512, seed=2)
    length = jnp.asarray([300, 512], jnp.int32)
    fp = int8_decode_attention_chunked(q, kt, v, length, qs, ks, vs,
                                       chunk=128, interpret=True)
    qv = int8_decode_attention_chunked(q, kt, v, length, qs, ks, vs,
                                       chunk=128, interpret=True, quant_pv=True)
    dense = int8_decode_attention_xla(q, kt, v, length, qs, ks, vs,
                                      quant_pv=True)
    np.testing.assert_allclose(np.asarray(qv), np.asarray(dense),
                               rtol=2e-4, atol=2e-4)
    fp, qv = np.asarray(fp), np.asarray(qv)
    rel = np.linalg.norm(qv - fp) / np.linalg.norm(fp)
    assert rel < 0.03, rel


def test_engine_quant_pv_quality_gate():
    """Greedy decode with quant_pv on a tiny quantized engine: NLL of the
    produced logits stays within a tight delta of the fp-p@V engine."""
    from dgq_tpu.models.engine import EngineConfig, engine_forward, init_kv_cache
    from dgq_tpu.models.llama import LlamaConfig
    from dgq_tpu.models.synthetic import build_llama_engine

    cfg = LlamaConfig(vocab_size=128, hidden_size=256, intermediate_size=512,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=256)
    eng = build_llama_engine(cfg, seed=5)
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 32)),
                         jnp.int32)

    outs = {}
    for qpv in (False, True):
        ecfg = EngineConfig(cfg=cfg, use_kernel=False, quant_pv=qpv)
        cache = init_kv_cache(cfg, 1, 64)
        logits, cache = engine_forward(ecfg, eng, prompt, cache)
        tok = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)
        step_logits = []
        for _ in range(8):
            lg, cache = engine_forward(ecfg, eng, tok, cache)
            step_logits.append(np.asarray(lg[0, -1]))
            tok = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
        outs[qpv] = np.stack(step_logits)

    lp_fp = jax.nn.log_softmax(jnp.asarray(outs[False]), axis=-1)
    lp_qv = jax.nn.log_softmax(jnp.asarray(outs[True]), axis=-1)
    # distributional drift must be tiny (mean |delta log-prob| on decode steps)
    drift = float(jnp.mean(jnp.abs(lp_fp - lp_qv)))
    assert drift < 0.05, drift


@pytest.mark.parametrize("quant_pv", [False, True])
def test_kernel_paths_agree_with_goldens(quant_pv):
    """Whole-cache kernel vs chunked kernel vs XLA golden at the same flag."""
    q, kt, v, (qs, ks, vs) = _rand_attn(smax=256, seed=3)
    length = jnp.asarray([97, 256], jnp.int32)
    whole = int8_decode_attention(q, kt, v, length, qs, ks, vs,
                                  interpret=True, quant_pv=quant_pv)
    chunked = int8_decode_attention_chunked(q, kt, v, length, qs, ks, vs,
                                            chunk=128, interpret=True,
                                            quant_pv=quant_pv)
    ref = int8_decode_attention_xla(q, kt, v, length, qs, ks, vs,
                                    quant_pv=quant_pv)
    np.testing.assert_allclose(np.asarray(whole), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # chunked quant_pv quantizes against the GLOBAL row max (two-pass), so
    # its codes match the unchunked golden exactly — same tolerance both ways
    ref_n = np.linalg.norm(np.asarray(ref))
    assert np.linalg.norm(np.asarray(chunked) - np.asarray(ref)) / ref_n < 2e-4
