"""Speculative decoding: prompt-lookup drafting + exact greedy verification.

The contract is bitwise equality with plain greedy decoding — speculation
may only change HOW MANY dispatches produce the tokens, never the tokens.
"""

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import EngineConfig, generate
from dgq_tpu.models.llama import LlamaConfig
from dgq_tpu.models.synthetic import build_llama_engine
from dgq_tpu.serving.speculative import (
    generate_speculative,
    ngram_propose,
    spec_verify_step,
)


def _tiny():
    cfg = LlamaConfig(vocab_size=128, hidden_size=256, intermediate_size=512,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, max_position_embeddings=256)
    return cfg, build_llama_engine(cfg, seed=3)


def test_ngram_propose_finds_repeat():
    # ... 7 8 9 [5 6] X Y Z [5 6] -> draft should continue with X Y Z-like
    h = [7, 8, 9, 5, 6, 11, 12, 13, 5, 6]
    d = ngram_propose(h, 3, max_ngram=2)
    assert list(d) == [11, 12, 13]


def test_ngram_propose_most_recent_match_wins():
    h = [5, 6, 1, 1, 5, 6, 2, 2, 5, 6]
    d = ngram_propose(h, 2, max_ngram=2)
    assert list(d) == [2, 2]


def test_ngram_propose_fallback_no_repeat():
    d = ngram_propose([1, 2, 3, 4], 3, max_ngram=3)
    assert d.shape == (3,)  # degenerate draft (repeats last); just legal


def test_ngram_propose_continuation_may_cover_suffix():
    # the earlier occurrence's continuation runs through the present
    # suffix region — standard prompt-lookup behavior
    h = [5, 6, 9, 5, 6]
    d = ngram_propose(h, 3, max_ngram=2)
    assert list(d) == [9, 5, 6]


def test_ngram_propose_short_continuation_padded():
    # overlapping self-match: [5,5] at position 1 has a 1-token
    # continuation -> padded to k by repeating it
    h = [9, 5, 5, 5]
    d = ngram_propose(h, 3, max_ngram=2)
    assert list(d) == [5, 5, 5]


def test_spec_generate_matches_plain_greedy():
    cfg, eng = _tiny()
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, 128, (1, 16)),
                         jnp.int32)
    ref = generate(ecfg, eng, prompt, max_new_tokens=24, max_len=128)
    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=24,
                                      max_len=128, spec_k=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert stats["tokens"] == 24


def test_spec_generate_accepts_on_repetitive_model():
    """A random tiny model quickly falls into a token loop; prompt-lookup
    must then accept drafts (tokens_per_step > 1) while staying exact."""
    cfg, eng = _tiny()
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray([[3, 5, 3, 5, 3, 5, 3, 5]], jnp.int32)
    ref = generate(ecfg, eng, prompt, max_new_tokens=32, max_len=128)
    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=32,
                                      max_len=128, spec_k=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    # random-weight models loop hard; if this ever flakes the exactness
    # test above still holds the core contract
    assert stats["tokens_per_step"] > 1.2, stats


def test_device_ngram_matches_host():
    """device_ngram_propose == ngram_propose whenever the matched
    continuation is fully inside the valid region (the only case where the
    host version doesn't pad)."""
    from dgq_tpu.serving.speculative import device_ngram_propose

    cases = [
        [7, 8, 9, 5, 6, 11, 12, 13, 5, 6],
        [5, 6, 1, 1, 5, 6, 2, 2, 5, 6],
        [5, 6, 9, 5, 6],
        [3, 5, 3, 5, 3, 5, 3, 5, 9, 3, 5],
    ]
    for h in cases:
        buf = jnp.zeros((32,), jnp.int32)
        buf = buf.at[: len(h)].set(jnp.asarray(h, jnp.int32))
        d_dev = device_ngram_propose(buf, jnp.asarray(len(h), jnp.int32), 3, max_ngram=2)
        d_host = ngram_propose(h, 3, max_ngram=2)
        np.testing.assert_array_equal(np.asarray(d_dev), d_host, err_msg=str(h))


def test_device_ngram_no_match_fallback():
    from dgq_tpu.serving.speculative import device_ngram_propose

    buf = jnp.zeros((16,), jnp.int32).at[:4].set(jnp.asarray([1, 2, 3, 4]))
    d = device_ngram_propose(buf, jnp.asarray(4, jnp.int32), 3, max_ngram=3)
    assert d.shape == (3,)  # degenerate draft; content is legal-garbage


def test_spec_generate_ondevice_matches_plain_greedy():
    """The scan-based (zero host round trips per step) mode is exact too."""
    cfg, eng = _tiny()
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray([[3, 5, 3, 5, 9, 3, 5, 3]], jnp.int32)
    ref = generate(ecfg, eng, prompt, max_new_tokens=28, max_len=128)
    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=28,
                                      max_len=128, spec_k=4, ondevice=True,
                                      chunk_steps=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert stats["tokens"] == 28


def test_spec_generate_ondevice_capacity_edge():
    cfg, eng = _tiny()
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray([[3, 5, 3, 5]], jnp.int32)
    # max_len 24 with chunk_steps=4, spec_k=4: no chunk headroom at all ->
    # plain-tail path must still produce the exact output
    ref = generate(ecfg, eng, prompt, max_new_tokens=18, max_len=24)
    out, _ = generate_speculative(ecfg, eng, prompt, max_new_tokens=18,
                                  max_len=24, spec_k=4, ondevice=True,
                                  chunk_steps=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_spec_generate_family_generic_opt():
    """Speculative decoding through a non-LLaMA engine via forward_fn
    plumbing (spec is family-generic: cache contract is (k, v, length))."""
    from dgq_tpu.config import ActQuantConfig, QuantConfig, WtQuantConfig
    from dgq_tpu.models.opt import init_opt_params, tiny_opt_config
    from dgq_tpu.models.opt_engine import (
        OPTEngineConfig,
        from_ptq_opt,
        init_opt_kv_cache,
        opt_engine_forward,
    )
    from dgq_tpu.quant.calibrate import ptq
    from dgq_tpu.utils.datautils import synthetic_stream

    cfg = tiny_opt_config(hidden_size=256, ffn_dim=512, num_attention_heads=4)
    params = init_opt_params(cfg, jax.random.PRNGKey(0))
    calib = jnp.asarray(synthetic_stream(cfg.vocab_size, 2 * 32).reshape(2, 32))
    qcfg = QuantConfig(act_quant=ActQuantConfig(), wt_quant=WtQuantConfig(groupsize=128),
                       smoothquant=True, kvquant=True)
    res = ptq(params, cfg, calib, qcfg, arch="opt", verbose=False)
    eng = from_ptq_opt(res.params, res.kv_scales, cfg)
    ecfg = OPTEngineConfig(cfg=cfg, use_kernel=False)

    def init_cache(c, b, m):
        return init_opt_kv_cache(c, b, m)

    prompt = jnp.asarray([[3, 5, 3, 5, 3, 5]], jnp.int32)
    # plain greedy reference through the same forward
    cache = init_cache(cfg, 1, 64)
    lg, cache = opt_engine_forward(ecfg, eng, prompt, cache)
    tok = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
    ref = [int(tok[0, 0])]
    for _ in range(15):
        lg, cache = opt_engine_forward(ecfg, eng, tok, cache)
        tok = jnp.argmax(lg[:, -1:, :], -1).astype(jnp.int32)
        ref.append(int(tok[0, 0]))

    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=16,
                                      max_len=64, spec_k=3,
                                      forward_fn=opt_engine_forward,
                                      init_cache_fn=init_cache)
    np.testing.assert_array_equal(np.asarray(out)[0], np.asarray(ref))
    assert stats["tokens"] == 16


def test_spec_verify_step_rollback_length():
    cfg, eng = _tiny()
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    from dgq_tpu.models.engine import engine_forward, init_kv_cache

    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    cache = init_kv_cache(cfg, 1, 64)
    logits, cache = engine_forward(ecfg, eng, prompt, cache)
    tok = jnp.argmax(logits[:, -1:, :], -1).astype(jnp.int32)
    # garbage drafts: nothing accepted -> n_out == 1, length advances by 1
    drafts = (tok[0, 0] + 1 + jnp.arange(4, dtype=jnp.int32))[None, :] % 128
    out, n_out, nxt, cache2 = spec_verify_step(ecfg, eng, tok, drafts, cache)
    n = int(n_out)
    assert 1 <= n <= 5
    assert int(cache2.length) == 4 + n  # prompt + tok + accepted drafts
    # emitted tokens must equal what plain decode would produce
    ref = generate(ecfg, eng, prompt, max_new_tokens=n + 1, max_len=64)
    np.testing.assert_array_equal(
        np.asarray(ref[0, 1:n + 1]), np.asarray(out[0, :n]))


def test_spec_generate_capacity_edge_falls_back():
    """max_len with no spec headroom: must still produce exact output via
    single-token fallback steps."""
    cfg, eng = _tiny()
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray([[3, 5, 3, 5]], jnp.int32)
    # prompt 4 + 12 new = 16 = max_len: every spec step would overrun
    ref = generate(ecfg, eng, prompt, max_new_tokens=12, max_len=16)
    out, _ = generate_speculative(ecfg, eng, prompt, max_new_tokens=12,
                                  max_len=16, spec_k=4)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_draft_model_spec_self_draft_perfect_acceptance():
    """Two-model speculation with the TARGET as its own draft: every draft
    IS the greedy continuation, so acceptance is total (K+1 tokens/step)
    and output is bitwise the plain greedy decode."""
    cfg, eng = _tiny()
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray(np.random.default_rng(1).integers(0, 128, (1, 12)),
                         jnp.int32)
    ref = generate(ecfg, eng, prompt, max_new_tokens=20, max_len=128)
    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=20,
                                      max_len=128, spec_k=4,
                                      draft=(ecfg, eng))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert stats["tokens_per_step"] > 4.0, stats  # K=4 -> 5 tokens/step


def test_draft_model_spec_bad_draft_still_exact():
    """A DIFFERENT random draft model proposes mostly-wrong tokens; output
    must still be the target's exact greedy decode."""
    cfg, eng = _tiny()
    _, draft_eng = _tiny()[0], build_llama_engine(_tiny()[0], seed=99)
    ecfg = EngineConfig(cfg=cfg, use_kernel=False)
    prompt = jnp.asarray(np.random.default_rng(2).integers(0, 128, (1, 12)),
                         jnp.int32)
    ref = generate(ecfg, eng, prompt, max_new_tokens=20, max_len=128)
    out, stats = generate_speculative(ecfg, eng, prompt, max_new_tokens=20,
                                      max_len=128, spec_k=4,
                                      draft=(ecfg, draft_eng))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert stats["tokens"] == 20
