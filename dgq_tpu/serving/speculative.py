"""Speculative decoding: prompt-lookup (n-gram) drafting + exact greedy
verification.

No reference counterpart (ilur98/DGQ has no serving layer at all, SURVEY
§2.3) — this exploits a TPU-specific property this build measured: decode
is MXU stationary-feed-bound (the weight operand streams into the MXU at a
fixed elem/s regardless of M — scripts/probe_mxu_feed.py), so verifying
K+1 tokens in one forward costs roughly the same as decoding 1.  Every
accepted draft token is therefore a ~free extra token: tok/s multiplies by
the mean accepted length with no draft model and no extra memory.

Exactness contract: every emitted token is the greedy argmax of the
model's verification forward, so the output is always a valid greedy
decode of the model.  It is bitwise identical to ``generate(...)`` when
decode and verify run the same numeric path (the XLA fallback / interpret
modes — pinned by tests/test_speculative.py); on the TPU kernel path the
s=1 fused-GEMV decode and the s=K+1 prefill-GEMM verify round fp
differently, so near-tie argmaxes can legitimately flip (observable on
random-weight models, vanishingly rare on trained weights with peaked
logits — scripts/bench_speculative.py reports the first divergence).

Drafting is host-side prompt-lookup (the "assisted generation" n-gram
scheme): the longest suffix n-gram of the generated-so-far sequence is
located earlier in the context and the K tokens that followed it become the
draft.  Great on code/structured text; on mismatch the only cost is that
the step emits 1 token like plain decode.

Verification is one jitted forward of the K+1 candidate tokens through the
INT8 engine with the standard causal mask; the KV cache length is rolled
back to cover exactly the accepted prefix (entries past ``length`` are
masked by every attention path and overwritten by the next step, so
rejected drafts leave no trace).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.models.engine import (
    EngineConfig,
    EngineParams,
    KVCache,
    engine_forward,
    init_kv_cache,
)


def ngram_propose(
    history, k: int, *, max_ngram: int = 3, window: int = 4096
) -> np.ndarray:
    """Draft ``k`` tokens by prompt lookup: find the most recent earlier
    occurrence of the longest suffix n-gram (n <= max_ngram) and return the
    tokens that followed it.  Falls back to repeating the last token (a
    degenerate draft that verification simply rejects)."""
    h = np.asarray(history, dtype=np.int64)[-window:]
    L = h.shape[0]
    for n in range(min(max_ngram, L - 1), 0, -1):
        suffix = h[L - n:]
        windows = np.lib.stride_tricks.sliding_window_view(h, n)  # (L-n+1, n)
        starts = np.nonzero((windows == suffix).all(axis=1))[0]
        starts = starts[starts + n < L]  # a continuation must exist
        if starts.size == 0:
            continue
        s = int(starts[-1])
        cont = h[s + n: s + n + k]
        out = np.empty(k, np.int32)
        out[: cont.shape[0]] = cont
        out[cont.shape[0]:] = int(cont[-1])
        return out
    return np.full(k, int(h[-1]), np.int32)


@partial(jax.jit, static_argnames=("ecfg",))
def spec_verify_step(
    ecfg: EngineConfig,
    params: EngineParams,
    tok: jax.Array,  # (1, 1) int32 — accepted token not yet fed
    drafts: jax.Array,  # (1, K) int32 — proposed continuation
    cache: KVCache,
) -> Tuple[jax.Array, jax.Array, jax.Array, KVCache]:
    """One speculative step: feed [tok, drafts], accept the longest draft
    prefix the model agrees with, emit those plus the model's correction.

    Returns (out_tokens (1, K+1) — first n_out valid, n_out (scalar),
    next_tok (1, 1), cache with length covering exactly the fed+accepted
    prefix).  Batch is 1: the engine KVCache has one shared length scalar
    (the slot-based serving cache in serving/batch_engine.py is the B>1
    path)."""
    b, kd = drafts.shape
    ids = jnp.concatenate([tok, drafts], axis=1)  # (1, K+1)
    logits, cache2 = engine_forward(ecfg, params, ids, cache)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (1, K+1)
    # greedy[:, i] is the model's token after ids[:, :i+1] (causal), so
    # draft i is accepted iff every earlier draft matched and it matches
    match = (drafts == greedy[:, :-1]).astype(jnp.int32)  # (1, K)
    n_acc = jnp.cumprod(match, axis=1).sum(axis=1)  # (1,)
    corr = jnp.take_along_axis(greedy, n_acc[:, None], axis=1)  # (1, 1)
    pos = jnp.arange(kd + 1)[None, :]
    drafts_pad = jnp.concatenate([drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
    out = jnp.where(pos < n_acc[:, None], drafts_pad,
                    jnp.where(pos == n_acc[:, None], corr, 0))
    n_out = n_acc[0] + 1
    # roll back: tok + accepted drafts are real context; rejected drafts'
    # K/V entries sit past `length`, masked and later overwritten
    cache_rb = KVCache(k=cache2.k, v=cache2.v, length=cache.length + 1 + n_acc[0])
    return out, n_out, corr, cache_rb


def generate_speculative(
    ecfg: EngineConfig,
    params: EngineParams,
    prompt_ids: jax.Array,  # (1, S)
    max_new_tokens: int,
    max_len: int,
    *,
    spec_k: int = 4,
    max_ngram: int = 3,
) -> Tuple[jax.Array, dict]:
    """Greedy generation with prompt-lookup speculative decoding.

    Output is bitwise identical to ``generate(..., greedy)``; the win is
    fewer forward dispatches (stats returned: steps, tokens, mean accepted).
    Near the cache-capacity edge it falls back to plain single-token steps
    so drafts never overrun ``max_len``."""
    b, s = prompt_ids.shape
    assert b == 1, "speculative generate is per-sequence (use the batcher for B>1)"
    cache = init_kv_cache(ecfg.cfg, b, max_len)
    logits, cache = engine_forward(ecfg, params, prompt_ids, cache)
    next_tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)  # (1,1)
    history: List[int] = list(np.asarray(prompt_ids[0])) + [int(next_tok[0, 0])]
    toks: List[int] = [int(next_tok[0, 0])]
    steps = 0
    while len(toks) < max_new_tokens:
        length_now = s + len(toks)  # tokens fed so far is length_now (prompt + accepted); next step feeds <= spec_k + 1 more
        if length_now + spec_k + 1 > max_len or len(toks) + 1 >= max_new_tokens:
            # capacity edge / single token left: plain decode step
            logits, cache = engine_forward(ecfg, params, next_tok, cache)
            next_tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            toks.append(int(next_tok[0, 0]))
            history.append(toks[-1])
            steps += 1
            continue
        drafts = jnp.asarray(ngram_propose(history, spec_k, max_ngram=max_ngram))[None, :]
        out, n_out, next_tok, cache = spec_verify_step(ecfg, params, next_tok, drafts, cache)
        # ONE host round trip per step: out + n_out fetched together
        # (next_tok's value is new[-1]; the device array stays resident)
        out_h, n = jax.device_get((out, n_out))
        new = [int(t) for t in out_h[0, : int(n)]]
        toks.extend(new)
        history.extend(new)
        steps += 1
    toks = toks[:max_new_tokens]
    stats = {
        "steps": steps + 1,  # + prefill-step token
        "tokens": len(toks),
        "tokens_per_step": len(toks) / max(steps, 1),
    }
    return jnp.asarray(toks, jnp.int32)[None, :], stats
