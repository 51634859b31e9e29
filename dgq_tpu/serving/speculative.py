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


@partial(jax.jit, static_argnames=("ecfg", "forward_fn"))
def spec_verify_step(
    ecfg: EngineConfig,
    params: EngineParams,
    tok: jax.Array,  # (1, 1) int32 — accepted token not yet fed
    drafts: jax.Array,  # (1, K) int32 — proposed continuation
    cache: KVCache,
    forward_fn=engine_forward,  # any family's engine forward (same contract)
) -> Tuple[jax.Array, jax.Array, jax.Array, KVCache]:
    """One speculative step: feed [tok, drafts], accept the longest draft
    prefix the model agrees with, emit those plus the model's correction.

    Returns (out_tokens (1, K+1) — first n_out valid, n_out (scalar),
    next_tok (1, 1), cache with length covering exactly the fed+accepted
    prefix).  Batch is 1: the engine KVCache has one shared length scalar
    (the slot-based serving cache in serving/batch_engine.py is the B>1
    path).  ``forward_fn`` makes this family-generic: every engine
    (llama/opt/bloom/mpt/falcon) exposes forward(ecfg, params, ids, cache)
    -> (logits, cache) over a cache whose entries past ``length`` are
    masked and overwritten — the rollback contract."""
    b, kd = drafts.shape
    ids = jnp.concatenate([tok, drafts], axis=1)  # (1, K+1)
    # window="decode": the K+1 window is VERIFICATION, not prefill — with
    # quant_pv on, the fallback attention must quantize p @ V exactly as
    # the s == 1 decode step does, or accepted drafts would not reproduce
    # plain decode's logits (every family forward accepts this kwarg)
    logits, cache2 = forward_fn(ecfg, params, ids, cache, window="decode")
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
    cache_rb = cache2._replace(length=cache.length + 1 + n_acc[0])
    return out, n_out, corr, cache_rb


def draft_model_propose(
    decfg, dparams, dcache, feed_toks, k: int, forward_fn=None,
):
    """Draft ``k`` tokens with a DRAFT MODEL (classic two-model speculative
    decoding, complementing the model-free prompt-lookup mode): feed the
    not-yet-consumed tokens (``feed_toks`` — the pending token plus any
    tokens the draft hasn't eaten from the previous round) in one forward,
    then roll k-1 greedy single-token steps.

    Returns (drafts (k,) int32 device array, dcache advanced over
    feed_toks + drafts[:-1]).  Works with any engine family's
    forward(ecfg, params, ids, cache)."""
    from dgq_tpu.models.engine import engine_forward as _fwd

    forward_fn = forward_fn or _fwd
    ids = jnp.asarray(feed_toks, jnp.int32)[None, :]
    # the multi-token feed is a DECODE-side window (mid-generation catch-up,
    # not prompt prefill): declaring it keeps a self-draft bitwise equal to
    # the target's verify windows — perfect acceptance stays perfect
    logits, dcache = forward_fn(decfg, dparams, ids, dcache, window="decode")
    t = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)  # (1, 1)
    drafts = [t[0, 0]]
    for _ in range(k - 1):
        logits, dcache = forward_fn(decfg, dparams, t, dcache)
        t = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
        drafts.append(t[0, 0])
    return jnp.stack(drafts), dcache


def device_ngram_propose(
    buf: jax.Array,  # (L,) int32 — prompt + emitted tokens, first `length` valid
    length: jax.Array,  # () int32
    k: int,
    max_ngram: int = 3,
) -> jax.Array:
    """Device-side prompt lookup: the jnp mirror of ``ngram_propose`` over a
    fixed-capacity token buffer (static shapes, scan-safe).  For each n in
    max_ngram..1 a vectorized all-positions window compare finds the most
    recent earlier occurrence of the length-n suffix; the longest n with a
    match wins.  Tokens sliced past ``length`` are stale buffer contents —
    legal drafts (verification rejects or, if they happen to equal the
    greedy token, correctly accepts them)."""
    L = buf.shape[0]
    idx = jnp.arange(L)
    best_p = jnp.int32(-1)
    best_found = jnp.bool_(False)
    for n in range(max_ngram, 0, -1):  # static unroll; first (longest) match wins
        match = jnp.ones((L,), bool)
        for i in range(n):
            s_i = buf[length - n + i]  # suffix token i (dynamic index)
            match &= jnp.roll(buf, -i) == s_i  # position p tests buf[p+i]
        # valid starts: continuation exists (p + n < length) — this also
        # excludes the suffix occurrence itself (p = length - n)
        match &= (idx + n) < length
        p = jnp.max(jnp.where(match, idx, -1))
        found = p >= 0
        use = found & ~best_found
        best_p = jnp.where(use, p + n, best_p)  # store continuation start
        best_found |= found
    # fallback: repeat the last token (degenerate draft; verification rejects)
    start = jnp.where(best_found, best_p, length - 1)
    return jax.lax.dynamic_slice(buf, (start,), (k,))


@partial(jax.jit, static_argnames=("ecfg", "steps", "spec_k", "max_ngram", "forward_fn"))
def spec_decode_scan(
    ecfg: EngineConfig,
    params: EngineParams,
    buf: jax.Array,  # (L,) int32 — prompt + emitted (incl. pending), first buf_len valid
    buf_len: jax.Array,  # () int32
    tok: jax.Array,  # (1, 1) int32 — pending token (== buf[buf_len-1])
    cache: KVCache,
    steps: int,
    spec_k: int = 4,
    max_ngram: int = 3,
    forward_fn=engine_forward,
):
    """``steps`` speculative steps in ONE device program — drafting
    (device_ngram_propose), verification, acceptance and the token-buffer
    append all run inside a lax.scan, so there are ZERO host round trips
    per step (the host-in-the-loop variant pays a blocking device_get per
    step, which through a tunneled backend erases the acceptance win —
    scripts/bench_speculative.py documents the measurement).

    Returns (buf, buf_len, tok, cache, outs (steps, K+1), n_outs (steps,)).
    The caller must guarantee capacity: buf_len + steps*(spec_k+1) <= L and
    cache capacity likewise (generate_speculative(ondevice=True) chunks
    accordingly).  This is TPU-native speculative decoding: the entire
    loop compiles to one XLA program, pipelining like plain decode."""

    def body(carry, _):
        b, bl, t, c = carry
        drafts = device_ngram_propose(b, bl, spec_k, max_ngram)[None, :]
        out, n_out, t2, c2 = spec_verify_step(ecfg, params, t, drafts, c,
                                              forward_fn=forward_fn)
        # append the emitted tokens; entries past n_out are scratch that the
        # next step's write (at bl + n_out <= bl + K+1) overwrites
        b2 = jax.lax.dynamic_update_slice(b, out[0], (bl,))
        return (b2, bl + n_out, t2, c2), (out[0], n_out)

    (buf, buf_len, tok, cache), (outs, n_outs) = jax.lax.scan(
        body, (buf, buf_len, tok, cache), None, length=steps
    )
    return buf, buf_len, tok, cache, outs, n_outs


def generate_speculative(
    ecfg: EngineConfig,
    params: EngineParams,
    prompt_ids: jax.Array,  # (1, S)
    max_new_tokens: int,
    max_len: int,
    *,
    spec_k: int = 4,
    max_ngram: int = 3,
    ondevice: bool = False,
    chunk_steps: int = 8,
    forward_fn=None,  # family-generic: any engine's forward(ecfg, p, ids, cache)
    init_cache_fn=None,  # matching init(cfg, batch, max_len)
    draft=None,  # (draft_ecfg, draft_params): two-model speculative decoding
) -> Tuple[jax.Array, dict]:
    """Greedy generation with prompt-lookup speculative decoding.

    Output is bitwise identical to ``generate(..., greedy)``; the win is
    fewer forward dispatches (stats returned: steps, tokens, mean accepted).
    Near the cache-capacity edge it falls back to plain single-token steps
    so drafts never overrun ``max_len``.

    ``ondevice=True`` runs drafting+verification+acceptance inside
    chunk-sized lax.scans (spec_decode_scan): one host round trip per
    ``chunk_steps`` speculative steps instead of one per step — the mode to
    use over a high-latency dispatch path (and strictly less host work
    everywhere).  Drafts come from device_ngram_propose; emitted tokens are
    greedy argmaxes of the same verify forward either way.

    ``draft=(draft_ecfg, draft_params)`` switches drafting to a DRAFT MODEL
    (classic two-model speculation): the small engine rolls K greedy tokens
    from its own KV cache, the target verifies in one forward, and the
    draft cache rolls back to the accepted prefix (entries past its length
    are masked/overwritten — the same rollback contract).  Exactness is
    unchanged: emitted tokens are always the TARGET's greedy argmaxes, so
    a bad draft only costs acceptance, never correctness.  Host-loop only
    (ondevice=False)."""
    b, s = prompt_ids.shape
    assert b == 1, "speculative generate is per-sequence (use the batcher for B>1)"
    if draft is not None and ondevice:
        raise ValueError("draft-model speculation is host-loop only (ondevice=False)")
    forward_fn = forward_fn or engine_forward
    init_cache_fn = init_cache_fn or init_kv_cache
    cache = init_cache_fn(ecfg.cfg, b, max_len)
    logits, cache = forward_fn(ecfg, params, prompt_ids, cache)
    next_tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)  # (1,1)
    history: List[int] = list(np.asarray(prompt_ids[0])) + [int(next_tok[0, 0])]
    toks: List[int] = [int(next_tok[0, 0])]
    steps = 0
    if draft is not None:
        decfg, dparams = draft
        dcache = init_cache_fn(decfg.cfg, b, max_len)
        _, dcache = forward_fn(decfg, dparams, prompt_ids, dcache)  # draft prefill
        dvalid = s  # tokens the draft cache validly covers
        draft_unfed: List[int] = []  # consumed tokens the draft hasn't eaten
    if ondevice:
        buf = jnp.zeros((max_len,), jnp.int32)
        buf = jax.lax.dynamic_update_slice(buf, jnp.asarray(history, jnp.int32), (0,))
        buf_len = jnp.asarray(len(history), jnp.int32)
        while len(toks) < max_new_tokens:
            length_now = s + len(toks)
            worst = chunk_steps * (spec_k + 1)
            if (length_now + worst + spec_k + 1 > max_len
                    or len(toks) + 1 >= max_new_tokens):
                # capacity edge / single token left: plain decode tail
                logits, cache = forward_fn(ecfg, params, next_tok, cache)
                next_tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
                toks.append(int(next_tok[0, 0]))
                steps += 1
                continue
            buf, buf_len, next_tok, cache, outs, n_outs = spec_decode_scan(
                ecfg, params, buf, buf_len, next_tok, cache, chunk_steps,
                spec_k=spec_k, max_ngram=max_ngram, forward_fn=forward_fn,
            )
            outs_h, n_h = jax.device_get((outs, n_outs))  # one fetch per chunk
            for i in range(chunk_steps):
                toks.extend(int(t) for t in outs_h[i, : int(n_h[i])])
            steps += chunk_steps
        toks = toks[:max_new_tokens]
        stats = {"steps": steps + 1, "tokens": len(toks),
                 "tokens_per_step": len(toks) / max(steps, 1)}
        return jnp.asarray(toks, jnp.int32)[None, :], stats
    while len(toks) < max_new_tokens:
        length_now = s + len(toks)  # tokens fed so far is length_now (prompt + accepted); next step feeds <= spec_k + 1 more
        if length_now + spec_k + 1 > max_len or len(toks) + 1 >= max_new_tokens:
            # capacity edge / single token left: plain decode step
            if draft is not None:
                draft_unfed.append(int(next_tok[0, 0]))  # draft never ate it
            logits, cache = forward_fn(ecfg, params, next_tok, cache)
            next_tok = jnp.argmax(logits[:, -1:, :], axis=-1).astype(jnp.int32)
            toks.append(int(next_tok[0, 0]))
            history.append(toks[-1])
            steps += 1
            continue
        if draft is not None:
            feed = draft_unfed + [int(next_tok[0, 0])]
            dcache = dcache._replace(length=jnp.asarray(dvalid, jnp.int32))
            d_toks, dcache = draft_model_propose(
                decfg, dparams, dcache, feed, spec_k, forward_fn=forward_fn)
            drafts = d_toks[None, :]
        else:
            drafts = jnp.asarray(ngram_propose(history, spec_k, max_ngram=max_ngram))[None, :]
        out, n_out, next_tok, cache = spec_verify_step(
            ecfg, params, next_tok, drafts, cache, forward_fn=forward_fn)
        # ONE host round trip per step: out + n_out fetched together
        # (next_tok's value is new[-1]; the device array stays resident)
        out_h, n = jax.device_get((out, n_out))
        new = [int(t) for t in out_h[0, : int(n)]]
        toks.extend(new)
        history.extend(new)
        steps += 1
        if draft is not None:
            # draft-cache rollback: entries exist for feed + drafts[:-1];
            # the valid consumed prefix now extends through draft n_acc
            n_acc = int(n) - 1
            if n_acc < spec_k:
                dvalid = dvalid + len(feed) + n_acc
                draft_unfed = []
            else:  # all drafts accepted: the last one was never fed
                dvalid = dvalid + len(feed) + spec_k - 1
                draft_unfed = [new[spec_k - 1]]
    toks = toks[:max_new_tokens]
    stats = {
        "steps": steps + 1,  # + prefill-step token
        "tokens": len(toks),
        "tokens_per_step": len(toks) / max(steps, 1),
    }
    return jnp.asarray(toks, jnp.int32)[None, :], stats
