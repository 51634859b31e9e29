"""Evaluation harnesses: perplexity and MMLU.

Perplexity mirrors the reference's total_model_eval
(reference: dgq/utils/evalutils.py:124-147): slice the test token stream into
seqlen windows, mean CE over shifted logits per window, ppl =
exp(sum(nll)/(nsamples*seqlen)).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("logits_fn",))
def _window_nll(logits_fn, params_and_state, batch: jax.Array) -> jax.Array:
    """Mean token NLL for one (1, S) window."""
    logits = logits_fn(params_and_state, batch)
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = batch[:, 1:]
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, shift_labels[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def ppl_eval(
    logits_fn: Callable,
    params_and_state,
    token_stream: np.ndarray,
    seqlen: int = 2048,
    *,
    max_samples: Optional[int] = None,
    verbose: bool = False,
) -> float:
    """Perplexity of a flat token stream.

    ``logits_fn(params_and_state, batch)`` -> (1, S, V) logits; it is jitted
    here, so pass a hashable (e.g. partial-free) callable.
    """
    tokens = np.asarray(token_stream).reshape(-1)
    nsamples = len(tokens) // seqlen
    if max_samples is not None:
        nsamples = min(nsamples, max_samples)
    nlls = []
    for i in range(nsamples):
        batch = jnp.asarray(tokens[i * seqlen : (i + 1) * seqlen][None, :], jnp.int32)
        nll = _window_nll(logits_fn, params_and_state, batch)
        nlls.append(float(nll) * seqlen)
        if verbose:
            print(f"[ppl] window {i+1}/{nsamples}: running ppl = "
                  f"{np.exp(np.sum(nlls) / ((i + 1) * seqlen)):.4f}")
    return float(np.exp(np.sum(nlls) / (nsamples * seqlen)))


def mmlu_accuracy(
    logits_fn: Callable,
    params_and_state,
    examples,
    abcd_token_ids,
    *,
    verbose: bool = False,
) -> dict:
    """MMLU accuracy: argmax over A/B/C/D logits at the answer position
    (reference: dgq/utils/evalutils.py:85-122).

    ``examples`` is an iterable of dicts with 'input_ids' (list[int]),
    'answer_pos' (index of the answer token), 'label' (0..3), 'subject'.
    """
    abcd = jnp.asarray(abcd_token_ids)
    per_subject: dict = {}
    for ex in examples:
        batch = jnp.asarray(np.asarray(ex["input_ids"])[None, :], jnp.int32)
        logits = logits_fn(params_and_state, batch)
        logit_abcd = logits[0, ex["answer_pos"] - 1, abcd]
        pred = int(jnp.argmax(logit_abcd))
        subj = per_subject.setdefault(ex["subject"], {"refs": [], "preds": []})
        subj["refs"].append(int(ex["label"]))
        subj["preds"].append(pred)
    results = {}
    scores = []
    for subject, d in per_subject.items():
        n = len(d["refs"])
        score = 0 if n == 0 else sum(r == p for r, p in zip(d["refs"], d["preds"])) / n
        results[f"accuracy_{subject}"] = score
        scores.append(score)
    results["accuracy"] = float(np.mean(scores)) if scores else 0.0
    return results
