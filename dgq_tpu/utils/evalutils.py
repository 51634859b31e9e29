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


def ppl_eval_layerwise(
    params,
    cfg,
    token_stream: np.ndarray,
    seqlen: int = 2048,
    *,
    arch: str = "llama",
    qs=None,
    kv_scales=None,
    max_samples: Optional[int] = None,
    verbose: bool = False,
) -> float:
    """Layer-by-layer offload perplexity — the reference's model_eval
    (reference: dgq/utils/evalutils.py:10-74): all eval windows' activations
    stay on device while exactly one layer's weights are resident, so a
    single chip evaluates models larger than HBM.  Params may have numpy
    (host) leaves.
    """
    from dgq_tpu.models.llama import QuantState
    from dgq_tpu.quant.arch import get_adapter

    adapter = get_adapter(arch, cfg)
    qs = qs or QuantState()
    tokens = np.asarray(token_stream).reshape(-1)
    nsamples = len(tokens) // seqlen
    if max_samples is not None:
        nsamples = min(nsamples, max_samples)
    ids = jnp.asarray(
        tokens[: nsamples * seqlen].reshape(nsamples, seqlen), jnp.int32
    )

    def to_dev(tree):
        return jax.tree_util.tree_map(jnp.asarray, tree)

    # embedding pass (embed weights resident only here)
    embed_params = {k: to_dev(v) for k, v in params.items() if k != "layers"}
    inps = adapter.embed({**embed_params, "layers": []}, ids)
    head_params = embed_params  # reused for the head below
    aux = adapter.make_aux(seqlen, inps.dtype)

    block_fn = jax.jit(
        lambda layer, x, q, kv: adapter.block(layer, x, aux, q, kv),
        static_argnames=("q",),
    )

    for li, layer in enumerate(adapter.layers(params)):
        layer_dev = to_dev(layer)
        kv = None if kv_scales is None else kv_scales[li]
        outs = []
        for j in range(inps.shape[0]):
            outs.append(block_fn(layer_dev, inps[j][None], qs, kv)[0])
        inps = jnp.stack(outs)
        if verbose:
            print(f"[ppl-layerwise] layer {li} done")
        del layer_dev

    nlls = []
    head_fn = jax.jit(lambda p, x: adapter.head(p, x))
    for j in range(nsamples):
        logits = head_fn(head_params, inps[j][None])
        shift = logits[:, :-1].astype(jnp.float32)
        labels = ids[j][None, 1:]
        logp = jax.nn.log_softmax(shift, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        nlls.append(float(jnp.mean(nll)) * seqlen)
    return float(np.exp(np.sum(nlls) / (nsamples * seqlen)))


def ppl_eval_engine(
    ecfg,
    params,
    token_stream: np.ndarray,
    seqlen: int = 2048,
    *,
    mesh=None,
    max_samples: Optional[int] = None,
    verbose: bool = False,
    forward_fn=None,
    init_cache_fn=None,
) -> float:
    """Perplexity through the real-quant INT8 engine (prefill logits), the
    path the reference exercises after inference_model conversion
    (reference: entry.py:95-116).  With ``mesh`` given, runs the tensor/data
    -parallel sharded engine (BASELINE config 4: sharded ppl).

    Defaults to the LLaMA engine; pass ``forward_fn(ecfg, params, ids, cache)``
    and ``init_cache_fn(cfg, batch, max_len)`` to evaluate another engine
    family (e.g. ``opt_engine_forward``/``init_opt_kv_cache`` or the BLOOM
    pair) — the reference runs the same ppl loop over every architecture's
    inference model (reference: entry.py:95-116)."""
    from dgq_tpu.models.engine import engine_forward, init_kv_cache

    if forward_fn is None:
        forward_fn = engine_forward
    if init_cache_fn is None:
        init_cache_fn = init_kv_cache

    tokens = np.asarray(token_stream).reshape(-1)
    nsamples = len(tokens) // seqlen
    if max_samples is not None:
        nsamples = min(nsamples, max_samples)

    if mesh is not None:
        from dgq_tpu.parallel.sharded_engine import shard_kv_cache, sharded_engine_forward

    nlls = []
    for i in range(nsamples):
        batch = jnp.asarray(tokens[i * seqlen : (i + 1) * seqlen][None, :], jnp.int32)
        cache = init_cache_fn(ecfg.cfg, 1, seqlen)
        if mesh is not None:
            cache = shard_kv_cache(cache, mesh)
            logits, _ = sharded_engine_forward(ecfg, params, batch, cache, mesh)
        else:
            logits, _ = forward_fn(ecfg, params, batch, cache)
        shift = logits[:, :-1].astype(jnp.float32)
        labels = batch[:, 1:]
        logp = jax.nn.log_softmax(shift, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        nlls.append(float(jnp.mean(nll)) * seqlen)
        if verbose:
            print(f"[ppl-engine] window {i+1}/{nsamples}: "
                  f"{np.exp(np.sum(nlls)/((i+1)*seqlen)):.4f}")
    return float(np.exp(np.sum(nlls) / (nsamples * seqlen)))
