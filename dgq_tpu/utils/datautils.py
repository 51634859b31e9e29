"""Calibration and evaluation data loaders.

Mirrors the reference's get_loaders/prepare_mmlu
(reference: dgq/utils/datautils.py:195-205, 260-304): wikitext2/ptb/c4
calibration samples are nsamples random seqlen-token windows of the train
split; eval is the tokenized test split.  The reference hardcodes local disk
paths (datautils.py:30-31, 55-56 — documented quirk); here loaders resolve,
in order: an explicit ``data_path``, the HF datasets cache (offline mode),
and — for tests/airgapped runs — a deterministic synthetic token stream
("synthetic" dataset name).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

IGNORE_INDEX = -100


def _tokenizer(model_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_path, use_fast=True)


def synthetic_stream(vocab_size: int, n_tokens: int, seed: int = 0) -> np.ndarray:
    """Deterministic Zipf-ish token stream for offline testing."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()
    return rng.choice(vocab_size, size=n_tokens, p=probs).astype(np.int32)


def _load_text_dataset(name: str, split: str, data_path: Optional[str]):
    """Returns a list of text rows. Raises on failure (no network).

    ``ptb_new``/``c4_new`` (the GPTQ-literature "new" eval split
    convention, reference: datautils.py:129-193) load the same corpora as
    their plain siblings — only the split/joining/windowing differ (see
    get_eval_stream)."""
    from datasets import load_dataset, load_from_disk

    base = {"ptb_new": "ptb", "c4_new": "c4"}.get(name, name)
    if data_path is not None:
        ds = load_from_disk(os.path.join(data_path, f"{base}-{split}"))
        return ds
    if base == "wikitext2":
        return load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    if base == "ptb":
        return load_dataset("ptb_text_only", "penn_treebank", split=split)
    if base == "c4":
        files = {"train": "en/c4-train.00000-of-01024.json.gz",
                 "validation": "en/c4-validation.00000-of-00008.json.gz"}
        return load_dataset("allenai/c4", data_files={split: files[split]}, split=split)
    raise ValueError(name)


def _join_text(ds, name: str) -> str:
    """Reference joining conventions: wikitext2/c4 "\\n\\n"; ptb "\\n\\n"
    over sentences (datautils.py:63); ptb_new " " (datautils.py:139)."""
    key = "sentence" if name in ("ptb", "ptb_new") else "text"
    if name == "ptb_new":
        return " ".join(r[key] for r in ds)
    return "\n\n".join(r[key] for r in ds)


def _c4_row_windows(ds, tok, n: int, seqlen: int, seed: int) -> np.ndarray:
    """n random seqlen-token windows, one per (long-enough) random row —
    the reference's per-row C4 sampling incl. its python-``random`` call
    order (datautils.py:90-101 calib, 108-117 eval), so the windows are
    the ones published numbers were computed on."""
    import random as _random

    rng = _random.Random()
    rng.seed(seed)
    out = []
    for _ in range(n):
        while True:
            i = rng.randint(0, len(ds) - 1)
            ids = tok(ds[i]["text"], return_tensors="np").input_ids[0]
            if ids.shape[0] > seqlen:
                break
        i = rng.randint(0, ids.shape[0] - seqlen - 1)
        out.append(ids[i : i + seqlen].astype(np.int32))
    return np.stack(out)


def get_calib_samples(
    name: str,
    nsamples: int,
    *,
    seed: int = 0,
    seqlen: int = 2048,
    model_path: Optional[str] = None,
    vocab_size: int = 32000,
    data_path: Optional[str] = None,
) -> np.ndarray:
    """(nsamples, seqlen) int32 calibration windows.

    reference: datautils.py:26-51 — random windows of the tokenized train
    split, sampled with a fixed seed.
    """
    if name == "synthetic":
        stream = synthetic_stream(vocab_size, max(nsamples * seqlen * 2, seqlen + 1), seed)
    elif name in ("c4", "c4_new"):
        # reference samples C4 calibration windows per ROW, not from the
        # joined corpus (datautils.py:90-101 — identical for _new)
        ds = _load_text_dataset(name, "train", data_path)
        return _c4_row_windows(ds, _tokenizer(model_path), nsamples, seqlen, seed)
    else:
        ds = _load_text_dataset(name, "train", data_path)
        text = _join_text(ds, name)
        tok = _tokenizer(model_path)
        stream = np.asarray(tok(text, return_tensors="np").input_ids[0], dtype=np.int32)
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(nsamples):
        i = rng.integers(0, len(stream) - seqlen - 1)
        samples.append(stream[i : i + seqlen])
    return np.stack(samples)


def get_eval_stream(
    name: str,
    *,
    seqlen: int = 2048,
    model_path: Optional[str] = None,
    vocab_size: int = 32000,
    n_tokens: int = 1 << 17,
    data_path: Optional[str] = None,
    seed: int = 1234,
) -> np.ndarray:
    """Flat token stream of the eval split for perplexity eval.

    Split/windowing conventions match the reference exactly, so ppl is
    comparable to published numbers on either convention:
      * wikitext2: test split, "\\n\\n" join (datautils.py:32)
      * ptb:       VALIDATION split, "\\n\\n" join (datautils.py:56,64)
      * ptb_new:   test split, " " join (datautils.py:132,140)
      * c4:        256 random seqlen windows of validation rows, seed 0,
                   concatenated (datautils.py:107-117)
      * c4_new:    first 1100 validation rows " "-joined, truncated to
                   256*seqlen tokens (datautils.py:183-184)
    """
    if name == "synthetic":
        return synthetic_stream(vocab_size, n_tokens, seed)
    tok = _tokenizer(model_path)
    if name == "c4":
        ds = _load_text_dataset(name, "validation", data_path)
        return _c4_row_windows(ds, tok, 256, seqlen, seed=0).reshape(-1)
    if name == "c4_new":
        ds = _load_text_dataset(name, "validation", data_path)
        rows = [ds[i]["text"] for i in range(min(1100, len(ds)))]
        ids = tok(" ".join(rows), return_tensors="np").input_ids[0]
        return np.asarray(ids[: 256 * seqlen], dtype=np.int32)
    split = "validation" if name == "ptb" else "test"
    ds = _load_text_dataset(name, split, data_path)
    text = _join_text(ds, name)
    return np.asarray(tok(text, return_tensors="np").input_ids[0], dtype=np.int32)


def get_loaders(
    name: str,
    nsamples: int = 32,
    *,
    seed: int = 0,
    seqlen: int = 2048,
    model_path: Optional[str] = None,
    vocab_size: int = 32000,
    data_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(calib_samples (n, S), eval_stream (T,)) — the reference's
    get_loaders contract (datautils.py:195-205)."""
    calib = get_calib_samples(
        name, nsamples, seed=seed, seqlen=seqlen, model_path=model_path,
        vocab_size=vocab_size, data_path=data_path,
    )
    eval_stream = get_eval_stream(
        name, seqlen=seqlen, model_path=model_path, vocab_size=vocab_size,
        data_path=data_path,
    )
    return calib, eval_stream


def prepare_mmlu(
    model_path: str,
    mmlu_path: str,
    *,
    max_examples: Optional[int] = None,
) -> Tuple[List[dict], List[int]]:
    """Load an MMLU jsonl ({subject, input, output}) into eval examples.

    reference: datautils.py:260-304.  Returns (examples, abcd_token_ids);
    each example carries input_ids, answer_pos (position where the answer
    token would go — the logit is read at answer_pos - 1), label 0..3,
    subject.

    ``mmlu_path="sample"`` loads the small vendored sample
    (dgq_tpu/data/mmlu_sample.jsonl) — enough to exercise the full eval
    path quickly.  ``mmlu_path="val"`` loads the full vendored MMLU
    zero-shot validation split (dgq_tpu/data/mmlu_val.jsonl, 1531
    questions / 57 subjects) — this is the public MMLU benchmark data
    (Hendrycks et al., arXiv 2009.03300), the same split the reference
    evaluates (reference: data/mmlu/zero_shot_mmlu_val.json); shared
    benchmark data is identical by necessity, like the calibration
    constants.
    """
    if mmlu_path in ("sample", "val"):
        mmlu_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data", f"mmlu_{'sample' if mmlu_path == 'sample' else 'val'}.jsonl",
        )
    tok = _tokenizer(model_path)
    abcd = [tok(f" {c}", add_special_tokens=False).input_ids[-1] for c in "ABCD"]
    letters = {"A": 0, "B": 1, "C": 2, "D": 3}
    examples = []
    with open(mmlu_path) as f:
        for line in f:
            row = json.loads(line)
            ids = tok(row["input"]).input_ids
            examples.append(
                {
                    "input_ids": np.asarray(ids, dtype=np.int32),
                    "answer_pos": len(ids),
                    "label": letters[row["output"].strip()],
                    "subject": row["subject"],
                }
            )
            if max_examples is not None and len(examples) >= max_examples:
                break
    return examples, abcd
