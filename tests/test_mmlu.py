"""MMLU accuracy harness (reference: evalutils.py:85-122)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from dgq_tpu.models.llama import init_llama_params, llama_apply, tiny_llama_config
from dgq_tpu.utils.evalutils import mmlu_accuracy


def test_mmlu_accuracy_perfect_oracle():
    """An oracle logits_fn that always puts mass on the right answer token
    must score 1.0; a wrong-answer oracle scores 0.0."""
    abcd = [11, 22, 33, 44]
    examples = [
        {"input_ids": np.asarray([1, 2, 3]), "answer_pos": 3, "label": i % 4,
         "subject": "algebra" if i < 2 else "logic"}
        for i in range(4)
    ]

    class Oracle:
        def __init__(self, right):
            self.right = right
            self.i = 0

        def __call__(self, _state, batch):
            ex = examples[self.i]
            self.i += 1
            tgt = abcd[ex["label"]] if self.right else abcd[(ex["label"] + 1) % 4]
            return jnp.zeros((1, batch.shape[1], 64)).at[0, ex["answer_pos"] - 1, tgt].set(10.0)

    res = mmlu_accuracy(Oracle(True), None, examples, abcd)
    assert res["accuracy"] == 1.0
    assert res["accuracy_algebra"] == 1.0 and res["accuracy_logic"] == 1.0
    res = mmlu_accuracy(Oracle(False), None, examples, abcd)
    assert res["accuracy"] == 0.0


def test_mmlu_with_real_model_runs():
    cfg = tiny_llama_config(hidden_size=64, intermediate_size=128, num_hidden_layers=1)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    abcd = [5, 6, 7, 8]
    rng = np.random.default_rng(0)
    examples = [
        {"input_ids": rng.integers(0, cfg.vocab_size, size=9).astype(np.int32),
         "answer_pos": 9, "label": int(rng.integers(0, 4)), "subject": "synthetic"}
        for _ in range(3)
    ]
    res = mmlu_accuracy(
        lambda st, batch: llama_apply(st, batch, cfg), params, examples, abcd
    )
    assert 0.0 <= res["accuracy"] <= 1.0


def test_prepare_mmlu_jsonl(tmp_path):
    from unittest import mock

    from dgq_tpu.utils import datautils

    rows = [
        {"subject": "algebra", "input": "Q: 1+1?\nA. 1\nB. 2\nC. 3\nD. 4\nAnswer:", "output": "B"},
        {"subject": "logic", "input": "Q: t?\nA. x\nB. y\nC. z\nD. w\nAnswer:", "output": "D"},
    ]
    p = tmp_path / "mmlu.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))

    class FakeTok:
        def __call__(self, text, add_special_tokens=True):
            class R:
                input_ids = [ord(c) % 97 for c in text[:7]]
            return R()

    with mock.patch.object(datautils, "_tokenizer", lambda _m: FakeTok()):
        examples, abcd = datautils.prepare_mmlu("dummy", str(p))
    assert len(examples) == 2 and len(abcd) == 4
    assert examples[0]["label"] == 1 and examples[1]["label"] == 3
    assert examples[0]["subject"] == "algebra"


def test_prepare_mmlu_vendored_sample():
    from unittest import mock

    from dgq_tpu.utils import datautils

    class FakeTok:
        def __call__(self, text, add_special_tokens=True):
            class R:
                input_ids = [ord(c) % 97 for c in text[:7]]
            return R()

    with mock.patch.object(datautils, "_tokenizer", lambda _m: FakeTok()):
        examples, abcd = datautils.prepare_mmlu("dummy", "sample")
    assert len(examples) == 12
    assert len(abcd) == 4
    assert {e["label"] for e in examples} == {0, 1, 2, 3}


def test_prepare_mmlu_vendored_val_split():
    """The full vendored MMLU zero-shot validation split (public benchmark
    data, Hendrycks et al.; the split the reference evaluates) loads: 1531
    questions across all 57 subjects, labels covering A-D."""
    from unittest import mock

    from dgq_tpu.utils import datautils

    class FakeTok:
        def __call__(self, text, add_special_tokens=True):
            class R:
                input_ids = [ord(c) % 97 for c in text[:7]]
            return R()

    with mock.patch.object(datautils, "_tokenizer", lambda _m: FakeTok()):
        examples, abcd = datautils.prepare_mmlu("dummy", "val")
    assert len(examples) == 1531
    assert len({e["subject"] for e in examples}) == 57
    assert {e["label"] for e in examples} == {0, 1, 2, 3}
    assert len(abcd) == 4
