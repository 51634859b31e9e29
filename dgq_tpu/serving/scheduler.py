"""Continuous batching scheduler.

New TPU-first capability with no reference counterpart (SURVEY §2.3;
BASELINE config 4).  A fixed pool of B cache slots; incoming requests are
prefillled into free slots as they arrive, one batched decode step advances
every active slot, finished sequences free their slots immediately — no
head-of-line blocking on the longest sequence in a batch.

Pure host-side control loop around two jitted device programs
(engine_prefill_slot / engine_decode_batched); all device shapes static.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Deque, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.engine import EngineConfig, EngineParams
from dgq_tpu.serving.batch_engine import (
    BatchedKVCache,
    engine_decode_batched,
    engine_prefill_slot,
    init_batched_cache,
)


@dataclasses.dataclass
class Request:
    uid: int
    prompt_ids: np.ndarray  # (S,)
    max_new_tokens: int
    eos_token_id: Optional[int] = None
    sampling: Optional[object] = None  # SamplingParams; None => greedy
    # filled in by the scheduler:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


class ContinuousBatcher:
    def __init__(
        self,
        ecfg: EngineConfig,
        params: EngineParams,
        *,
        num_slots: int = 8,
        max_len: int = 2048,
        prefill_pad: int = 128,
    ):
        self.ecfg = ecfg
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.prefill_pad = prefill_pad
        self.cache = init_batched_cache(ecfg.cfg, num_slots, max_len)
        self.queue: Deque[Request] = deque()
        self.slots: List[Optional[Request]] = [None] * num_slots
        self.next_tokens = np.zeros((num_slots,), np.int32)
        self.finished: List[Request] = []
        self._seed = 0

    # -- public API ---------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, *, use_kernel: Optional[bool] = None, **kw):
        """Serving startup straight from a ``save_engine`` checkpoint —
        skips the PTQ-result -> engine conversion entirely."""
        import jax as _jax

        from dgq_tpu.models.llama import LlamaConfig
        from dgq_tpu.utils.checkpoint import load_engine

        eng, cfg = load_engine(path)
        if not isinstance(cfg, LlamaConfig):
            raise ValueError(
                f"ContinuousBatcher serves the LLaMA engine; checkpoint is {type(cfg).__name__}"
            )
        if use_kernel is None:
            use_kernel = _jax.default_backend() not in ("cpu",)
        return cls(EngineConfig(cfg=cfg, use_kernel=use_kernel), eng, **kw)

    def add_request(self, req: Request):
        self.queue.append(req)

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slots)

    def step(self):
        """Admit queued requests into free slots (prefill), then one batched
        decode step for all active slots."""
        self._admit()
        if any(r is not None for r in self.slots):
            self._decode_step()

    def run(self) -> List[Request]:
        while self.has_work:
            self.step()
        return self.finished

    # -- internals ----------------------------------------------------------

    def _pad_prompt(self, ids: np.ndarray) -> np.ndarray:
        pad = -(-len(ids) // self.prefill_pad) * self.prefill_pad
        out = np.zeros((pad,), np.int32)
        out[: len(ids)] = ids
        return out

    def _admit(self):
        for slot in range(self.num_slots):
            if self.slots[slot] is not None or not self.queue:
                continue
            req = self.queue.popleft()
            padded = self._pad_prompt(np.asarray(req.prompt_ids, np.int32))
            logits, self.cache = engine_prefill_slot(
                self.ecfg,
                self.params,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(padded),
                jnp.asarray(len(req.prompt_ids), jnp.int32),
                self.cache,
            )
            tok = self._pick_token(req, logits[None, :])
            req.output_ids.append(tok)
            self.slots[slot] = req
            self.next_tokens[slot] = tok
            self._maybe_finish(slot)

    def _decode_step(self):
        active = np.asarray([r is not None for r in self.slots])
        logits, self.cache = engine_decode_batched(
            self.ecfg,
            self.params,
            jnp.asarray(self.next_tokens),
            self.cache,
            jnp.asarray(active),
        )
        greedy_toks = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            if req.sampling is None or req.sampling.greedy:
                tok = int(greedy_toks[slot])
            else:
                tok = self._pick_token(req, logits[slot][None, :])
            req.output_ids.append(tok)
            self.next_tokens[slot] = tok
            self._maybe_finish(slot)

    def _pick_token(self, req, logits_row) -> int:
        """Per-request sampling (greedy when unspecified)."""
        from dgq_tpu.serving.sampling import SamplingParams, sample_logits

        sp = req.sampling or SamplingParams()
        if sp.greedy:
            return int(jnp.argmax(logits_row))
        if not hasattr(self, "_key"):
            self._key = jax.random.PRNGKey(self._seed)
        self._key, sub = jax.random.split(self._key)
        return int(sample_logits(jnp.asarray(logits_row), sp, sub)[0])

    def _maybe_finish(self, slot: int):
        req = self.slots[slot]
        if req is None:
            return
        hit_eos = req.eos_token_id is not None and req.output_ids[-1] == req.eos_token_id
        hit_max = len(req.output_ids) >= req.max_new_tokens
        hit_cap = int(self.cache.lengths[slot]) + 1 >= self.max_len
        if hit_eos or hit_max or hit_cap:
            req.done = True
            self.finished.append(req)
            self.slots[slot] = None  # slot freed; next admit overwrites it
