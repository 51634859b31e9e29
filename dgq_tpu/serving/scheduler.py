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
import time
from collections import deque
from typing import Deque, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgq_tpu.models.engine import EngineConfig, EngineParams
from dgq_tpu.serving.batch_engine import (
    BatchedKVCache,
    copy_prefix_into_slot,
    engine_decode_batched,
    engine_decode_multi,
    engine_prefill_batched,
    engine_prefill_chunk,
    engine_prefill_slot,
    engine_spec_decode_multi,
    engine_verify_batched,
    init_batched_cache,
)


@dataclasses.dataclass
class Request:
    uid: int
    prompt_ids: np.ndarray  # (S,)
    max_new_tokens: int
    eos_token_id: Optional[int] = None
    sampling: Optional[object] = None  # SamplingParams; None => greedy
    # multi-token stop sequences: generation finishes when the output ends
    # with any of them (the sequence itself stays in the output)
    stop_sequences: Optional[List[List[int]]] = None
    # filled in by the scheduler:
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    cancelled: bool = False
    # latency stamps (seconds, time.time()): submission, first emitted
    # token, completion — basis for TTFT / e2e observability
    t_submit: Optional[float] = None
    t_first: Optional[float] = None
    t_done: Optional[float] = None


def _hit_stop(req: Request) -> bool:
    """EOS token or any multi-token stop sequence at the output tail."""
    if not req.output_ids:
        return False
    if req.eos_token_id is not None and req.output_ids[-1] == req.eos_token_id:
        return True
    for seq in req.stop_sequences or ():
        n = len(seq)
        if n and len(req.output_ids) >= n and req.output_ids[-n:] == list(seq):
            return True
    return False


class ContinuousBatcher:
    def __init__(
        self,
        ecfg: EngineConfig,
        params: EngineParams,
        *,
        num_slots: int = 8,
        max_len: int = 2048,
        prefill_pad: int = 128,
        prefill_chunk: int = 0,
        admit_batch: int = 1,
        decode_steps: int = 1,
        spec_k: int = 0,
        spec_max_ngram: int = 3,
        spec_adaptive: bool = True,
        spec_cost_ratio: float = 1.35,
        spec_probe_every: int = 256,
        max_recoveries: int = 3,
        mesh=None,
        fns=None,
    ):
        """``prefill_chunk`` > 0 prefills prompts longer than the chunk in
        chunk-sized pieces, one chunk per scheduler step, so a long prompt
        no longer stalls decode of the other active slots (head-of-line
        latency is bounded by one chunk).  ``admit_batch`` > 1 admits up to
        that many short queued prompts in ONE batched prefill call.
        ``decode_steps`` > 1 runs up to that many greedy decode steps per
        dispatch in one on-device scan (engine_decode_multi) whenever
        nothing is mid-prefill and every active request is greedy; queue
        pressure, max_new headroom and cache capacity CLAMP the window
        rather than disable it (_multi_window_steps), EOS overshoot tokens
        are discarded host-side, and windows that provably cannot finish
        any request are left in flight so the next window is dispatched
        before this one is synced (device never idles across windows).
        ``spec_k`` > 0 turns on prompt-lookup speculative decoding: each
        decode step feeds [pending token, K drafts] per slot through ONE
        batched verification forward (engine_verify_batched) and every
        accepted draft token is a free extra token (decode is
        weight-feed-bound, so K+1 tokens cost ~1 token's step); engaged
        whenever every active request is greedy and has spec headroom,
        otherwise the step falls back to plain decode.
        ``mesh`` (a ``make_mesh(dp=1, tp=N)`` mesh) serves tensor-sharded:
        params are placed with TP shardings, the KV cache shards over kv
        heads, and every device call runs under shard_map
        (parallel/sharded_serving.py) — the scheduler logic is unchanged
        (BASELINE config 4)."""
        self.ecfg = ecfg
        self._mesh = mesh
        if mesh is not None and fns is not None:
            raise ValueError("mesh and fns are mutually exclusive")
        if mesh is not None:
            from dgq_tpu.parallel.sharded_engine import shard_engine_params
            from dgq_tpu.parallel.sharded_serving import serving_fns

            params = shard_engine_params(params, mesh)
            self._f = serving_fns(mesh)
        else:
            # ``fns`` makes the scheduler family-generic: all model
            # specifics live in the device-fn namespace (e.g.
            # serving/opt_batch_engine.opt_serving_fns)
            self._f = fns
        self.params = params
        self.num_slots = num_slots
        self.max_len = max_len
        self.prefill_pad = prefill_pad
        self.prefill_chunk = prefill_chunk
        self.admit_batch = max(1, admit_batch)
        self.decode_steps = max(1, decode_steps)
        self.spec_k = max(0, spec_k)
        self.spec_max_ngram = spec_max_ngram
        self.spec_stats = {"steps": 0, "tokens": 0}
        # adaptive speculation (VERDICT r3 #3): a verify step costs
        # ~spec_cost_ratio plain decode steps device-side, so speculation
        # only pays while the measured accepted-tokens-per-step EWMA
        # exceeds that ratio.  When it drops below, speculation SUSPENDS
        # for spec_probe_every scheduler steps, then re-probes (text
        # regimes change within a stream).  Decided by measurement, pinned
        # by tests/test_serving_spec.py::test_spec_adaptive_*.
        self.spec_adaptive = spec_adaptive
        self.spec_cost_ratio = spec_cost_ratio
        self.spec_probe_every = max(1, spec_probe_every)
        self._spec_ewma: Optional[float] = None
        self._spec_ewma_n = 0
        self._spec_suspended = 0  # steps remaining in suspension
        self._spec_suspensions = 0  # cumulative count (metrics: suspension ever engaged)
        self.max_recoveries = max_recoveries
        self._recoveries = 0
        self.cache = self._fn("init_batched_cache")(ecfg.cfg, num_slots, max_len, kv_bits=ecfg.kv_bits)
        self.queue: Deque[Request] = deque()
        self.slots: List[Optional[Request]] = [None] * num_slots
        # slot -> in-progress chunked prefill: {"padded", "pos", "n"}
        self.pending: dict = {}
        self.next_tokens = np.zeros((num_slots,), np.int32)
        # host-side mirror of cache.lengths (VERDICT r2 #2): every scheduler
        # decision and per-token finish check reads THIS, never the device
        # array — int(cache.lengths[slot]) is a dispatch+fetch round trip
        # (~6-25 ms through the axon tunnel), and the r2 driver capture paid
        # it once per emitted token (~30 s of a 36 s serving bench).  The
        # host knows every length transition exactly (prefill sets, decode
        # advances actives by 1, windows by n, spec by the returned counts).
        self.lengths_h = np.zeros((num_slots,), np.int32)
        # decode-dispatch pipelining: the last multi-step window's device
        # token buffer, left un-fetched so the NEXT window is dispatched
        # before the host syncs this one (the device never idles across
        # windows in steady state)
        self._inflight = None  # (toks_dev (n,B), snapshot: List[Request|None], n)
        # device-resident next-token vector: chains window N's output
        # directly into window N+1's input with no host round trip
        self._next_dev = None
        self._next_dev_ok = False
        # per-dispatch-kind instrumentation: kind -> [count, total_s]
        self.timings: dict = {}
        self.finished: List[Request] = []
        # cumulative counters for metrics(): `finished` may be drained by a
        # consumer (serving/server.py), so never derive totals from it
        self._finished_count = 0
        self._finished_tokens = 0
        self._prefix = None  # set by register_prefix
        self.prefix_hits = 0
        self._lat: Deque = deque(maxlen=512)  # (ttft_s, e2e_s) samples
        self._t0 = time.time()
        self._seed = 0

    def _t(self, kind: str, t0: float) -> None:
        """Accumulate wall time for one dispatch/sync of the given kind
        (metrics()['dispatch_timings'] — VERDICT r2 #2 instrumentation)."""
        c = self.timings.setdefault(kind, [0, 0.0])
        c[0] += 1
        c[1] += time.time() - t0

    def _fn(self, name: str):
        """Device entry point by name: the shard_map-wrapped variant when
        serving tensor-sharded, else this module's global (late-bound, so
        tests can monkeypatch e.g. engine_decode_batched)."""
        if self._f is not None:
            return getattr(self._f, name)
        return globals()[name]

    # -- public API ---------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, *, use_kernel: Optional[bool] = None,
                        kv_bits: int = 8, **kw):
        """Serving startup straight from a ``save_engine`` checkpoint —
        skips the PTQ-result -> engine conversion entirely.  ``kv_bits=4``
        serves on the packed INT4 KV cache (half the cache memory)."""
        import jax as _jax

        from dgq_tpu.models.llama import LlamaConfig
        from dgq_tpu.utils.checkpoint import load_engine_any

        eng, cfg = load_engine_any(path, mesh=kw.get("mesh"))
        if not isinstance(cfg, LlamaConfig):
            raise ValueError(
                f"ContinuousBatcher serves the LLaMA engine; checkpoint is {type(cfg).__name__}"
            )
        if use_kernel is None:
            use_kernel = _jax.default_backend() not in ("cpu",)
        return cls(EngineConfig(cfg=cfg, use_kernel=use_kernel, kv_bits=kv_bits),
                   eng, **kw)

    def add_request(self, req: Request):
        # validate up front: a deterministically-unservable request must be
        # rejected here, not crash the step loop (where it would be treated
        # as a transient device failure and retried into a death spiral)
        n = len(req.prompt_ids)
        if n == 0:
            raise ValueError("empty prompt")
        padded = -(-n // self.prefill_pad) * self.prefill_pad
        if padded > self.max_len or n + 1 > self.max_len:
            raise ValueError(
                f"prompt of {n} tokens (padded {padded}) does not fit "
                f"max_len={self.max_len} (prefill_pad={self.prefill_pad})"
            )
        if req.max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        if req.t_submit is None:
            import time as _time

            req.t_submit = _time.time()
        self.queue.append(req)

    @property
    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slots)

    def _finish_req(self, req: Request):
        """Single point for completion bookkeeping: done flag, latency
        stamps, finished list, cumulative counters, latency samples."""
        import time as _time

        now = _time.time()
        req.done = True
        if req.t_first is None and req.output_ids:
            req.t_first = now
        if req.t_done is None:
            req.t_done = now
        self.finished.append(req)
        self._finished_count += 1
        self._finished_tokens += len(req.output_ids)
        if req.t_submit is not None:
            self._lat.append((
                (req.t_first - req.t_submit) if req.t_first else None,
                req.t_done - req.t_submit,
            ))

    def register_prefix(self, prefix_ids) -> None:
        """Prefix caching: prefill ``prefix_ids`` ONCE into a template KV;
        every admitted request whose prompt starts with it skips straight
        to prefilling the remainder (the shared-system-prompt
        optimization — no reference counterpart).  Requests equal to or
        shorter than the prefix take the normal path.

        May be called multiple times (several system prompts / few-shot
        preambles); admission picks the LONGEST matching prefix."""
        ids = np.asarray(prefix_ids, np.int32)
        if len(ids) == 0:
            raise ValueError("empty prefix")
        padded_len = -(-len(ids) // self.prefill_pad) * self.prefill_pad
        if len(ids) + 1 >= self.max_len or padded_len > self.max_len:
            raise ValueError(f"prefix of {len(ids)} tokens (padded "
                             f"{padded_len}) leaves no room in "
                             f"max_len={self.max_len}")
        tmp = self._fn("init_batched_cache")(self.ecfg.cfg, 1, self.max_len, kv_bits=self.ecfg.kv_bits)
        _, tmp = self._fn("engine_prefill_slot")(
            self.ecfg, self.params, jnp.asarray(0, jnp.int32),
            jnp.asarray(self._pad_prompt(ids)), jnp.asarray(len(ids), jnp.int32),
            tmp,
        )
        if self._prefix is None:
            self._prefix = []
        self._prefix.append({"ids": ids, "k": tmp.k, "v": tmp.v, "len": len(ids)})
        # longest first so admission's first match is the best match
        self._prefix.sort(key=lambda d: -d["len"])

    def _match_prefix(self, p: np.ndarray):
        for pre in self._prefix or ():
            n = pre["len"]
            if len(p) > n and np.array_equal(p[:n], pre["ids"]):
                return pre
        return None

    def _try_prefix_admit(self, slot: int, req: Request) -> bool:
        """Admit via the longest matching prefix template.  Transactional
        like _prefill_group: a device failure requeues the request before
        re-raising, so _recover sees a consistent picture."""
        if self._prefix is None:
            return False
        p = np.asarray(req.prompt_ids, np.int32)
        pre = self._match_prefix(p)
        if pre is None:
            return False
        n = pre["len"]
        rem = p[n:]
        padded = self._pad_prompt(rem)
        if n + len(padded) > self.max_len:
            return False  # remainder padding would overrun; normal path
        try:
            self.cache = self._fn("copy_prefix_into_slot")(
                self.cache, jnp.asarray(slot, jnp.int32), pre["k"], pre["v"],
                jnp.asarray(n, jnp.int32),
            )
            if self.prefill_chunk and len(padded) > self.prefill_chunk:
                # long remainder: template installed, the rest goes through
                # the chunk machinery (positions are absolute over the full
                # prompt, so pending starts at the prefix length) — keeps
                # the head-of-line latency bound prefill_chunk provides
                c = self.prefill_chunk
                true_len = len(p)
                padded_c = np.zeros((-(-true_len // c) * c,), np.int32)
                padded_c[:true_len] = p
                self.slots[slot] = req
                self.pending[slot] = {"padded": padded_c, "pos": n}
                self.lengths_h[slot] = n  # copy_prefix_into_slot set it
                self.prefix_hits += 1
                return True
            logits, self.cache = self._fn("engine_prefill_chunk")(
                self.ecfg, self.params, jnp.asarray(slot, jnp.int32),
                jnp.asarray(padded), jnp.asarray(n, jnp.int32),
                jnp.asarray(len(rem), jnp.int32), self.cache,
            )
            tok = self._pick_token(req, logits[None, :])
        except Exception:
            self.slots[slot] = None
            self.pending.pop(slot, None)
            self.queue.appendleft(req)
            raise
        req.output_ids.append(tok)
        self.slots[slot] = req
        self.next_tokens[slot] = tok
        self._next_dev_ok = False
        self.lengths_h[slot] = n + len(rem)
        self.prefix_hits += 1
        self._maybe_finish(slot)
        return True

    def cancel(self, uid: int) -> bool:
        """Cancel a request by uid, wherever it is: still queued, mid
        chunked-prefill, or actively decoding.  The request is finished
        immediately with ``cancelled=True`` and whatever tokens it has
        produced so far; its slot (if any) frees for the next admit.
        Returns False when the uid is unknown or already finished."""
        for i, r in enumerate(self.queue):
            if r.uid == uid:
                del self.queue[i]
                return self._finish_cancelled(r)
        for s, r in enumerate(self.slots):
            if r is not None and r.uid == uid:
                self.slots[s] = None  # freed; next admit re-prefills from 0
                self.pending.pop(s, None)
                return self._finish_cancelled(r)
        return False

    def _finish_cancelled(self, req: Request) -> bool:
        req.cancelled = True
        self._finish_req(req)
        return True

    def metrics(self) -> dict:
        """Structured serving metrics (SURVEY §5: "structured logging +
        metrics from day 1" — the reference has print() only).  JSON-able;
        cheap to call between steps."""
        import time as _time

        now = _time.time()
        gen = self._finished_tokens + sum(
            len(r.output_ids) for r in self.slots if r is not None
        )
        occ = sum(r is not None for r in self.slots)
        out = {
            "wall_s": round(now - self._t0, 3),
            "tokens_generated": gen,
            "tokens_per_s": round(gen / max(now - self._t0, 1e-9), 2),
            "requests_finished": self._finished_count,
            "requests_queued": len(self.queue),
            "slots_active": occ,
            "slot_occupancy": round(occ / self.num_slots, 3),
            "prefills_pending": len(self.pending),
            "recoveries": self._recoveries,
        }
        if self._lat:
            e2e = sorted(s[1] for s in self._lat)
            out["e2e_ms_p50"] = round(e2e[len(e2e) // 2] * 1e3, 1)
            out["e2e_ms_p95"] = round(e2e[min(len(e2e) - 1, int(len(e2e) * 0.95))] * 1e3, 1)
            ttft = sorted(s[0] for s in self._lat if s[0] is not None)
            if ttft:
                out["ttft_ms_p50"] = round(ttft[len(ttft) // 2] * 1e3, 1)
                out["ttft_ms_p95"] = round(
                    ttft[min(len(ttft) - 1, int(len(ttft) * 0.95))] * 1e3, 1)
        if self.spec_k > 0:
            st = self.spec_stats
            out["spec_steps"] = st["steps"]
            out["spec_tokens"] = st["tokens"]
            out["spec_tokens_per_step"] = round(
                st["tokens"] / max(st["steps"], 1), 3
            )
            if self.spec_adaptive:
                out["spec_suspended_steps"] = self._spec_suspended
                out["spec_suspensions"] = self._spec_suspensions
                if self._spec_ewma is not None:
                    out["spec_rate_ewma"] = round(self._spec_ewma, 3)
        if self._prefix is not None:
            out["prefix_hits"] = self.prefix_hits
        if self.timings:
            # per-dispatch-kind attribution (VERDICT r2 #2): dispatch:* is
            # host->device call time (async — enqueue cost), sync:* is the
            # host blocking on device results
            out["dispatch_timings"] = {
                k: {"count": c, "total_s": round(s, 4),
                    "avg_ms": round(s / max(c, 1) * 1e3, 3)}
                for k, (c, s) in sorted(self.timings.items())
            }
        return out

    def step(self):
        """Admit queued requests into free slots (prefill), advance at most
        one in-progress chunked prefill by one chunk, then one batched
        decode step for all fully-prefilled active slots.

        Device failures (backend resets, preemptions — e.g. TPU
        FAILED_PRECONDITION) are caught and recovered: the cache is
        rebuilt and every live slot re-prefilled from its request's full
        token history (prompt + generated so far), then the step retries.
        Bounded by ``max_recoveries``; the reference has no serving layer
        to compare (SURVEY §2.3: serving is a new TPU-first capability)."""
        try:
            self._step_inner()
        except Exception:  # noqa: BLE001 — backend errors are not typed
            self._recoveries += 1
            if self._recoveries > self.max_recoveries:
                raise
            self._recover()
            self._step_inner()

    def _step_inner(self):
        if self._inflight is not None:
            fl, self._inflight = self._inflight, None
            self._process_window(*fl)
        self._admit()
        self._advance_pending()
        if any(
            r is not None and s not in self.pending
            for s, r in enumerate(self.slots)
        ):
            spec_ok = self.spec_k > 0 and self._spec_paying()
            if spec_ok and self._can_decode_spec_multi():
                self._decode_spec_multi()
            elif spec_ok and self._can_decode_spec():
                self._decode_spec()
            else:
                n = self._multi_window_steps()
                if n > 1:
                    self._decode_multi(n)
                else:
                    self._decode_step()

    def _recover(self):
        """Rebuild device state from host-side request history: fresh cache,
        re-prefill every live slot with prompt + consumed tokens.

        Cache invariant restored exactly: the cache holds the prompt plus
        every token the decode loop has CONSUMED (all generated tokens but
        the last); the last generated token is the pending next_token.
        Slots mid-chunked-prefill have no history to preserve — their
        requests go back to the queue head and restart.  An un-fetched
        in-flight window is dropped: its tokens were never emitted, and the
        rebuilt cache reflects exactly the emitted history."""
        self._inflight = None
        self._next_dev_ok = False
        self.lengths_h[:] = 0
        self.cache = self._fn("init_batched_cache")(self.ecfg.cfg, self.num_slots, self.max_len, kv_bits=self.ecfg.kv_bits)
        for slot in list(self.pending):
            req = self.slots[slot]
            self.slots[slot] = None
            self.queue.appendleft(req)
        self.pending.clear()
        for slot, req in enumerate(self.slots):
            if req is None:
                continue
            assert req.output_ids, "live non-pending slot must have a token"
            hist = np.concatenate([
                np.asarray(req.prompt_ids, np.int32),
                np.asarray(req.output_ids[:-1], np.int32),
            ])
            _, self.cache = self._fn("engine_prefill_slot")(
                self.ecfg, self.params, jnp.asarray(slot, jnp.int32),
                jnp.asarray(self._pad_prompt(hist)),
                jnp.asarray(len(hist), jnp.int32), self.cache,
            )
            self.next_tokens[slot] = req.output_ids[-1]
            self.lengths_h[slot] = len(hist)

    def _queue_blocks_multi(self) -> bool:
        """Speculative multi-step keeps the conservative gate: queued work
        forces short windows so a freed slot is admitted promptly (the plain
        decode path instead CLAMPS its window, _multi_window_steps)."""
        if not self.queue:
            return False
        if any(s is None for s in self.slots):
            return True
        return any(r.max_new_tokens - len(r.output_ids) < self.decode_steps
                   for r in self.slots if r is not None)

    def _multi_window_steps(self) -> int:
        """Largest safe multi-step window for this dispatch (<=1 means take
        the single-step path).

        Replaces the r2 all-or-nothing gate (VERDICT r2 #2: 8-slot serving
        measured SLOWER than single-stream because any constraint collapsed
        dispatch to one token per host round trip).  Policy:
          * cache capacity of the fullest active slot clamps the window
            (correctness), quantized to powers of two so the jit compile
            set stays tiny;
          * a request hitting max_new mid-window costs only overshoot —
            discarded tokens and a freed slot admitted up to
            decode_steps-1 steps late — which beats shrinking the window:
            the r3 probe measured tail-shrunk windows (n=4/2/1) paying
            cold compiles and extra round trips worth ~25% of the stream;
          * EOS/stop-capable requests under queue pressure cap the window
            at 4 steps so an early stop delays admission by at most 3
            steps (ADVICE r2) — max_new is host-known, stops are not."""
        if self.decode_steps <= 1 or self.pending:
            return 1
        active = [r for r in self.slots if r is not None]
        if any(r.sampling is not None and not r.sampling.greedy for r in active):
            return 1  # per-token host-side RNG sampling
        occupied = [s for s, r in enumerate(self.slots) if r is not None]
        n = min(self.decode_steps,
                int(self.max_len - 1 - max(self.lengths_h[s] for s in occupied)))
        if self.queue and any(r.eos_token_id is not None or r.stop_sequences
                              for r in active):
            n = min(n, 4)
        if n >= self.decode_steps:
            return self.decode_steps
        if n <= 1:
            return 1
        return 1 << (n.bit_length() - 1)

    def _can_decode_spec_multi(self) -> bool:
        """Speculation AND dispatch amortization compose: ``decode_steps``
        speculative steps in ONE device program (engine_spec_decode_multi —
        drafting runs on-device, so no host round trip per step)."""
        if (self.spec_k <= 0 or self.decode_steps <= 1 or self.pending
                or self._queue_blocks_multi()):
            return False
        active = [(s, r) for s, r in enumerate(self.slots) if r is not None]
        if not active:
            return False
        if any(r.sampling is not None and not r.sampling.greedy for _, r in active):
            return False
        worst = self.decode_steps * (self.spec_k + 1)
        lens = self.lengths_h
        for s, r in active:
            if int(lens[s]) + worst > self.max_len:
                return False
            if r.max_new_tokens - len(r.output_ids) < 2:
                return False
        return True

    def _decode_spec_multi(self):
        """decode_steps on-device speculative steps, one dispatch.  Tokens
        emitted after a slot's EOS/max are discarded host-side (the slot's
        cache advances harmlessly — slot reuse re-prefills from 0, the same
        overshoot contract as _decode_multi)."""
        k, n = self.spec_k, self.decode_steps
        B, L = self.num_slots, self.max_len
        bufs = np.zeros((B, L), np.int32)
        lens = np.zeros((B,), np.int32)
        active = np.zeros((B,), bool)
        for s, r in enumerate(self.slots):
            if r is None:
                continue
            hist = np.concatenate([np.asarray(r.prompt_ids, np.int32),
                                   np.asarray(r.output_ids, np.int32)])
            bufs[s, : len(hist)] = hist
            lens[s] = len(hist)
            active[s] = True
        tok0, step0 = self.spec_stats["tokens"], self.spec_stats["steps"]
        t0 = time.time()
        _, _, _, self.cache, outs, n_outs = self._fn("engine_spec_decode_multi")(
            self.ecfg, self.params, jnp.asarray(bufs), jnp.asarray(lens),
            jnp.asarray(self.next_tokens.copy()), self.cache, jnp.asarray(active),
            n, spec_k=k, max_ngram=self.spec_max_ngram,
        )
        self._t("dispatch:spec_multi", t0)
        self._next_dev_ok = False
        t0 = time.time()
        outs_h, n_h = jax.device_get((outs, n_outs))  # (n, B, K+1), (n, B)
        self._t("sync:spec_multi", t0)
        # mirror: the device advanced each active slot's length by the
        # consumed window prefix (1 + accepted) each step == n_out
        self.lengths_h += np.asarray(n_h, np.int32).sum(axis=0)
        for s in range(B):
            req = self.slots[s]
            if req is None:
                continue
            finished = False
            for i in range(n):
                if finished:
                    break
                self.spec_stats["steps"] += 1
                for t in outs_h[i, s, : int(n_h[i, s])]:
                    req.output_ids.append(int(t))
                    self.next_tokens[s] = int(t)
                    self.spec_stats["tokens"] += 1
                    if _hit_stop(req) or len(req.output_ids) >= req.max_new_tokens:
                        finished = True
                        break
            if finished:
                self._finish_req(req)
                self.slots[s] = None  # freed; next admit re-prefills from 0
            elif req.t_first is None and req.output_ids:
                import time as _time

                req.t_first = _time.time()
        self._spec_note(self.spec_stats["tokens"] - tok0,
                        self.spec_stats["steps"] - step0)

    def _spec_paying(self) -> bool:
        """Adaptive speculation gate: False while suspended (one suspension
        tick per scheduler step)."""
        if not self.spec_adaptive:
            return True
        if self._spec_suspended > 0:
            self._spec_suspended -= 1
            return False
        return True

    def _spec_note(self, tokens: int, steps: int):
        """Record a speculative dispatch's yield; suspend speculation when
        the accepted-tokens-per-step EWMA stops covering the verify step's
        device cost (spec_cost_ratio plain steps)."""
        if not self.spec_adaptive or steps <= 0:
            return
        rate = tokens / steps
        self._spec_ewma = (rate if self._spec_ewma is None
                           else 0.8 * self._spec_ewma + 0.2 * rate)
        self._spec_ewma_n += steps
        if self._spec_ewma_n >= 8 and self._spec_ewma < self.spec_cost_ratio:
            self._spec_suspended = self.spec_probe_every
            self._spec_suspensions += 1
            self._spec_ewma = None
            self._spec_ewma_n = 0

    def _can_decode_spec(self) -> bool:
        if self.spec_k <= 0 or self.pending:
            return False
        active = [(s, r) for s, r in enumerate(self.slots) if r is not None]
        if not active:
            return False
        if any(r.sampling is not None and not r.sampling.greedy for _, r in active):
            return False  # speculation verifies greedily; sampling slots opt the batch out
        lens = self.lengths_h
        for s, r in active:
            # the window writes K+1 K/V entries at the slot's offset — it
            # must fit, and the request must want >= 2 more tokens for
            # speculation to possibly pay
            if int(lens[s]) + self.spec_k + 1 >= self.max_len:
                return False
            if r.max_new_tokens - len(r.output_ids) < 2:
                return False
        return True

    def _decode_spec(self):
        """One speculative step for every active slot: prompt-lookup drafts
        host-side, ONE batched verification forward, per-slot acceptance.
        Every emitted token is the greedy argmax of the verification
        forward (see serving/speculative.py for the exactness contract)."""
        from dgq_tpu.serving.speculative import ngram_propose

        k = self.spec_k
        ids = np.zeros((self.num_slots, k + 1), np.int32)
        drafts = np.zeros((self.num_slots, k), np.int32)
        for s, r in enumerate(self.slots):
            if r is None:
                continue
            hist = np.concatenate([
                np.asarray(r.prompt_ids, np.int64),
                np.asarray(r.output_ids, np.int64),
            ])
            drafts[s] = ngram_propose(hist, k, max_ngram=self.spec_max_ngram)
            ids[s, 0] = self.next_tokens[s]
            ids[s, 1:] = drafts[s]

        t0 = time.time()
        logits, self.cache = self._fn("engine_verify_batched")(
            self.ecfg, self.params, jnp.asarray(ids), self.cache
        )
        self._t("dispatch:spec_verify", t0)
        self._next_dev_ok = False
        t0 = time.time()
        greedy = np.asarray(jnp.argmax(logits, axis=-1), np.int32)  # (B, K+1)
        self._t("sync:spec_verify", t0)

        new_lengths = self.lengths_h.copy()
        tok0, step0 = self.spec_stats["tokens"], self.spec_stats["steps"]
        for s in range(self.num_slots):
            req = self.slots[s]
            if req is None:
                continue
            n_acc = 0
            while n_acc < k and drafts[s, n_acc] == greedy[s, n_acc]:
                n_acc += 1
            emit = [int(t) for t in drafts[s, :n_acc]] + [int(greedy[s, n_acc])]
            self.spec_stats["steps"] += 1
            finished = False
            for tok in emit:
                req.output_ids.append(tok)
                self.next_tokens[s] = tok
                self.spec_stats["tokens"] += 1
                if _hit_stop(req) or len(req.output_ids) >= req.max_new_tokens:
                    finished = True
                    break
            if finished:
                self._finish_req(req)
                self.slots[s] = None  # freed; next admit re-prefills from 0
            else:
                if req.t_first is None and req.output_ids:
                    import time as _time

                    req.t_first = _time.time()
                # cache covers prompt + consumed tokens: the previously
                # pending token plus the accepted drafts were fed; the
                # correction is the new pending token (not yet fed)
                new_lengths[s] += 1 + n_acc
        self.lengths_h = new_lengths
        self._spec_note(self.spec_stats["tokens"] - tok0,
                        self.spec_stats["steps"] - step0)
        # the device gets its OWN buffer: jnp.asarray can zero-copy-alias an
        # aligned host array, and lengths_h is mutated in place on later
        # steps — aliasing would mutate a buffer an in-flight device program
        # still reads (observed as a run-to-run-nondeterministic cache
        # corruption on the CPU backend)
        self.cache = self.cache._replace(lengths=jnp.asarray(new_lengths.copy()))

    def run(self) -> List[Request]:
        while self.has_work:
            self.step()
        # an in-flight window can outlive has_work only when every one of
        # its requests was cancelled externally; its tokens are discarded
        self._inflight = None
        return self.finished

    # -- internals ----------------------------------------------------------

    def _pad_prompt(self, ids: np.ndarray) -> np.ndarray:
        pad = -(-len(ids) // self.prefill_pad) * self.prefill_pad
        out = np.zeros((pad,), np.int32)
        out[: len(ids)] = ids
        return out

    def _admit(self):
        free = [s for s in range(self.num_slots) if self.slots[s] is None]
        # split the admissible head of the queue into chunked (long) and
        # immediate (short) prompts
        short: List[tuple] = []  # (slot, req, padded)
        while free and self.queue:
            req = self.queue.popleft()
            slot = free.pop(0)
            if self._try_prefix_admit(slot, req):
                continue
            padded = self._pad_prompt(np.asarray(req.prompt_ids, np.int32))
            if self.prefill_chunk and len(padded) > self.prefill_chunk:
                # long prompt: prefill chunk-by-chunk across steps; re-pad
                # to a chunk multiple so every chunk holds >= 1 real token
                c = self.prefill_chunk
                true_len = len(req.prompt_ids)
                padded_c = np.zeros((-(-true_len // c) * c,), np.int32)
                padded_c[:true_len] = np.asarray(req.prompt_ids, np.int32)
                self.slots[slot] = req
                self.pending[slot] = {"padded": padded_c, "pos": 0}
                continue
            short.append((slot, req, padded))
            if len(short) >= self.admit_batch:
                self._prefill_group(short)
                short = []
        if short:
            self._prefill_group(short)

    def _prefill_group(self, group: List[tuple]):
        """Prefill 1..admit_batch prompts; a group of one keeps the original
        single-slot program, larger groups run ONE batched program.

        Transactional under device failure (errors surface lazily at the
        first host fetch): on any exception the group's requests go back to
        the queue head untouched, so _recover sees a consistent picture."""
        try:
            self._prefill_group_inner(group)
        except Exception:
            for slot, req, _ in reversed(group):
                if req.done or req.output_ids:
                    continue  # fully processed before the error surfaced
                self.slots[slot] = None
                self.queue.appendleft(req)
            raise

    def _prefill_group_inner(self, group: List[tuple]):
        t0 = time.time()
        if len(group) == 1:
            slot, req, padded = group[0]
            logits, self.cache = self._fn("engine_prefill_slot")(
                self.ecfg,
                self.params,
                jnp.asarray(slot, jnp.int32),
                jnp.asarray(padded),
                jnp.asarray(len(req.prompt_ids), jnp.int32),
                self.cache,
            )
            rows = logits[None, :]
        else:
            s_max = max(len(p) for _, _, p in group)
            ids = np.zeros((len(group), s_max), np.int32)
            for i, (_, _, p) in enumerate(group):
                ids[i, : len(p)] = p
            logits, self.cache = self._fn("engine_prefill_batched")(
                self.ecfg,
                self.params,
                jnp.asarray([s for s, _, _ in group], jnp.int32),
                jnp.asarray(ids),
                jnp.asarray([len(r.prompt_ids) for _, r, _ in group], jnp.int32),
                self.cache,
            )
            rows = logits
        self._t("dispatch:prefill", t0)
        self._next_dev_ok = False
        # all-greedy groups fetch ONE batched argmax instead of per-request
        # row round trips (each fetch is a full tunnel RTT)
        greedy_rows = None
        if all(r.sampling is None or r.sampling.greedy for _, r, _ in group):
            t0 = time.time()
            greedy_rows = np.asarray(jnp.argmax(rows, axis=-1), np.int32)
            self._t("sync:prefill", t0)
        for i, (slot, req, _) in enumerate(group):
            tok = (int(greedy_rows[i]) if greedy_rows is not None
                   else self._pick_token(req, rows[i][None, :]))
            req.output_ids.append(tok)
            self.slots[slot] = req
            self.next_tokens[slot] = tok
            self.lengths_h[slot] = len(req.prompt_ids)
            self._maybe_finish(slot)

    def _advance_pending(self):
        """Advance ONE chunked prefill by one chunk (bounds head-of-line
        latency for the decode slots at one chunk per step)."""
        if not self.pending:
            return
        slot = next(iter(self.pending))
        st = self.pending[slot]
        req = self.slots[slot]
        padded, pos = st["padded"], st["pos"]
        c = self.prefill_chunk
        chunk = np.zeros((c,), np.int32)
        end = min(pos + c, len(padded))
        chunk[: end - pos] = padded[pos:end]
        true_len = len(req.prompt_ids)
        valid = min(true_len, end) - pos
        assert valid >= 1, (pos, end, true_len)  # guaranteed by chunk re-pad
        t0 = time.time()
        logits, self.cache = self._fn("engine_prefill_chunk")(
            self.ecfg,
            self.params,
            jnp.asarray(slot, jnp.int32),
            jnp.asarray(chunk),
            jnp.asarray(pos, jnp.int32),
            jnp.asarray(valid, jnp.int32),
            self.cache,
        )
        self._t("dispatch:prefill_chunk", t0)
        st["pos"] = end
        self.lengths_h[slot] = pos + valid  # == min(true_len, end)
        if end >= len(padded):
            del self.pending[slot]
            tok = self._pick_token(req, logits[None, :])
            req.output_ids.append(tok)
            self.next_tokens[slot] = tok
            self._next_dev_ok = False
            self._maybe_finish(slot)

    def _decode_step(self):
        # pending slots are mid-prefill: they must neither advance their
        # length nor emit tokens until their last chunk lands
        active = np.asarray(
            [r is not None and s not in self.pending
             for s, r in enumerate(self.slots)]
        )
        t0 = time.time()
        logits, self.cache = self._fn("engine_decode_batched")(
            self.ecfg,
            self.params,
            jnp.asarray(self.next_tokens.copy()),
            self.cache,
            jnp.asarray(active),
        )
        self._t("dispatch:decode", t0)
        self._next_dev_ok = False
        self.lengths_h += active.astype(np.int32)
        t0 = time.time()
        greedy_toks = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
        self._t("sync:decode", t0)
        for slot, req in enumerate(self.slots):
            if req is None or slot in self.pending:
                continue
            if req.sampling is None or req.sampling.greedy:
                tok = int(greedy_toks[slot])
            else:
                tok = self._pick_token(req, logits[slot][None, :])
            req.output_ids.append(tok)
            self.next_tokens[slot] = tok
            self._maybe_finish(slot)

    def _next_tokens_dev(self):
        """Next-token vector as a device array: window N's device output
        when still valid (no host-side mutation since), else uploaded from
        the host mirror.  Uploads a COPY: jnp.asarray may zero-copy-alias an
        aligned host buffer, and next_tokens is mutated in place while
        dispatched programs are still in flight."""
        if self._next_dev_ok and self._next_dev is not None:
            return self._next_dev
        return jnp.asarray(self.next_tokens.copy())

    def _window_cannot_finish(self, n: int) -> bool:
        """True when NO active request can finish inside an n-step window:
        no EOS/stop conditions, more than n tokens of max_new headroom, and
        cache room beyond the window.  Only then is it safe to leave the
        window in flight (pipelined) — a finish would otherwise delay slot
        reuse/admission by one window."""
        for s, r in enumerate(self.slots):
            if r is None:
                continue
            if r.eos_token_id is not None or r.stop_sequences:
                return False
            if len(r.output_ids) + n >= r.max_new_tokens:
                return False
            if self.lengths_h[s] + 1 >= self.max_len:  # mirror already += n
                return False
        return True

    def _decode_multi(self, n: int):
        """n greedy decode steps in one dispatch (engine_decode_multi).

        Dispatch pipelining (VERDICT r2 #2): when the host mirror proves no
        request can finish inside this window, the token buffer is left
        UN-FETCHED and the next scheduler step dispatches window N+1 —
        chained through the device-resident token vector — before syncing
        window N, so the device never idles across the host's fetch +
        bookkeeping.  Tokens emitted after a slot finishes are discarded
        host-side (slot reuse re-prefills from 0)."""
        active_mask = np.asarray([r is not None for r in self.slots])
        t0 = time.time()
        toks, self.cache = self._fn("engine_decode_multi")(
            self.ecfg,
            self.params,
            self._next_tokens_dev(),
            self.cache,
            jnp.asarray(active_mask),
            n,
        )
        self._t("dispatch:decode_multi", t0)
        self.lengths_h += np.where(active_mask, n, 0).astype(np.int32)
        # inactive rows carry their input token through, so toks[-1] is the
        # full next-token vector
        self._next_dev = toks[n - 1]
        self._next_dev_ok = True
        snapshot = list(self.slots)
        if self._window_cannot_finish(n):
            self._inflight = (toks, snapshot, n)
        else:
            self._process_window(toks, snapshot, n)

    def _process_window(self, toks_dev, snapshot, n: int):
        """Fetch one multi-step window's tokens and apply them in order.
        ``snapshot`` is the slot->request map at dispatch time: a request
        freed since (cancel) is skipped by identity."""
        t0 = time.time()
        toks = np.asarray(jax.device_get(toks_dev))  # (n, B)
        self._t("sync:decode_multi", t0)
        for slot, req in enumerate(snapshot):
            if req is None or req.done or self.slots[slot] is not req:
                continue
            for i in range(n):
                if req.done:
                    break
                tok = int(toks[i, slot])
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
        if req.t_first is None and req.output_ids:
            import time as _time

            req.t_first = _time.time()
        hit_stop = _hit_stop(req)
        hit_max = len(req.output_ids) >= req.max_new_tokens
        hit_cap = int(self.lengths_h[slot]) + 1 >= self.max_len
        if hit_stop or hit_max or hit_cap:
            self._finish_req(req)
            self.slots[slot] = None  # slot freed; next admit overwrites it
