"""Minimal serving daemon: a JSON-lines TCP front end over ContinuousBatcher.

The reference has "no training, no serving daemon, no distributed
execution" (SURVEY §0) — this completes BASELINE config 4's serving story
with an actual network surface.  Deliberately dependency-free (stdlib
socket + threads): production deployments front it with their own RPC
layer; this gives the framework a runnable, testable daemon.

Protocol: one JSON object per line, one response line per request.

  request  {"prompt_ids": [...], "max_new_tokens": 32,
            "eos_token_id": 2,          # optional
            "stream": true,             # optional: stream tokens as produced
            "temperature": 0.8, "top_k": 40, "top_p": 0.95}   # optional
  response {"uid": 7, "output_ids": [...], "done": true}

  With "stream": true, partial lines arrive as tokens are decoded:
  response {"uid": 7, "token_ids": [a, b], "done": false}    # 0+ times
  response {"uid": 7, "token_ids": [c], "output_ids": [a, b, c],
            "done": true}                                     # final

  request  {"op": "cancel", "uid": 7}
  response {"uid": 7, "cancelled_ok": true}      # plus the final reply for
                                                 # uid 7 with "cancelled": true
  request  {"op": "metrics"}
  response {... ContinuousBatcher.metrics() ...}

A connection may pipeline multiple requests; responses arrive in
completion order tagged by uid.  Each connection has a dedicated writer
thread draining an outbound queue, so a slow client never stalls the
scheduler loop.
"""

from __future__ import annotations

import itertools
import json
import queue
import socket
import threading
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from dgq_tpu.serving.scheduler import ContinuousBatcher, Request


class BatcherServer:
    def __init__(self, batcher: ContinuousBatcher, host: str = "127.0.0.1",
                 port: int = 0, *, idle_sleep_s: float = 0.002):
        self.batcher = batcher
        self._lock = threading.Lock()  # batcher is not thread-safe
        self._uid = itertools.count()
        # uid -> (send_fn, n_tokens_already_sent); guarded by self._lock
        self._streams: Dict[int, Tuple[Callable, int]] = {}
        # cancels are queued and drained by the scheduler loop: the loop
        # holds self._lock nearly continuously while work exists, so a
        # cancel() that contended for the lock directly could starve until
        # the request it wants to stop has already finished
        self._cancel_q: "queue.Queue" = queue.Queue()
        self._done: Dict[int, Request] = {}
        self._done_cv = threading.Condition()
        self._fatal: Optional[str] = None
        self._stop = threading.Event()
        self._idle_sleep_s = idle_sleep_s
        self._sock = socket.create_server((host, port))
        self._sock.settimeout(0.2)
        self.host, self.port = self._sock.getsockname()[:2]
        self._threads = [
            threading.Thread(target=self._scheduler_loop, daemon=True),
            threading.Thread(target=self._accept_loop, daemon=True),
        ]
        for t in self._threads:
            t.start()

    # -- client-facing --------------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens: int,
               eos_token_id: Optional[int] = None, sampling=None,
               stream_send: Optional[Callable] = None) -> int:
        """``stream_send``: a callable receiving one JSON-able dict per
        partial-token update; registered atomically with admission so no
        tokens are missed."""
        uid = next(self._uid)
        req = Request(uid=uid, prompt_ids=np.asarray(prompt_ids, np.int32),
                      max_new_tokens=int(max_new_tokens),
                      eos_token_id=eos_token_id, sampling=sampling)
        with self._lock:
            self.batcher.add_request(req)
            if stream_send is not None:
                self._streams[uid] = (stream_send, 0)
        return uid

    def cancel(self, uid: int, timeout: float = 60.0) -> bool:
        """Cancel a queued or running request; its waiter receives the final
        reply with ``cancelled: true``.  Processed by the scheduler loop
        within one step (returns False if the request already finished)."""
        ev = threading.Event()
        holder: list = []
        self._cancel_q.put((uid, holder, ev))
        if not ev.wait(timeout):
            if self._fatal is not None:
                raise RuntimeError(f"serving loop died: {self._fatal}")
            raise TimeoutError(f"cancel({uid}) not processed in {timeout}s")
        return holder[0]

    def wait(self, uid: int, timeout: Optional[float] = None) -> Request:
        with self._done_cv:
            ok = self._done_cv.wait_for(
                lambda: uid in self._done or self._fatal is not None, timeout
            )
            if self._fatal is not None and uid not in self._done:
                raise RuntimeError(f"serving loop died: {self._fatal}")
            if not ok:
                raise TimeoutError(f"request {uid} not finished in {timeout}s")
            return self._done.pop(uid)

    def metrics(self) -> dict:
        """Thread-safe batcher metrics (the batcher itself is not)."""
        with self._lock:
            return self.batcher.metrics()

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=10)
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- internals ------------------------------------------------------------

    def _scheduler_loop(self):
        while not self._stop.is_set():
            stepped = False
            try:
                with self._lock:
                    self._drain_cancels()
                    if self.batcher.has_work:
                        self.batcher.step()
                        stepped = True
                    if self._streams:
                        self._send_stream_deltas()
                    finished = self.batcher.finished
                    if finished:
                        with self._done_cv:
                            for r in finished:
                                self._done[r.uid] = r
                            self._done_cv.notify_all()
                        self.batcher.finished = []
            except Exception as e:  # noqa: BLE001 — a dead loop must not strand waiters
                with self._done_cv:
                    self._fatal = repr(e)
                    self._done_cv.notify_all()
                self._drain_cancels(dead=True)
                return
            if not stepped:
                self._stop.wait(self._idle_sleep_s)

    def _drain_cancels(self, dead: bool = False):
        """Apply queued cancels (caller holds self._lock unless ``dead``)."""
        while True:
            try:
                uid, holder, ev = self._cancel_q.get_nowait()
            except queue.Empty:
                return
            holder.append(False if dead else self.batcher.cancel(uid))
            ev.set()

    def _send_stream_deltas(self):
        """Push newly-decoded tokens of streaming requests (caller holds
        self._lock).  Finished requests get their tail in the final reply
        (_finish_and_reply) — here only live slots are walked."""
        for req in self.batcher.slots:
            if req is None:
                continue
            entry = self._streams.get(req.uid)
            if entry is None:
                continue
            send, sent = entry
            if len(req.output_ids) > sent:
                delta = [int(t) for t in req.output_ids[sent:]]
                try:
                    send({"uid": req.uid, "token_ids": delta, "done": False})
                except Exception:  # noqa: BLE001 — dead client: stop streaming
                    self._streams.pop(req.uid, None)
                    continue
                self._streams[req.uid] = (send, len(req.output_ids))

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=self._serve_conn, args=(conn,),
                             daemon=True).start()

    def _serve_conn(self, conn: socket.socket):
        # dedicated writer thread: the scheduler loop streams tokens through
        # send(), and must never block on a slow client's socket
        out_q: "queue.Queue" = queue.Queue()

        def writer():
            while True:
                obj = out_q.get()
                if obj is None:
                    return
                try:
                    conn.sendall((json.dumps(obj) + "\n").encode())
                except (ConnectionError, OSError):
                    return

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()

        def send(obj):
            out_q.put(obj)

        def finish_and_reply(uid):
            req = self.wait(uid)
            with self._lock:
                entry = self._streams.pop(uid, None)
            final = {"uid": uid,
                     "output_ids": [int(t) for t in req.output_ids],
                     "done": True}
            if entry is not None:  # streaming: include the unsent tail
                final["token_ids"] = [int(t) for t in req.output_ids[entry[1]:]]
            if req.cancelled:
                final["cancelled"] = True
            send(final)

        try:
            f = conn.makefile("r", encoding="utf-8")
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    msg = json.loads(line)
                except json.JSONDecodeError as e:
                    send({"error": f"bad json: {e}"})
                    continue
                if msg.get("op") == "metrics":
                    send(self.metrics())
                    continue
                if msg.get("op") == "cancel":
                    try:
                        uid = int(msg["uid"])
                        send({"uid": uid, "cancelled_ok": self.cancel(uid)})
                    except (KeyError, TypeError, ValueError) as e:
                        send({"error": f"bad cancel: {e}"})
                    continue
                if "prompt_ids" not in msg:
                    send({"error": "missing prompt_ids"})
                    continue
                try:
                    sampling = None
                    if any(k in msg for k in ("temperature", "top_k", "top_p")):
                        from dgq_tpu.serving.sampling import SamplingParams

                        sampling = SamplingParams(
                            temperature=float(msg.get("temperature", 0.0)),
                            top_k=int(msg.get("top_k", 0)),
                            top_p=float(msg.get("top_p", 1.0)),
                        )
                    uid = self.submit(msg["prompt_ids"],
                                      msg.get("max_new_tokens", 32),
                                      eos_token_id=msg.get("eos_token_id"),
                                      sampling=sampling,
                                      stream_send=send if msg.get("stream") else None)
                except Exception as e:  # noqa: BLE001 — malformed fields get an error reply
                    send({"error": f"bad request: {e}"})
                    continue
                # resolve asynchronously so pipelined requests interleave
                threading.Thread(target=finish_and_reply, args=(uid,),
                                 daemon=True).start()
        except (ConnectionError, OSError):
            pass
        finally:
            out_q.put(None)
            wt.join(timeout=5)
            conn.close()
