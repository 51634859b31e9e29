"""Minimal serving daemon: a JSON-lines TCP front end over ContinuousBatcher.

The reference has "no training, no serving daemon, no distributed
execution" (SURVEY §0) — this completes BASELINE config 4's serving story
with an actual network surface.  Deliberately dependency-free (stdlib
socket + threads): production deployments front it with their own RPC
layer; this gives the framework a runnable, testable daemon.

Protocol: one JSON object per line, one response line per request.

  request  {"prompt_ids": [...], "max_new_tokens": 32,
            "eos_token_id": 2,          # optional
            "temperature": 0.8, "top_k": 40, "top_p": 0.95}   # optional
  response {"uid": 7, "output_ids": [...], "done": true}

  request  {"op": "metrics"}
  response {... ContinuousBatcher.metrics() ...}

A connection may pipeline multiple requests; responses arrive in
completion order tagged by uid.
"""

from __future__ import annotations

import itertools
import json
import socket
import threading
from typing import Dict, Optional

import numpy as np

from dgq_tpu.serving.scheduler import ContinuousBatcher, Request


class BatcherServer:
    def __init__(self, batcher: ContinuousBatcher, host: str = "127.0.0.1",
                 port: int = 0, *, idle_sleep_s: float = 0.002):
        self.batcher = batcher
        self._lock = threading.Lock()  # batcher is not thread-safe
        self._uid = itertools.count()
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
               eos_token_id: Optional[int] = None, sampling=None) -> int:
        uid = next(self._uid)
        req = Request(uid=uid, prompt_ids=np.asarray(prompt_ids, np.int32),
                      max_new_tokens=int(max_new_tokens),
                      eos_token_id=eos_token_id, sampling=sampling)
        with self._lock:
            self.batcher.add_request(req)
        return uid

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
                    if self.batcher.has_work:
                        self.batcher.step()
                        stepped = True
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
                return
            if not stepped:
                self._stop.wait(self._idle_sleep_s)

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
        wlock = threading.Lock()

        def send(obj):
            data = (json.dumps(obj) + "\n").encode()
            with wlock:
                conn.sendall(data)

        def finish_and_reply(uid):
            req = self.wait(uid)
            send({"uid": uid, "output_ids": [int(t) for t in req.output_ids],
                  "done": True})

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
                                      sampling=sampling)
                except Exception as e:  # noqa: BLE001 — malformed fields get an error reply
                    send({"error": f"bad request: {e}"})
                    continue
                # resolve asynchronously so pipelined requests interleave
                threading.Thread(target=finish_and_reply, args=(uid,),
                                 daemon=True).start()
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()
