"""Micro-batching for the serving path.

The reference serves each HTTP search with its own SQL query
(NeuronAgent/cmd/agent-server/main.go:97-120 routes straight into the
engine). On TPU a per-request search is the worst possible shape: the
grouped scan kernel is built for thousands of queries per dispatch and
a 1-row batch pays the full ~30 ms tunnel dispatch alone. The
MicroBatcher closes the gap between HTTP's one-request-at-a-time shape
and the chip's batch appetite: concurrent requests queue for up to
``window_ms``, are padded to one of a few power-of-two row counts (so
XLA compiles a handful of shapes, not one per arrival pattern), run as
ONE ``index.search`` dispatch, and fan back out to their waiters.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np


class MicroBatcher:
    """Batch concurrent single-query searches into one device dispatch.

    Parameters
    ----------
    index: any object with ``search(queries, k=..., **kw)``.
    window_ms: max time the FIRST request in a batch waits for company.
    max_batch: hard cap on rows per dispatch (also the pad ceiling).
    wire: "f32" (default) or "int8" — quantize the assembled batch to
        the 1-byte query wire before dispatch (index/base.py:84-97);
        worthwhile when the device link is the bottleneck.
    search_kw: fixed kwargs forwarded to every ``index.search`` call
        (e.g. ``{"nprobe": 8}``).
    """

    def __init__(self, index, *, window_ms: float = 10.0,
                 max_batch: int = 4096, wire: str = "f32",
                 pad_floor: int = 1, depth: int = 4,
                 search_kw: Optional[Dict[str, Any]] = None):
        self.index = index
        self.window = window_ms / 1000.0
        self.max_batch = int(max_batch)
        # pad_floor > 1 pins the dispatch to FEWER compile shapes: a
        # floor of 64 means batches of 1..64 all run the same [64, D]
        # program (padding rows is free next to the dispatch cost;
        # a fresh XLA compile per pow2 shape is 20-40 s on the tunnel)
        self.pad_floor = int(pad_floor)
        self.wire = wire
        self.search_kw = dict(search_kw or {})
        self.stats = {"batches": 0, "requests": 0, "max_rows": 0}
        self._cond = threading.Condition()
        self._pending: List[Dict[str, Any]] = []
        self._closed = False
        # dispatch/fan-out pipeline: index.search dispatches
        # asynchronously (JAX), so the dispatch thread starts batch N+1
        # while the device still computes batch N; the fan-out thread
        # blocks on materialization and wakes the waiters. ``depth``
        # bounds in-flight batches (backpressure keeps padded-row work
        # from running ahead of the chip).
        self._inflight: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="ndb-microbatcher")
        self._fanout = threading.Thread(target=self._fanout_loop,
                                        daemon=True,
                                        name="ndb-microbatcher-out")
        self._thread.start()
        self._fanout.start()

    # -- client side ----------------------------------------------------
    def search(self, vector, k: int = 10, timeout: float = 30.0):
        """Blocking single-query search; returns (distances, ids) 1-D."""
        q = np.asarray(vector, np.float32).reshape(-1)
        # validate BEFORE enqueueing: one wrong-dimension vector in an
        # assembled batch would otherwise fan its error out to every
        # request sharing the dispatch
        dim = getattr(self.index, "dim", None)
        if dim is not None and q.size != dim:
            raise ValueError(
                f"query has dim {q.size}, index expects {dim}")
        req: Dict[str, Any] = {"q": q, "k": int(k),
                               "ev": threading.Event(),
                               "deadline": time.monotonic() + timeout}
        with self._cond:
            if self._closed:
                raise RuntimeError("batcher closed")
            self._pending.append(req)
            self._cond.notify()
        if not req["ev"].wait(timeout):
            raise TimeoutError("search timed out in micro-batcher")
        if "err" in req:
            raise req["err"]
        return req["d"], req["ids"]

    def close(self) -> None:
        """Drain and stop. The fan-out sentinel is posted ONLY by the
        dispatch thread (after its last batch's results are already in
        ``_inflight``), so waiters of in-flight batches are never
        stranded by a sentinel jumping ahead of their results."""
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._thread.join()                    # posts the sentinel last
        self._fanout.join(timeout=30.0)

    # -- batcher side ---------------------------------------------------
    def _take_batch(self) -> List[Dict[str, Any]]:
        with self._cond:
            while not self._pending and not self._closed:
                self._cond.wait()
            if self._closed and not self._pending:
                return []
            deadline = time.monotonic() + self.window
            while (len(self._pending) < self.max_batch
                   and not self._closed):
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                self._cond.wait(timeout=left)
            batch = self._pending[:self.max_batch]
            self._pending = self._pending[self.max_batch:]
            return batch

    def _loop(self) -> None:
        while True:
            batch = self._take_batch()
            if not batch:
                self._inflight.put(None)       # wake + stop fan-out
                return
            try:
                self._dispatch_batch(batch)
            except Exception as e:  # noqa: BLE001 — fan the error out
                for r in batch:
                    r["err"] = e
                    r["ev"].set()

    def _dispatch_batch(self, batch: List[Dict[str, Any]]) -> None:
        # drop requests whose client already timed out: nobody is
        # waiting, so their rows would be pure padding with a live k
        now = time.monotonic()
        batch = [r for r in batch if r["deadline"] > now]
        if not batch:
            return
        n = len(batch)
        rows = 1 << (n - 1).bit_length()          # pad to pow2 shape
        rows = min(max(rows, self.pad_floor), self.max_batch)
        q = np.empty((rows, batch[0]["q"].size), np.float32)
        for i, r in enumerate(batch):
            q[i] = r["q"]
        if rows > n:                               # pad rows: repeat row 0
            q[n:] = q[0]
        kmax = max(r["k"] for r in batch)
        if self.wire == "int8":
            from neurondb_tpu.index.base import quantize_queries_int8
            qw: Any = quantize_queries_int8(q)
        else:
            qw = q
        # JAX returns unmaterialized device arrays: this call queues the
        # work and returns; the fan-out thread blocks on the values
        d, ids = self.index.search(qw, k=kmax, **self.search_kw)
        self.stats["batches"] += 1
        self.stats["requests"] += n
        self.stats["max_rows"] = max(self.stats["max_rows"], n)
        self._inflight.put((batch, d, ids))        # backpressure at depth

    def _fanout_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            batch, d, ids = item
            try:
                d = np.asarray(d)                  # block until computed
                ids = np.asarray(ids)
            except Exception as e:  # noqa: BLE001
                for r in batch:
                    r["err"] = e
                    r["ev"].set()
                continue
            for i, r in enumerate(batch):
                r["d"] = d[i, :r["k"]]
                r["ids"] = ids[i, :r["k"]]
                r["ev"].set()
