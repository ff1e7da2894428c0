"""Cross-request micro-batching for the serving path.

The reference ships no serving at all (README TODO); the HTTP layer here
previously serialized requests behind a lock — N concurrent clients cost N
device dispatches of batch ``batch_size`` (mostly padding). This batcher
coalesces concurrent requests into shared forwards: a single worker drains
the queue up to ``predictor.batch_size`` items, waiting at most
``max_wait_ms`` after the first arrival, and resolves per-request futures
from one device call. Requests with and without attention maps group
separately (they run different compiled programs).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


@dataclass
class _Request:
    data: bytes
    with_maps: bool
    future: "Future"


@dataclass
class BatchedResult:
    logits: np.ndarray                     # [C]
    probs: np.ndarray                      # [C]
    attn_map: Optional[np.ndarray] = None  # [g, g] when requested


class MicroBatcher:
    def __init__(self, predictor, max_wait_ms: float = 5.0):
        self.predictor = predictor
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------

    def submit(self, data: bytes, with_maps: bool = False) -> "Future":
        """Enqueue one image; the Future resolves to a BatchedResult."""
        fut: "Future" = Future()
        # the lock orders every accepted request BEFORE close()'s shutdown
        # sentinel — otherwise a submit racing close() could enqueue after
        # the sentinel and its Future (and a blocked predict()) would hang
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._q.put(_Request(data, with_maps, fut))
        return fut

    def predict(self, data: bytes, with_maps: bool = False) -> BatchedResult:
        """Blocking convenience wrapper."""
        return self.submit(data, with_maps).result()

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._thread.join(timeout=5)
        # belt-and-braces: fail anything still queued (e.g. the worker died)
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item.future.set_exception(RuntimeError("batcher is closed"))

    # ------------------------------------------------------------------

    def _collect(self, first: _Request) -> List[_Request]:
        import time
        group = [first]
        deadline = time.monotonic() + self.max_wait
        while len(group) < self.predictor.batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self._q.put(None)          # re-post the shutdown sentinel
                break
            group.append(item)
        return group

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            group = self._collect(item)
            for flag in (False, True):
                sub = [r for r in group if r.with_maps == flag]
                if not sub:
                    continue
                try:
                    out = self.predictor.predict_bytes(
                        [r.data for r in sub], with_maps=flag)
                    for i, r in enumerate(sub):
                        r.future.set_result(BatchedResult(
                            logits=out.logits[i], probs=out.probs[i],
                            attn_map=(out.maps[i] if flag and
                                      out.maps is not None else None)))
                except Exception as e:                  # noqa: BLE001
                    for r in sub:
                        r.future.set_exception(e)
