"""Online-serving frontend: request coalescing over the batched search path.

The reference is a single-threaded library whose batch search is a serial
query loop (/root/reference/src/index.jl:261-273). On TPU the economics
invert: one padded (B, k) dispatch amortizes the fixed dispatch/RPC cost
over B queries, so a serving layer wants to COALESCE concurrent small
requests into shared device batches instead of dispatching each alone.

`BatchingSearcher` is that layer: callers `submit()` single queries (or
small arrays) from any thread and get a Future; a flusher thread groups
pending requests with the same (k, w) into one `search_padded` dispatch
when either `max_batch` queries are waiting or the oldest request has
waited `max_wait_ms`. Latency/throughput trade-off is explicit: max_wait
bounds added latency, max_batch bounds per-dispatch work.

Single-process, thread-safe for search AND mutation: dynamic index
mutations go through the searcher (`push`/`push_batch`/`push_front`/
`pop`/`pop_front`/`delete`, or an arbitrary `mutate(fn)`), which takes the
write side of a readers-writer lock while dispatches take the read side —
every dispatch runs against a consistent index version (the store's device
patches are DONATED in-place updates, so an unsynchronized mutation could
invalidate buffers an in-flight dispatch still holds), and a mutation waits
only for in-flight dispatches to drain (one batch, ~ms) before the next
epoch opens. Mutating the wrapped index directly while submits are in
flight is NOT supported — route mutations through the searcher.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np

from ivfadc_tpu.utils.profiling import SearchStats


class _Pending:
    __slots__ = ("queries", "future", "t_enq")

    def __init__(self, queries: np.ndarray, future: Future, t_enq: float):
        self.queries = queries
        self.future = future
        self.t_enq = t_enq


class _RWLock:
    """Writer-preference readers-writer lock: search dispatches share the
    read side; index mutations take the write side. Writer preference (new
    readers wait once a writer is queued) keeps a steady query stream from
    starving mutations."""

    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    def acquire_read(self) -> None:
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self) -> None:
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        with self._cond:
            self._writers_waiting += 1
            while self._writer or self._readers:
                self._cond.wait()
            self._writers_waiting -= 1
            self._writer = True

    def release_write(self) -> None:
        with self._cond:
            self._writer = False
            self._cond.notify_all()


class BatchingSearcher:
    """Coalesce concurrent search requests into shared device dispatches.

    index:        an IVFADCIndex (or ShardedIVFADCIndex — anything with
                  `search_padded(queries, k, w)` and `.dim`).
    max_batch:    flush a (k, w) group once this many queries are pending.
    max_wait_ms:  flush once the group's oldest request has waited this long.
    pipeline:     dispatches resolved concurrently. `search_padded` blocks
                  on the device->host pull, so with pipeline=1 each flush
                  would serialize behind the previous batch's fetch; a small
                  pool lets wave i+1 dispatch while wave i drains (bounded —
                  it also caps in-flight device work).
    stats:        optional SearchStats to record (queries, seconds) into.
    """

    def __init__(self, index, *, max_batch: int = 1024,
                 max_wait_ms: float = 2.0, pipeline: int = 2,
                 stats: Optional[SearchStats] = None):
        assert max_batch >= 1 and max_wait_ms >= 0 and pipeline >= 1
        from concurrent.futures import ThreadPoolExecutor
        self._index = index
        self._max_batch = max_batch
        self._max_wait = max_wait_ms / 1e3
        self.stats = stats if stats is not None else SearchStats()
        self._lock = threading.Condition()
        self._groups: dict = {}            # (k, w) -> List[_Pending]
        self._closed = False
        self._pool = ThreadPoolExecutor(max_workers=pipeline,
                                        thread_name_prefix="ivfadc-dispatch")
        self._view_lock = _RWLock()
        self._thread = threading.Thread(target=self._flusher, daemon=True,
                                        name="ivfadc-serving-flusher")
        self._thread.start()

    # ------------------------------------------------------------- client API
    def submit(self, query, k: int, w: int = 1) -> Future:
        """Enqueue one query (d,) or a small batch (b, d). Resolves to
        (ids, dists) padded arrays of shape (k,) / (b, k) (ids -1-padded),
        matching `search_padded` row semantics."""
        q = np.asarray(query, np.float32)
        single = q.ndim == 1
        if single:
            q = q[None, :]
        dim = getattr(self._index, "dim", None) or self._index.index.dim
        if q.ndim != 2 or q.shape[1] != dim:
            raise AssertionError(
                f"query shape {np.asarray(query).shape} does not match index "
                f"dimension {dim}")
        fut: Future = Future()
        fut._ivfadc_single = single        # sliced off at resolve time
        with self._lock:
            if self._closed:
                raise RuntimeError("searcher is closed")
            self._groups.setdefault((int(k), int(w)), []).append(
                _Pending(q, fut, time.perf_counter()))
            self._lock.notify()
        return fut

    def search(self, query, k: int, w: int = 1, timeout: float = None):
        """Blocking convenience around submit()."""
        return self.submit(query, k, w).result(timeout=timeout)

    # --------------------------------------------------------- mutation API
    def mutate(self, fn):
        """Apply `fn(index)` under the write lock: waits for in-flight
        dispatches to drain, excludes new ones while fn runs, then reopens.
        Dispatches never observe a half-mutated store; dispatches submitted
        after mutate() returns see the new index version."""
        self._view_lock.acquire_write()
        try:
            return fn(self._index)
        finally:
            self._view_lock.release_write()

    def push(self, point) -> None:
        self.mutate(lambda ix: ix.push(point))

    def push_batch(self, points) -> None:
        self.mutate(lambda ix: ix.push_batch(points))

    def push_front(self, point) -> None:
        self.mutate(lambda ix: ix.push_front(point))

    def pop(self) -> np.ndarray:
        return self.mutate(lambda ix: ix.pop())

    def pop_front(self) -> np.ndarray:
        return self.mutate(lambda ix: ix.pop_front())

    def delete(self, ids) -> None:
        self.mutate(lambda ix: ix.delete(ids))

    def close(self, drain: bool = True) -> None:
        """Stop the flusher. drain=True (default) serves whatever is queued
        first; drain=False fails pending futures with RuntimeError."""
        with self._lock:
            self._closed = True
            if not drain:
                for group in self._groups.values():
                    for p in group:
                        p.future.set_exception(
                            RuntimeError("searcher closed before dispatch"))
                self._groups.clear()
            self._lock.notify()
        self._thread.join()
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ---------------------------------------------------------------- flusher
    def _ready_group(self, now: float):
        """The (k, w) group that must flush now (full, overdue, or closing),
        else the earliest future deadline to sleep toward. Called under lock."""
        next_deadline = None
        for key, group in self._groups.items():
            if not group:
                continue
            n = sum(p.queries.shape[0] for p in group)
            deadline = group[0].t_enq + self._max_wait
            if self._closed or n >= self._max_batch or now >= deadline:
                return key, None
            next_deadline = deadline if next_deadline is None \
                else min(next_deadline, deadline)
        return None, next_deadline

    def _flusher(self) -> None:
        while True:
            with self._lock:
                while True:
                    key, deadline = self._ready_group(time.perf_counter())
                    if key is not None:
                        break
                    if self._closed:      # closed + nothing ready => drained
                        return
                    self._lock.wait(
                        None if deadline is None
                        else max(1e-4, deadline - time.perf_counter()))
                group = self._groups.pop(key)
                # respect max_batch: requeue the tail (whole requests only;
                # a submitted array is never split across dispatches)
                take: List[_Pending] = []
                n = 0
                while group and (n == 0 or
                                 n + group[0].queries.shape[0]
                                 <= self._max_batch):
                    p = group.pop(0)
                    take.append(p)
                    n += p.queries.shape[0]
                if group:
                    self._groups[key] = group
            # hand off to the dispatch pool: the blocking device->host pull
            # happens there, so the next group can flush immediately
            self._pool.submit(self._dispatch, key, take)

    def _dispatch(self, key: Tuple[int, int], take: List[_Pending]) -> None:
        k, w = key
        queries = np.concatenate([p.queries for p in take])
        t0 = time.perf_counter()
        try:
            # read side of the view lock: the dispatch holds the current
            # index version's device buffers; a concurrent mutate() (whose
            # donated patches would invalidate them) waits for the drain
            self._view_lock.acquire_read()
            try:
                ids, dists = self._index.search_padded(queries, k, w)
            finally:
                self._view_lock.release_read()
        except Exception as e:              # propagate to every caller
            for p in take:
                p.future.set_exception(e)
            return
        self.stats.record(queries.shape[0], time.perf_counter() - t0)
        row = 0
        for p in take:
            b = p.queries.shape[0]
            i, d = ids[row:row + b], dists[row:row + b]
            row += b
            if getattr(p.future, "_ivfadc_single", False):
                i, d = i[0], d[0]
            p.future.set_result((i, d))
