"""Prefetch pool — the single threaded item-producer in the framework.

Reference: data_pool.py — DataPrefetchPool (producer threads filling a
bounded queue with wrap-around indexing and 90%-full backoff, :10-118),
PrefetchDataIterator (static batch size, :122-160) and
DynamicPrefetchBatchIterator (feeds DynamicBatchGenerator, :161-209).

Two consumption modes share the same pool:
  * the reference's infinite sampled stream (start()/get()) for drop-in use
  * `finite_iter(idxs)` — epoch-deterministic exactly-once production,
    which datasets.PrefetchLoader builds its batch pipeline on.
"""
from __future__ import annotations

import queue
import random
import threading
import time
from typing import Callable, Iterator, List, Optional, Sequence

from .collate import DynamicBatchGenerator


class DataPrefetchPool:
    def __init__(self, dataset, prefetch_size: int = 1000,
                 max_size: int = 1000, num_workers: int = 2,
                 shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.q: "queue.Queue" = queue.Queue(maxsize=max_size)
        self.prefetch_size = prefetch_size
        self.num_workers = num_workers
        self.shuffle = shuffle
        self._stop = threading.Event()
        self._rng = random.Random(seed)
        self._threads: List[threading.Thread] = []
        self._cursor = 0
        self._lock = threading.Lock()

    def _next_index(self) -> int:
        with self._lock:
            if self.shuffle:
                return self._rng.randrange(len(self.dataset))
            i = self._cursor
            self._cursor = (self._cursor + 1) % len(self.dataset)  # wrap-around
            return i

    def _worker(self):
        while not self._stop.is_set():
            if self.q.qsize() >= 0.9 * self.q.maxsize:  # backoff (ref :83-90)
                time.sleep(0.05)
                continue
            idx = self._next_index()
            try:
                item = self.dataset[idx]
            except Exception:
                continue
            try:
                self.q.put(item, timeout=1.0)
            except queue.Full:
                pass

    def start(self):
        self._stop.clear()
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(self.num_workers)]
        for t in self._threads:
            t.start()
        return self

    def get(self, timeout: Optional[float] = 10.0):
        return self.q.get(timeout=timeout)

    def qsize(self) -> int:
        return self.q.qsize()

    def stop(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def finite_iter(self, idxs: Sequence[int],
                    stop: Optional[threading.Event] = None) -> Iterator:
        """Yield dataset[i] for each i in idxs exactly once (epoch mode),
        produced by num_workers threads into a bounded queue. Order is
        completion order, deterministic partitioning idxs[w::workers]."""
        stop = stop or self._stop
        item_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 4)

        def worker(sub):
            for i in sub:
                if stop.is_set():
                    break
                item_q.put(self.dataset[i])
            item_q.put(None)

        shards = [idxs[w::self.num_workers] for w in range(self.num_workers)]
        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in shards]
        for t in threads:
            t.start()
        finished = 0
        while finished < self.num_workers and not stop.is_set():
            it = item_q.get()
            if it is None:
                finished += 1
                continue
            yield it


class PrefetchDataIterator:
    """Static batch-size iterator over a DataPrefetchPool (ref :122-160)."""

    def __init__(self, pool: DataPrefetchPool, batch_size: int,
                 collate_fn: Optional[Callable] = None):
        self.pool = pool
        self.batch_size = batch_size
        self.collate_fn = collate_fn

    def __iter__(self):
        return self

    def __next__(self):
        batch = [self.pool.get() for _ in range(self.batch_size)]
        return self.collate_fn(batch) if self.collate_fn else batch


class DynamicPrefetchBatchIterator:
    """Token-budget batching over a DataPrefetchPool (ref :161-209)."""

    def __init__(self, pool: DataPrefetchPool, max_token_length: int,
                 batch_size: int = 9999999,
                 collate_fn: Optional[Callable] = None):
        self.pool = pool
        self.gen = DynamicBatchGenerator(max_token_length, batch_size)
        self.collate_fn = collate_fn

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            batch = self.gen.add(self.pool.get())
            if batch:
                return self.collate_fn(batch) if self.collate_fn else batch
