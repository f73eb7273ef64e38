"""Shared continuous-batching service for concurrent request handling.

Round 3's HTTP layer ran a fresh batch-1 ContinuousBatcher per request
behind a global lock, so concurrent clients serialized completely and the
b>=8 fused decode-attention gate (infer/serve_loop._decode_layer) could
never engage in serving. This module fixes the composition: ONE persistent
batcher lives on a background decode thread; request handlers (any thread)
submit prompts and stream their rows' Chunk events back through
per-request queues. N concurrent clients share one decode batch with
mid-decode admission — the point of the continuous batcher.

The reference has no concurrent-serving story at all (single-GPU, one
request at a time — ref infer_vibevoice.py:434-448, backup/web.py gradio
queue); this is the TPU-native serving design: keep the chip's decode batch
full, stream every row's audio as it decodes.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.config import LlasaConfig
from ..infer.serve_loop import ContinuousBatcher

# queue events: ("chunk", Chunk) | ("done", Completion) | ("error", exc);
# a trailing None closes the stream.


class BatcherService:
    """Background decode thread around one ContinuousBatcher.

    submit() is thread-safe; each request gets its own event queue. The
    decode loop admits pending prompts into free rows, steps the batch
    `chunk_frames` frames at a time, and routes windowed Chunk fetches
    (serve_loop.poll_chunks — O(new frames) per sync) to their requests.
    """

    def __init__(self, params: dict, cfg: LlasaConfig, batch_size: int = 8,
                 max_frames: int = 200, chunk_frames: int = 25,
                 prompt_buckets=(16, 32, 64, 128), seed: int = 0,
                 greedy: bool = False):
        self.cb = ContinuousBatcher(params, cfg, batch_size=batch_size,
                                    max_frames=max_frames,
                                    prompt_buckets=prompt_buckets,
                                    seed=seed, greedy=greedy)
        self.chunk_frames = max(int(chunk_frames), 1)
        self._submit_q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._outs: Dict[int, queue.SimpleQueue] = {}
        self._outs_lock = threading.Lock()
        self._next_id = 0
        self._id_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="kalle-decode-loop")
        self._thread.start()

    # -- client side -------------------------------------------------------

    def submit(self, ids: np.ndarray) -> Tuple[int, "queue.SimpleQueue"]:
        """Enqueue a prompt; returns (request id, event queue)."""
        if self._stop.is_set():
            raise RuntimeError("BatcherService is closed")
        with self._id_lock:
            rid = self._next_id
            self._next_id += 1
        q: "queue.SimpleQueue" = queue.SimpleQueue()
        with self._outs_lock:
            self._outs[rid] = q
        self._submit_q.put((rid, np.asarray(ids, np.int32)))
        return rid, q

    def close(self, join: bool = True) -> None:
        self._stop.set()
        self._submit_q.put(None)  # wake an idle loop
        if join:
            self._thread.join(timeout=30)
        # release any handlers still blocked on their event queue
        with self._outs_lock:
            outs, self._outs = list(self._outs.values()), {}
        for q in outs:
            q.put(None)

    # -- decode loop -------------------------------------------------------

    def _route(self, rid: int, event) -> None:
        with self._outs_lock:
            q = self._outs.get(rid)
        if q is not None:
            q.put(event)

    def _finish(self, rid: int) -> None:
        with self._outs_lock:
            q = self._outs.pop(rid, None)
        if q is not None:
            q.put(None)

    def _loop(self) -> None:
        from ..infer import serve_loop  # decode_until via the batcher

        cb = self.cb
        pending: List[Tuple[int, np.ndarray]] = []
        emitted: Dict[int, int] = {}
        try:
            while not self._stop.is_set():
                # drain queued submissions without blocking
                try:
                    while True:
                        item = self._submit_q.get_nowait()
                        if item is not None:
                            pending.append(item)
                except queue.Empty:
                    pass
                if not pending and not bool(
                        np.asarray(cb.state.active).any()):
                    # fully idle: block for the next submission (short
                    # timeout so close() is honored promptly)
                    try:
                        item = self._submit_q.get(timeout=0.2)
                        if item is not None:
                            pending.append(item)
                    except queue.Empty:
                        continue

                active = np.asarray(cb.state.active)
                free = [r for r in range(cb.B) if not active[r]]
                while pending and free:
                    rid, ids = pending.pop(0)
                    cb._admit(free.pop(0), rid, ids)
                    emitted[rid] = 0
                if not np.asarray(cb.state.active).any():
                    continue

                state, cb.rng, n = serve_loop.decode_until(
                    cb.params, cb.state, cb.cfg, cb.rng,
                    max_steps=self.chunk_frames, greedy=cb.greedy)
                cb.state = state
                cb.step_count += int(n)

                for ch in cb.poll_chunks(emitted, window=self.chunk_frames):
                    self._route(ch.index, ("chunk", ch))
                for c in cb._harvest():
                    if emitted.get(c.index, 0) < c.n_frames:
                        lo = emitted[c.index]
                        self._route(c.index, ("chunk", serve_loop.Chunk(
                            index=c.index, means=c.means[lo:],
                            samples=c.samples[lo:], start_frame=lo,
                            final=True)))
                    emitted.pop(c.index, None)
                    self._route(c.index, ("done", c))
                    self._finish(c.index)
        except BaseException as e:  # noqa: BLE001 — broadcast, don't hang
            with self._outs_lock:
                outs, self._outs = list(self._outs.values()), {}
            for q in outs:
                q.put(("error", e))
                q.put(None)
            if not self._stop.is_set():
                raise
