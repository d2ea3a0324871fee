"""Asynchronous serving pipeline.

Overlaps device round trips across requests: `submit()` dispatches the fused
synthesis program immediately (JAX dispatch is non-blocking) and returns a
Future; several fetcher threads drain results concurrently so device->host
round trips overlap. On a tunneled TPU (~30 ms per round trip) this hides
both the RTT and the host-side Python between requests — measured ~5x the
blocking single-stream throughput (9.4 vs 46 ms per utterance).

The reference has no serving pipeline at all (its streaming wrapper spawns a
fresh runtime per request — PiperMetalRuntime.swift:95-137).

Do NOT mix submit() and submit_batch() concurrently on one pipeline: the
single-utterance fetcher threads and the batch worker would then issue
device->host transfers from several threads at once, which stalls the
tunneled axon client unpredictably (4-6 s per batch observed). Use one
pipeline per traffic shape (the small single-utterance fetches among
themselves are fine — they are what the fetcher pool exists for)."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np

from piper_tpu.engine.runtime import PiperRuntime


def _claim(fut: Future) -> bool:
    """Atomically move a pipeline future to RUNNING; False when the caller
    already cancelled it. After a successful claim set_result/set_exception
    cannot race a cancel (a cancelled future raises InvalidStateError on
    set_result, which used to kill the worker thread)."""
    return fut.set_running_or_notify_cancel()


class ServingPipeline:
    _SHUTDOWN = object()

    def __init__(self, runtime: PiperRuntime, max_inflight: int = 8,
                 num_fetchers: int = 4):
        self.rt = runtime
        self._inflight = threading.Semaphore(max_inflight)
        self._queue: "queue.Queue" = queue.Queue()
        self._dispatch_lock = threading.Lock()
        # Guards the closed flag vs enqueue ordering: an item must never
        # land AFTER close()'s shutdown sentinels (its future would strand).
        self._close_lock = threading.Lock()
        self._closed = False
        # Batched submissions run on one dedicated worker (started lazily)
        # that serializes all device interaction; see submit_batch.
        self._batch_queue: "queue.Queue" = queue.Queue()
        self._batch_thread: Optional[threading.Thread] = None
        self._batch_lock = threading.Lock()
        # Multiple fetchers so device->host round trips overlap (a single
        # fetcher would serialize one RTT per request).
        self._fetchers = [
            threading.Thread(target=self._fetch_loop, daemon=True)
            for _ in range(max(1, num_fetchers))
        ]
        for t in self._fetchers:
            t.start()

    def submit(
        self,
        phoneme_ids: Sequence[int],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_id: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> "Future[np.ndarray]":
        """Queue one utterance; the Future resolves to PCM in the runtime's
        output_dtype (float32 by default, int16 for an int16 runtime)."""
        if self._closed:
            raise RuntimeError("pipeline is closed")
        fut: "Future[np.ndarray]" = Future()
        self._inflight.acquire()
        try:
            with self._dispatch_lock:
                outs, meta = self.rt.dispatch_fused(
                    phoneme_ids,
                    noise_scale=noise_scale,
                    length_scale=length_scale,
                    noise_w=noise_w,
                    speaker_id=speaker_id,
                    seed=seed,
                )
        except Exception as e:  # noqa: BLE001 — surface through the future
            self._inflight.release()
            fut.set_exception(e)
            return fut
        with self._close_lock:
            if self._closed:
                # close() already sent the fetcher sentinels; an enqueue
                # now would strand the future behind them.
                self._inflight.release()
                fut.set_exception(RuntimeError("pipeline is closed"))
                return fut
            self._queue.put((fut, outs, meta))
        return fut

    def submit_batch(
        self,
        phoneme_ids_batch: Sequence[Sequence[int]],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_ids: Optional[Sequence[int]] = None,
        seed: Optional[int] = None,
    ) -> "Future[list]":
        """Queue a whole batch; the Future resolves to a list of PCM arrays
        (one per utterance, exact lengths, same audio as synthesize_batch).

        Batches run on a dedicated worker that owns every device
        interaction serially — dispatch batch i+1, then fetch batch i — so
        batch i's bulk audio transfer (~37% of the blocking wall time at
        B=32 on the tunneled dev chip) overlaps batch i+1's compute.
        Measured 254x vs 179x blocking. A single worker is deliberate:
        concurrent device transfers from several threads stall the
        tunneled client unpredictably (4-6 s/batch observed), while the
        depth-2 serial interleave is stable."""
        fut: "Future[list]" = Future()
        kwargs = dict(
            noise_scale=noise_scale, length_scale=length_scale,
            noise_w=noise_w, speaker_ids=speaker_ids, seed=seed,
        )
        # Closed-check, worker start, and enqueue share one lock with
        # close()'s sentinel put, so a submit can neither land after the
        # SHUTDOWN sentinel nor start a worker close() already joined
        # (either would strand the Future unresolved).
        with self._batch_lock:
            if self._closed:
                raise RuntimeError("pipeline is closed")
            if self._batch_thread is None:
                self._batch_thread = threading.Thread(
                    target=self._batch_loop, daemon=True
                )
                self._batch_thread.start()
            self._batch_queue.put(
                (fut, [list(x) for x in phoneme_ids_batch], kwargs)
            )
        return fut

    def _batch_loop(self) -> None:
        pending = None  # (future, device_outs, meta) awaiting its fetch
        while True:
            try:
                item = self._batch_queue.get(block=pending is None)
            except queue.Empty:
                item = None  # nothing new: just complete the pending fetch
            if item is None and pending is None:
                continue
            nxt = None
            if item is self._SHUTDOWN:
                if pending is not None:
                    self._finish_batch(pending)
                return
            if item is not None:
                fut, ids_batch, kwargs = item
                try:
                    with self._dispatch_lock:
                        outs, meta = self.rt.dispatch_batch(ids_batch, **kwargs)
                    nxt = (fut, outs, meta)
                except Exception as e:  # noqa: BLE001
                    if _claim(fut):
                        fut.set_exception(e)
            if pending is not None:
                self._finish_batch(pending)
            pending = nxt

    def _finish_batch(self, pending) -> None:
        fut, outs, meta = pending
        if not _claim(fut):
            return  # caller cancelled: skip the fetch, keep the worker alive
        try:
            fut.set_result(self.rt.fetch_batch(outs, meta))
        except Exception as e:  # noqa: BLE001
            fut.set_exception(e)

    def _fetch_loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            fut, outs, meta = item
            try:
                if not _claim(fut):
                    continue  # caller cancelled; fetcher must survive
                try:
                    fut.set_result(self.rt.fetch_fused(outs, meta))
                except Exception as e:  # noqa: BLE001
                    fut.set_exception(e)
            finally:
                self._inflight.release()

    def close(self) -> None:
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            for _ in self._fetchers:
                self._queue.put(None)
        for t in self._fetchers:
            t.join(timeout=60)
        with self._batch_lock:
            worker = self._batch_thread
            if worker is not None:
                self._batch_queue.put(self._SHUTDOWN)
        if self._batch_thread is not None:
            self._batch_thread.join(timeout=120)

    def __enter__(self) -> "ServingPipeline":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
