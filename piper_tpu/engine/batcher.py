"""Continuous batching: group concurrent requests into batched device calls.

The classic TTS serving shape: requests arriving within a small window (or
while the device is busy) are padded to a common phoneme bucket and run as
ONE batched split-mode synthesis, amortizing both the per-call overhead and
the device round trips. Complements ServingPipeline (which overlaps single-
utterance fused calls): batching wins on throughput, the pipeline on tail
latency for sparse traffic.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from piper_tpu.engine.runtime import PiperRuntime


@dataclass
class _Request:
    ids: List[int]
    scales: Tuple[Optional[float], Optional[float], Optional[float]]
    speaker_id: Optional[int]
    future: "Future[np.ndarray]"


class BatchingServer:
    """Collects requests for up to `max_wait_ms` (or `max_batch`) and serves
    them as one batched call on a single worker thread."""

    def __init__(self, runtime: PiperRuntime, max_batch: int = 16,
                 max_wait_ms: float = 5.0, split_length_ratio: float = 4.0):
        self.rt = runtime
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.split_length_ratio = split_length_ratio
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._carry: Optional[_Request] = None  # scale-mismatch spillover
        self._closed = False
        self._worker = threading.Thread(target=self._serve_loop, daemon=True)
        self._worker.start()

    def submit(
        self,
        phoneme_ids: Sequence[int],
        noise_scale: Optional[float] = None,
        length_scale: Optional[float] = None,
        noise_w: Optional[float] = None,
        speaker_id: Optional[int] = None,
    ) -> "Future[np.ndarray]":
        if self._closed:
            raise RuntimeError("server is closed")
        # Validate up front so one bad request can't fail a whole group.
        ids = list(phoneme_ids)
        if not ids:
            raise ValueError("empty phoneme sequence")
        bad = [i for i in ids if not (0 <= i < self.rt.hparams.n_vocab)]
        if bad:
            raise ValueError(
                f"phoneme id(s) {bad[:5]} out of range [0, {self.rt.hparams.n_vocab})"
            )
        fut: "Future[np.ndarray]" = Future()
        self._queue.put(_Request(ids, (noise_scale, length_scale, noise_w),
                                 speaker_id, fut))
        return fut

    def _collect(self) -> Optional[List[_Request]]:
        first = self._carry or self._queue.get()
        self._carry = None
        if first is None:
            return None
        group = [first]
        deadline = self.max_wait_s
        import time

        t0 = time.perf_counter()
        while len(group) < self.max_batch:
            remaining = deadline - (time.perf_counter() - t0)
            try:
                item = self._queue.get(timeout=max(0.0, remaining))
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-signal shutdown for the outer loop
                break
            # Only identical-scale requests batch together. A mismatch closes
            # the current group; the mismatched request carries over to start
            # the NEXT group, preserving arrival order.
            if item.scales != first.scales:
                self._carry = item
                break
            group.append(item)
        return group

    def _split_group(self, group: List[_Request]) -> List[List[_Request]]:
        """Split a group whose length spread is pathological (max/min phoneme
        count >= split_length_ratio) into per-phoneme-bucket sub-batches.

        Mixed lengths in one batch pad every row to the longest row's frame
        bucket — exact-length masking keeps the audio correct but the padded
        decode compute is still spent. Splitting trades that padding against
        batch efficiency (B=16 -> 2xB=8 runs below the device's batched
        sweet spot), so only extreme spreads split; modest spreads stay
        batched."""
        lens = [len(r.ids) for r in group]
        if len(group) < 2 or max(lens) < self.split_length_ratio * min(lens):
            return [group]
        from piper_tpu.engine.bucketing import BucketOverflowError, bucket_for

        buckets = {}
        for r in group:
            try:
                b = bucket_for(len(r.ids), self.rt.options.phoneme_buckets,
                               "phoneme")
            except BucketOverflowError:
                # Oversized request: isolate it so the error surfaces on ITS
                # future via _dispatch_group's per-group handling instead of
                # unwinding the serve thread (which would wedge the server).
                b = float("inf")
            buckets.setdefault(b, []).append(r)
        return [buckets[k] for k in sorted(buckets)]

    def _dispatch_group(self, group: List[_Request]):
        """Dispatch one batched synthesis; returns (group, outs, meta) for a
        later fetch, or None if the dispatch itself failed."""
        try:
            ns, ls, nw = group[0].scales
            speaker_ids = None
            if any(r.speaker_id is not None for r in group):
                speaker_ids = [r.speaker_id or 0 for r in group]
            outs, meta = self.rt.dispatch_batch(
                [r.ids for r in group],
                noise_scale=ns, length_scale=ls, noise_w=nw,
                speaker_ids=speaker_ids,
            )
            return group, outs, meta
        except Exception as e:  # noqa: BLE001 — per-request surfacing
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)
            return None

    def _finish_group(self, group: List[_Request], outs, meta) -> None:
        try:
            audios = self.rt.fetch_batch(outs, meta)
            for r, a in zip(group, audios):
                r.future.set_result(a)
        except Exception as e:  # noqa: BLE001
            for r in group:
                if not r.future.done():
                    r.future.set_exception(e)

    def _serve_loop(self) -> None:
        # Depth-2 pipeline on ONE thread (all device interaction serial —
        # see ServingPipeline.submit_batch for why that matters on a
        # tunneled device): group i's bulk audio fetch overlaps group
        # i+1's collect + dispatch. A pending fetch is completed
        # immediately when no more work is queued, so idle-traffic latency
        # is unchanged.
        pending = None
        while True:
            group = self._collect()
            if group is None:
                if pending is not None:
                    self._finish_group(*pending)
                return
            for sub in self._split_group(group):
                dispatched = self._dispatch_group(sub)
                if pending is not None:
                    self._finish_group(*pending)
                pending = dispatched
            if pending is not None and self._queue.empty() and self._carry is None:
                self._finish_group(*pending)
                pending = None

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            self._worker.join(timeout=120)

    def __enter__(self) -> "BatchingServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
