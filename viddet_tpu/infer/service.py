"""Continuously-batched detection service core (production serving).

The reference stops at a webcam demo (SURVEY.md §4.3); a production
deployment needs the same chip shared by many concurrent *requests* rather
than N known video files.  ``DetectionService`` is the request-side analogue
of ``infer/multistream.py``'s batch assembler:

  caller threads:  detect(rgb) -> enqueue (slot, image) -> wait on slot
  batcher thread:  collect up to ``batch_size`` requests (bounded by a
                   ``flush_ms`` deadline so a lone request is never stuck
                   waiting for a full batch) -> pad -> ONE fixed-shape
                   jitted forward+NMS -> distribute per-request results

The device program is the same one the CLIs run — fixed shape, in-graph
decode+NMS, (ids, scores, boxes) out — so a busy server amortizes exactly
like the offline path: one XLA dispatch per ``batch_size`` requests.  Up to
``max_in_flight`` batches are kept in flight (async XLA dispatch) so host
preprocessing of batch N+1 overlaps device compute of batch N.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class _Slot:
    """One pending request: caller blocks on ``done`` until filled."""

    __slots__ = ("done", "result", "error")

    def __init__(self):
        self.done = threading.Event()
        self.result: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
        self.error: Optional[BaseException] = None


class DetectionService:
    """Batches concurrent ``detect()`` calls onto one device program.

    Args:
      infer: jitted ``(variables, batch) -> (ids, scores, boxes)``,
        batch of shape (batch_size, H, W, 3) (``cli.common.make_predictor``).
      variables: model variables.
      transform: ``ValTransform`` — (rgb) -> (x, _, affine); its ``size``
        fixes (H, W).
      batch_size: device batch; also the max requests fused per dispatch.
      flush_ms: max time the batcher waits to fill a batch once it holds at
        least one request.  Bounds added latency at low load to ~flush_ms.
      max_in_flight: async dispatch depth (2 = double-buffered).
    """

    def __init__(
        self,
        infer: Callable,
        variables,
        transform,
        batch_size: int = 8,
        flush_ms: float = 5.0,
        max_in_flight: int = 2,
    ):
        self._infer = infer
        self._variables = variables
        self._transform = transform
        self._batch_size = int(batch_size)
        self._flush_s = float(flush_ms) / 1e3
        self._max_in_flight = max(1, int(max_in_flight))
        h, w = transform.size
        # match the transform's output dtype: uint8 when the transform
        # defers normalization to the device (ValTransform normalize=False)
        self._dtype = (
            np.float32 if getattr(transform, "normalize", True) else np.uint8
        )
        self._pad = np.zeros((h, w, 3), self._dtype)
        self._q: "queue.Queue" = queue.Queue(maxsize=4 * self._batch_size)
        self._stop = threading.Event()
        self._served = 0
        # rolling observability window (collections.deque is thread-safe
        # for append; read via stats())
        from collections import deque

        self._lat_ms = deque(maxlen=128)   # dispatch->settled, per batch
        self._fill = deque(maxlen=128)     # requests per dispatched batch
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # ---- caller side ----------------------------------------------------

    def detect(self, rgb: np.ndarray, timeout: Optional[float] = None):
        """Detect on one RGB uint8 image; blocks until the batch it joined
        completes.  Returns (ids, scores, boxes) with boxes in ORIGINAL
        image coordinates, padded rows id=-1 (the eval/detect protocol).
        Thread-safe; call from any number of threads.  Raises
        TimeoutError both when the queue is saturated (backpressure) and
        when the result misses the deadline; ``timeout`` bounds the TOTAL
        call, not each phase."""
        if self._stop.is_set():
            raise RuntimeError("DetectionService is closed")
        x, _, affine = self._transform(rgb)
        slot = _Slot()
        deadline = None if timeout is None else time.monotonic() + timeout
        try:
            self._q.put((slot, np.asarray(x, self._dtype), affine), timeout=timeout)
        except queue.Full:
            raise TimeoutError(
                "detection service overloaded (request queue full)"
            ) from None
        # Wait in bounded ticks so a close() racing this enqueue (after the
        # batcher's final drain) cannot strand the caller forever.
        while True:
            remaining = None if deadline is None else deadline - time.monotonic()
            if remaining is not None and remaining <= 0:
                raise TimeoutError("detection request timed out")
            tick = 0.5 if remaining is None else min(0.5, remaining)
            if slot.done.wait(tick):
                break
            if self._stop.is_set() and not self._thread.is_alive():
                raise RuntimeError("DetectionService closed while waiting")
        if slot.error is not None:
            raise slot.error
        return slot.result

    @property
    def served(self) -> int:
        return self._served

    def stats(self) -> dict:
        """Rolling service metrics over the last <=128 dispatched batches:
        dispatch-to-settled batch latency percentiles and mean batch
        occupancy (how full the continuous-batcher runs)."""
        lat = list(self._lat_ms)
        fill = list(self._fill)
        out = {"requests_served": self._served, "batches": len(lat)}
        if lat and fill:
            out["batch_latency_ms_p50"] = round(float(np.percentile(lat, 50)), 1)
            out["batch_latency_ms_p95"] = round(float(np.percentile(lat, 95)), 1)
            out["mean_batch_fill"] = round(float(np.mean(fill)), 2)
        return out

    def close(self):
        self._stop.set()
        # wake the batcher if it is blocked on an empty queue
        try:
            self._q.put_nowait(None)
        except queue.Full:
            pass
        self._thread.join(timeout=5.0)
        # fail any request that raced in after the batcher's final drain
        # (detect()'s ticked wait also notices the dead thread)
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[0].error = RuntimeError("service closed")
                item[0].done.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- batcher thread --------------------------------------------------

    def _collect(self, block: bool) -> List:
        """Take the first request (blocking only when nothing is in
        flight), then fill up to batch_size more within the flush
        deadline."""
        import time

        try:
            first = self._q.get(timeout=0.2) if block else self._q.get_nowait()
        except queue.Empty:
            return []
        if first is None:
            return []
        items = [first]
        deadline = time.perf_counter() + self._flush_s
        while len(items) < self._batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _dispatch(self, items: List):
        batch = np.stack([x for _, x, _ in items])
        if len(items) < self._batch_size:
            pad = np.broadcast_to(
                self._pad, (self._batch_size - len(items),) + self._pad.shape
            )
            batch = np.concatenate([batch, pad])
        return self._infer(self._variables, jnp.asarray(batch))  # async

    def _settle(self, items: List, result):
        """Sync one in-flight batch and fill its request slots.  Never
        raises — a device-side failure is forwarded to every still-waiting
        caller so none of them hangs."""
        from viddet_tpu.data.transforms import invert_affine_to_boxes

        try:
            ids, scores, boxes = (np.asarray(r) for r in result)  # sync point
            for i, (slot, _x, affine) in enumerate(items):
                slot.result = (
                    ids[i],
                    scores[i],
                    invert_affine_to_boxes(boxes[i], affine),
                )
                slot.done.set()
            self._served += len(items)
        except BaseException as exc:  # noqa: BLE001 — forwarded
            for slot, _x, _a in items:
                if not slot.done.is_set():
                    slot.error = exc
                    slot.done.set()

    def _run(self):
        pending: List[Tuple[List, object]] = []
        while not self._stop.is_set():
            # only block for traffic when nothing is in flight — with a
            # batch pending, an empty queue must settle it NOW, not after a
            # poll interval (the low-load latency bound is ~flush_ms +
            # device time; new requests pile up in the queue while the
            # settle's host fetch blocks, so throughput is unhurt)
            items = self._collect(block=not pending)
            if items:
                try:
                    pending.append(
                        (items, self._dispatch(items), time.perf_counter())
                    )
                except BaseException as exc:  # noqa: BLE001 — forwarded
                    for slot, _x, _a in items:
                        slot.error = exc
                        slot.done.set()
                    continue
            # drain: immediately when the queue went idle (latency),
            # otherwise only past the in-flight depth (throughput)
            while pending and (len(pending) >= self._max_in_flight or not items):
                p_items, p_result, t0 = pending.pop(0)
                self._settle(p_items, p_result)
                # fill first: stats() guards on lat, so a reader between
                # the two appends must never see lat ahead of fill
                self._fill.append(len(p_items))
                self._lat_ms.append((time.perf_counter() - t0) * 1e3)
        # shutdown: fail callers still enqueued, settle batches in flight
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[0].error = RuntimeError("service closed")
                item[0].done.set()
        for items, result, _t0 in pending:
            self._settle(items, result)
