"""Multi-stream continuously-batched detection with temporal clip assembly.

The BASELINE north star describes inference as "continuously batched over
frame streams", and BASELINE config #5 is a temporal decode->batch->detect
stream (SURVEY.md §4.3/§4.5).  ``infer/stream.py`` pipelines ONE video with
single-frame models; this module generalizes both axes:

* **N sources -> one batch assembler.**  Each video decodes on its own
  thread (C++ FFmpeg ring or cv2 fallback) and feeds a shared ready queue;
  the submit loop fills fixed-size device batches with items from ANY
  stream, so one slow/ended stream never starves the chip.  Batches are
  drained in submit order, which preserves per-stream frame order (each
  stream enqueues in decode order).
* **Per-stream k-frame ring buffers.**  Temporal models consume
  ``(B, k, H, W, 3)`` clips predicting the CENTER frame; ``ClipBuffer``
  keeps the last k preprocessed frames per stream and emits a clip per
  ``stride`` frames once the window fills, so a VID-trained k-frame model
  runs on live video.  k=1 degenerates to plain frames.
* **Partial-batch flush on a deadline.**  Live sources (webcams) may not
  fill a batch promptly; ``flush_ms`` bounds the wait, padding the rest of
  the batch.  File sources always flush at end-of-stream.

The device program stays fixed-shape (one XLA compile): batches are padded
to ``batch_size`` and clip windows to ``k``.  The only device->host
transfer remains (ids, scores, boxes) — ~2.4 KB/frame.
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass
class StreamItem:
    """One ready unit of work: a frame (k=1) or a key-frame clip."""

    stream: str
    frame_idx: int  # index of the KEY frame within its stream
    rgb: Optional[np.ndarray]  # original key frame (None on the no-draw path)
    x: np.ndarray  # (H, W, 3) frame or (k, H, W, 3) clip, preprocessed
    affine: np.ndarray  # letterbox affine of the key frame


class ClipBuffer:
    """Per-stream sliding window turning frames into key-frame clips.

    Mirrors the VID dataset's window semantics (``data/imgnetvid.py``:
    ``window``/``stride``): a clip is the last ``k`` decoded frames and its
    prediction target is the CENTER frame (index ``k // 2`` from the
    oldest), matching ``models/temporal.py``.  One clip is emitted per
    ``stride`` pushed frames once the window is full, so stride=1 yields a
    detection for every frame after a (k - 1 - k//2)-frame lead-in delay.
    """

    def __init__(self, stream: str, k: int, stride: int = 1):
        if k < 1 or stride < 1:
            raise ValueError(f"k and stride must be >= 1, got {k}, {stride}")
        self.stream = stream
        self.k = k
        self.stride = stride
        self._frames: List[Tuple[int, Optional[np.ndarray], np.ndarray, np.ndarray]] = []
        self._pushed = 0

    def push(self, idx, rgb, x, affine) -> List[StreamItem]:
        """Add one decoded frame; return ready clips (0 or 1)."""
        self._frames.append((idx, rgb, x, affine))
        if len(self._frames) > self.k:
            self._frames.pop(0)
        self._pushed += 1
        if len(self._frames) < self.k or (self._pushed - self.k) % self.stride:
            return []
        key = self._frames[self.k // 2]
        # k=1 passes the frame through unwrapped (single-frame models take
        # (B, H, W, 3), not (B, 1, H, W, 3))
        clip = key[2] if self.k == 1 else np.stack([f[2] for f in self._frames])
        return [StreamItem(self.stream, key[0], key[1], clip, key[3])]

    def flush(self) -> List[StreamItem]:
        """End-of-stream: push duplicates of the final frame until the last
        real frame has served as a key, so the stream tail (the k-1-k//2
        frames past the final key) still gets detections.  The (k-1)//2
        lead-in frames at stream START are never keys — inherent to
        center-key windows, matching the VID dataset's window sampling."""
        if self.k == 1 or self._pushed == 0:
            return []
        out: List[StreamItem] = []
        last = self._frames[-1]
        for _ in range(self.k + self.stride):
            emitted = self.push(last[0], last[1], last[2], last[3])
            out.extend(emitted)
            if emitted and emitted[-1].frame_idx >= last[0]:
                break
        return out


@dataclass
class _SourceState:
    feeder: threading.Thread
    done: bool = False


@dataclass
class _StreamError:
    """Forwarded decode-thread failure; the consumer re-raises it."""

    stream: str
    exc: BaseException


def _put(out_q: "queue.Queue", item, stop: threading.Event) -> bool:
    from viddet_tpu.infer.stream import stop_aware_put

    return stop_aware_put(out_q, item, stop)


def _feeder(name: str, source, buf: ClipBuffer, out_q: "queue.Queue", stop: threading.Event):
    """Decode-side thread: drain one source through its clip buffer.

    Decode/transform errors are forwarded to the consumer (which re-raises)
    rather than silently truncating the stream."""
    try:
        try:
            for idx, rgb, x, affine in source:
                for item in buf.push(idx, rgb, x, affine):
                    _put(out_q, item, stop)
                if stop.is_set():
                    break
            if not stop.is_set():
                for item in buf.flush():
                    _put(out_q, item, stop)
        except Exception as exc:  # noqa: BLE001 — forwarded, not swallowed
            _put(out_q, _StreamError(name, exc), stop)
    finally:
        _put(out_q, name, stop)  # end-of-stream sentinel (str, not StreamItem)


def stream_detect_multi(
    sources: Dict[str, Iterator],
    infer: Callable,
    variables,
    batch_size: int,
    input_shape: Tuple[int, int],
    *,
    k: int = 1,
    stride: int = 1,
    flush_ms: float = 200.0,
    max_in_flight: int = 2,
) -> Iterator[Tuple[str, int, Optional[np.ndarray], np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Continuously-batched detection over N frame sources.

    Args:
      sources: name -> iterator of (idx, rgb, x, affine) (``FrameSource`` /
        ``NativeFrameSource`` from infer/stream.py).
      infer: jitted ``(variables, batch) -> (ids, scores, boxes)`` where
        batch is (B, H, W, 3) for k=1 or (B, k, H, W, 3) clips.
      k, stride: temporal window (1 = single-frame model).
      flush_ms: max wait for a full batch while any stream is live; a
        partial batch is padded and submitted at the deadline.
      max_in_flight: device batches kept in flight (async dispatch depth).

    Yields (stream, frame_idx, rgb, affine, ids, scores, boxes) — globally
    in batch-completion order, per-stream in frame order.
    """
    h, w = input_shape
    pad_shape = (k, h, w, 3) if k > 1 else (h, w, 3)

    ready: "queue.Queue" = queue.Queue(maxsize=4 * batch_size)
    stop = threading.Event()
    states: Dict[str, _SourceState] = {}
    for name, src in sources.items():
        buf = ClipBuffer(name, k, stride)
        t = threading.Thread(
            target=_feeder, args=(name, src, buf, ready, stop), daemon=True
        )
        states[name] = _SourceState(feeder=t)
        t.start()

    pending: List[Tuple[List[StreamItem], object]] = []

    def submit(items: List[StreamItem]):
        batch = np.stack([it.x for it in items])
        if len(items) < batch_size:
            pad = np.zeros((batch_size - len(items),) + pad_shape, batch.dtype)
            batch = np.concatenate([batch, pad])
        result = infer(variables, jnp.asarray(batch))  # async dispatch
        pending.append((items, result))

    def drain():
        items, result = pending.pop(0)
        # np.asarray is the sync point (block_until_ready can return early
        # on the axon platform — see bench.py).
        ids, scores, boxes = (np.asarray(r) for r in result)
        for i, it in enumerate(items):
            yield it.stream, it.frame_idx, it.rgb, it.affine, ids[i], scores[i], boxes[i]

    import time

    live = len(states)
    batch_items: List[StreamItem] = []
    # the flush deadline is anchored to the FIRST item of the partial batch
    # — a per-get timeout would reset on every frame, so any source faster
    # than 1000/flush_ms fps would never flush and the latency bound
    # would silently revert to the full-batch wait
    batch_deadline = 0.0
    try:
        while live > 0 or batch_items:
            if batch_items:
                wait = batch_deadline - time.monotonic()
            else:
                wait = flush_ms / 1e3 if live else 0.01
            item = None
            if wait > 0:
                try:
                    item = ready.get(timeout=wait)
                except queue.Empty:
                    item = None
            if isinstance(item, _StreamError):
                raise RuntimeError(
                    f"stream '{item.stream}' failed during decode"
                ) from item.exc
            if isinstance(item, str):  # end-of-stream sentinel
                states[item].done = True
                live -= 1
                continue
            if item is not None:
                if not batch_items:
                    batch_deadline = time.monotonic() + flush_ms / 1e3
                batch_items.append(item)
            if batch_items and (
                len(batch_items) == batch_size or item is None or live == 0
            ):
                submit(batch_items)
                batch_items = []
                if len(pending) >= max_in_flight:
                    yield from drain()
            elif item is None and pending:
                # queue went idle with nothing to submit: flush computed
                # results now instead of withholding them until the next
                # submit (a stalled live source would otherwise delay
                # already-finished detections indefinitely — mirrors
                # DetectionService._run's idle drain)
                yield from drain()
        while pending:
            yield from drain()
    finally:
        stop.set()


def stream_detect_videos(
    paths: Sequence[str],
    infer: Callable,
    variables,
    transform,
    class_names: Sequence[str],
    *,
    output_dir: str,
    thresh: float = 0.5,
    batch_size: int = 8,
    every: int = 1,
    k: int = 1,
    stride: int = 1,
    flush_ms: float = 200.0,
    draw: bool = True,
    save_detections: bool = False,
    logger=None,
) -> dict:
    """N videos -> per-stream annotated videos / det txts, one shared chip.

    The multi-video generalization of ``stream.stream_detect_video``
    (BASELINE config #5 when k > 1: temporal decode->batch->detect).
    ``flush_ms`` bounds how long a partial batch waits — the live-source
    (webcam) latency knob.
    """
    import time

    from viddet_tpu.data.transforms import invert_affine_to_boxes
    from viddet_tpu.utils.image import draw_detections
    from viddet_tpu.utils.video import VideoWriter

    os.makedirs(output_dir, exist_ok=True)
    sources = open_sources(
        paths, transform, every=every, prefer_native=True, need_rgb=draw
    )
    writers: Dict[str, VideoWriter] = {}
    det_files: Dict[str, object] = {}
    for name, src in sources.items():
        # 'a.mp4#1' must not collapse to the same stem as 'a.mp4' (splitext
        # would eat the '#1' with the extension) — keep the dedup tag.
        base, _, tag = name.partition("#")
        stem = os.path.splitext(base)[0] + (f"_{tag}" if tag else "")
        if draw:
            writers[name] = VideoWriter(
                os.path.join(output_dir, f"{stem}_det.mp4"),
                src.fps / every,
                (src.width, src.height),
            )
        if save_detections:
            det_files[name] = open(
                os.path.join(output_dir, f"{stem}_det.txt"), "w"
            )

    t0 = time.perf_counter()
    per_stream = {name: 0 for name in sources}
    try:
        for name, idx, rgb, affine, ids, scores, boxes in stream_detect_multi(
            {n: iter(s) for n, s in sources.items()},
            infer,
            variables,
            batch_size,
            transform.size,
            k=k,
            stride=stride,
            flush_ms=flush_ms,
        ):
            restored = invert_affine_to_boxes(boxes, affine)
            df = det_files.get(name)
            if df is not None:
                for cid, s, rb in zip(ids, scores, restored):
                    if cid >= 0 and s >= thresh:
                        df.write(
                            f"{idx} {class_names[int(cid)]} {s:.4f} "
                            f"{rb[0]:.1f} {rb[1]:.1f} {rb[2]:.1f} {rb[3]:.1f}\n"
                        )
            wr = writers.get(name)
            if wr is not None and rgb is not None:
                wr.write(
                    draw_detections(rgb, restored, ids, scores, class_names, thresh)
                )
            per_stream[name] += 1
    finally:
        for wr in writers.values():
            wr.close()
        for df in det_files.values():
            df.close()
        for src in sources.values():
            close = getattr(src, "close", None)
            if close is not None:
                close()
    dt = time.perf_counter() - t0
    n = sum(per_stream.values())
    stats = {
        "frames": n,
        "seconds": dt,
        "fps": n / dt if dt > 0 else 0.0,
        "per_stream": per_stream,
    }
    if logger:
        logger.info(
            "%d stream(s): %d frames in %.2fs (%.1f fps aggregate)",
            len(sources), n, dt, stats["fps"],
        )
    return stats


def open_sources(
    paths: Sequence[str],
    transform,
    *,
    every: int = 1,
    prefer_native: bool = True,
    need_rgb: bool = True,
) -> Dict[str, Iterator]:
    """name -> frame source for each video path (C++ decode when possible).

    Names are the basename, deduplicated with ``#i`` suffixes so the same
    file can be streamed twice (decode-scaling benchmarks do this).
    """
    from viddet_tpu.infer.stream import FrameSource, NativeFrameSource

    sources: Dict[str, Iterator] = {}
    for i, path in enumerate(paths):
        name = os.path.basename(str(path))
        if name in sources:
            name = f"{name}#{i}"
        src = None
        if prefer_native and not need_rgb and isinstance(path, str):
            try:
                from viddet_tpu import native

                if native.available():
                    src = NativeFrameSource(
                        path,
                        transform.size,
                        every=every,
                        letterbox_resize=getattr(transform, "letterbox_resize", True),
                        normalize=getattr(transform, "normalize", True),
                    )
            except Exception:
                src = None
        if src is None:
            src = FrameSource(path, transform, every=every)
        sources[name] = src
    return sources
