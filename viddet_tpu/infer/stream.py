"""Streaming video detection — pipelined decode -> device -> drain.

The reference's detect loop is synchronous decode->infer->draw per batch
(SURVEY.md §4.3).  The rebuild hides per-frame latency behind decode:

  decode thread(s): VideoCapture read -> letterbox+normalize -> bounded queue
  submit loop:      assemble batch -> device_put -> jitted infer (ASYNC)
  drain:            previous batch's device results -> numpy -> rescale/draw

JAX dispatch is asynchronous, so simply keeping one batch in flight while
draining the previous one overlaps host decode, device compute, and host
post-processing — a software double-buffer without explicit streams (the
XLA equivalent of the reference's MXNet async engine, SURVEY.md §3.2 N1).

The model's fixed-shape in-graph NMS means the only device->host transfer is
(ids, scores, boxes): 100 rows/frame, ~2.4 KB — never feature maps.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from typing import Callable, Iterator, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from viddet_tpu.data.transforms import invert_affine_to_boxes


def stop_aware_put(q: "queue.Queue", item, stop: threading.Event) -> bool:
    """Blocking put that gives up once ``stop`` is set.

    An abandoned consumer must not strand a producer thread on a full
    queue forever (the loader's abandoned-iterator lesson,
    data/loader.py).  Returns False when the item was dropped."""
    while not stop.is_set():
        try:
            q.put(item, timeout=0.2)
            return True
        except queue.Full:
            continue
    return False


class FrameSource:
    """Decodes frames from a video file (or webcam index) on its own thread."""

    def __init__(self, path, transform, every: int = 1, queue_size: int = 64):
        import cv2

        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        self.fps = self._cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self._transform = transform
        self._every = every
        self._q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import cv2

        idx = 0
        while not self._stop.is_set():
            ok, frame = self._cap.read()
            if not ok:
                break
            if idx % self._every == 0:
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                x, _, affine = self._transform(rgb)
                if not self._put((idx, rgb, x, affine)):
                    break
            idx += 1
        self._cap.release()
        self._put(None)

    def _put(self, item) -> bool:
        return stop_aware_put(self._q, item, self._stop)

    def __iter__(self):
        # get() with a bounded timeout so close() wakes a blocked consumer
        # even when the decode thread exits without enqueueing the None
        # sentinel (its _put is refused once _stop is set).
        while True:
            try:
                item = self._q.get(timeout=0.2)
            except queue.Empty:
                if self._stop.is_set():
                    return
                continue
            if item is None:
                return
            yield item

    def close(self):
        self._stop.set()


class NativeFrameSource:
    """C++ decode-thread frame source (viddet_tpu.native).

    Yields (idx, None, preprocessed, affine): the original RGB frame is not
    materialized — this is the pure-throughput path (detections/stats, no
    drawing).  Use ``FrameSource`` when annotated output is needed.
    """

    def __init__(self, path, size: Tuple[int, int], every: int = 1,
                 letterbox_resize: bool = True, queue_size: int = 64,
                 normalize: bool = True):
        from viddet_tpu import native

        self._stream = native.NativeVideoStream(
            str(path), size, letterbox=letterbox_resize, every=every,
            ring_capacity=queue_size, normalize=normalize,
        )
        self.fps = self._stream.fps
        self.width = self._stream.width
        self.height = self._stream.height

    def __iter__(self):
        for idx, frame, affine in self._stream:
            yield idx, None, frame, affine

    def close(self):
        self._stream.close()


def stream_detect(
    source: Iterator,
    infer: Callable,
    variables,
    batch_size: int,
    input_shape: Tuple[int, int],
) -> Iterator[Tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Continuously-batched detection over a frame iterator.

    Yields (frame_idx, orig_frame, affine, ids, scores, boxes) per frame,
    in order, with one batch kept in flight on the device.
    """
    h, w = input_shape
    pending: List = []  # (meta list, device result)

    def submit(metas):
        batch = np.stack([m[2] for m in metas])
        if len(metas) < batch_size:
            pad = np.zeros((batch_size - len(metas), h, w, 3), batch.dtype)
            batch = np.concatenate([batch, pad])
        result = infer(variables, jnp.asarray(batch))  # async dispatch
        pending.append((metas, result))

    def drain():
        metas, result = pending.pop(0)
        ids, scores, boxes = (np.asarray(r) for r in result)  # sync point
        for i, (idx, rgb, _x, affine) in enumerate(metas):
            yield idx, rgb, affine, ids[i], scores[i], boxes[i]

    batch_metas: List = []
    for item in source:
        batch_metas.append(item)
        if len(batch_metas) == batch_size:
            submit(batch_metas)
            batch_metas = []
            if len(pending) >= 2:  # keep 1 in flight, drain the older
                yield from drain()
    if batch_metas:
        submit(batch_metas)
    while pending:
        yield from drain()


def stream_detect_video(
    path: str,
    infer: Callable,
    variables,
    transform,
    class_names: Sequence[str],
    *,
    output_dir: str,
    thresh: float = 0.5,
    batch_size: int = 8,
    every: int = 1,
    draw: bool = True,
    save_detections: bool = False,
    logger=None,
) -> dict:
    """Full video -> annotated video + optional per-frame det txts."""
    from viddet_tpu.utils.image import draw_detections
    from viddet_tpu.utils.video import VideoWriter

    os.makedirs(output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(str(path)))[0]
    if not draw and isinstance(path, str):
        # no annotated output needed -> the C++ decode path (falls back to
        # the cv2 thread if the native library is unavailable; webcam
        # indices always use the cv2 source)
        try:
            from viddet_tpu import native

            if native.available():
                source = NativeFrameSource(
                    path, transform.size, every=every,
                    letterbox_resize=getattr(transform, "letterbox_resize", True),
                    normalize=getattr(transform, "normalize", True),
                )
            else:
                source = FrameSource(path, transform, every=every)
        except Exception:
            source = FrameSource(path, transform, every=every)
    else:
        source = FrameSource(path, transform, every=every)

    writer = None
    det_file = None
    if draw:
        writer = VideoWriter(
            os.path.join(output_dir, f"{stem}_det.mp4"),
            source.fps / every,
            (source.width, source.height),
        )
    if save_detections:
        det_file = open(os.path.join(output_dir, f"{stem}_det.txt"), "w")

    t0 = time.perf_counter()
    n = 0
    try:
        for idx, rgb, affine, ids, scores, boxes in stream_detect(
            iter(source), infer, variables, batch_size, transform.size
        ):
            restored = invert_affine_to_boxes(boxes, affine)
            if det_file is not None:
                for cid, s, bb in zip(ids, scores, boxes):
                    if cid >= 0 and s >= thresh:
                        rb = invert_affine_to_boxes(bb[None], affine)[0]
                        det_file.write(
                            f"{idx} {class_names[int(cid)]} {s:.4f} "
                            f"{rb[0]:.1f} {rb[1]:.1f} {rb[2]:.1f} {rb[3]:.1f}\n"
                        )
            if writer is not None:
                writer.write(
                    draw_detections(rgb, restored, ids, scores, class_names, thresh)
                )
            n += 1
    finally:
        if writer is not None:
            writer.close()
        if det_file is not None:
            det_file.close()
    dt = time.perf_counter() - t0
    stats = {"frames": n, "seconds": dt, "fps": n / dt if dt > 0 else 0.0}
    if logger:
        logger.info(
            "video %s: %d frames in %.2fs (%.1f fps end-to-end)", stem, n, dt, stats["fps"]
        )
    return stats
