"""Video utilities: probing, frame extraction, annotated-video writing.

Rebuild of the reference's ``utils/video.py`` (SURVEY.md §3.1 item 15) over
OpenCV's FFMPEG backend.  The high-throughput streaming path lives in
``infer/stream.py`` (+ the C++ decode library); these helpers cover the
offline frames-to-jpg / annotated-output workflows.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import cv2
import numpy as np


def probe_video(path: str) -> dict:
    """fps / frame count / resolution of a video file."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    info = {
        "fps": cap.get(cv2.CAP_PROP_FPS),
        "frame_count": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
        "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
    }
    cap.release()
    return info


def iterate_frames(
    path: str, every: int = 1, rgb: bool = True
) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (frame_index, frame) from a video, optionally every nth frame."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {path}")
    idx = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % every == 0:
                yield idx, cv2.cvtColor(frame, cv2.COLOR_BGR2RGB) if rgb else frame
            idx += 1
    finally:
        cap.release()


def extract_frames(
    video_path: str,
    out_dir: str,
    every: int = 1,
    ext: str = "jpg",
    quality: int = 95,
) -> int:
    """Video -> numbered frame images; returns number written."""
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for idx, frame in iterate_frames(video_path, every=every, rgb=False):
        out = os.path.join(out_dir, f"{idx:08d}.{ext}")
        cv2.imwrite(out, frame, [cv2.IMWRITE_JPEG_QUALITY, quality])
        count += 1
    return count


class VideoWriter:
    """Annotated-video writer (RGB frames in, mp4 out)."""

    def __init__(self, path: str, fps: float, size: Tuple[int, int]):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size
        )
        if not self._writer.isOpened():
            raise RuntimeError(f"cannot open VideoWriter for {path}")

    def write(self, frame_rgb: np.ndarray) -> None:
        self._writer.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))

    def close(self) -> None:
        self._writer.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
