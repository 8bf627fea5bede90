"""Box drawing / per-class colors (rebuild of the reference's utils/image.py,
SURVEY.md §3.1 item 16)."""

from __future__ import annotations

import colorsys
from typing import Optional, Sequence

import cv2
import numpy as np


def class_colors(num_classes: int) -> np.ndarray:
    """Deterministic visually-distinct BGR colors, one per class."""
    colors = []
    for i in range(max(num_classes, 1)):
        h = (i * 0.618033988749895) % 1.0
        r, g, b = colorsys.hsv_to_rgb(h, 0.8, 0.95)
        colors.append((int(b * 255), int(g * 255), int(r * 255)))
    return np.asarray(colors, np.int32)


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    ids: np.ndarray,
    scores: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    thresh: float = 0.5,
) -> np.ndarray:
    """Draw detections on an RGB uint8 image (returns a copy).

    boxes (K, 4) corner coords in image pixels; ids/scores (K,); padding -1.
    """
    out = image.copy()
    num_classes = len(class_names) if class_names else int(max(ids.max(), 0)) + 1
    colors = class_colors(num_classes)
    for box, cid, score in zip(boxes, ids, scores):
        if cid < 0 or score < thresh:
            continue
        cid = int(cid)
        color = tuple(int(c) for c in colors[cid % len(colors)])
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        name = class_names[cid] if class_names and cid < len(class_names) else str(cid)
        label = f"{name} {score:.2f}"
        (tw, th), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        cv2.rectangle(out, (x1, y1 - th - 6), (x1 + tw + 2, y1), color, -1)
        cv2.putText(
            out, label, (x1 + 1, y1 - 4), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
            (255, 255, 255), 1, cv2.LINE_AA,
        )
    return out


def exif_orientation(path: str, max_scan: int = 65536) -> int:
    """EXIF Orientation tag (1..8) of a JPEG file, or 1 when absent.

    The C++ batch decoder (native/decode.cpp) decodes the raw raster with
    no EXIF handling, while cv2.imread auto-applies orientation; callers
    use this to keep EXIF-rotated files OFF the native path so detections,
    det txts, and drawings all live in the same (rotated) frame.  Pure
    header scan — no decode, one bounded read.
    """
    import struct as _struct

    try:
        with open(path, "rb") as f:
            head = f.read(max_scan)
    except OSError:
        return 1
    if not head.startswith(b"\xff\xd8"):
        return 1
    i = 2
    while i + 4 <= len(head):
        if head[i] != 0xFF:
            break
        marker = head[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            i += 2  # standalone markers carry no length
            continue
        seg_len = int.from_bytes(head[i + 2 : i + 4], "big")
        if seg_len < 2:
            break
        if marker == 0xE1 and head[i + 4 : i + 10] == b"Exif\x00\x00":
            tiff = head[i + 10 : i + 2 + seg_len]
            if len(tiff) < 8 or tiff[:2] not in (b"II", b"MM"):
                return 1
            endian = "<" if tiff[:2] == b"II" else ">"
            try:
                ifd = _struct.unpack_from(endian + "I", tiff, 4)[0]
                count = _struct.unpack_from(endian + "H", tiff, ifd)[0]
                for k in range(count):
                    off = ifd + 2 + k * 12
                    tag = _struct.unpack_from(endian + "H", tiff, off)[0]
                    if tag == 0x0112:
                        val = _struct.unpack_from(
                            endian + "H", tiff, off + 8
                        )[0]
                        return val if 1 <= val <= 8 else 1
            except _struct.error:
                return 1
            return 1
        if marker == 0xDA:  # start of scan: no EXIF past image data
            break
        i += 2 + seg_len
    return 1
