"""Host-side image/label transforms (numpy + OpenCV).

Rebuild of the reference's ``YOLO3DefaultTrainTransform`` /
``YOLO3DefaultValTransform`` (SURVEY.md §3.1 item 10): random color distort,
random expand with mean fill, random IoU-constrained crop, resize, random
horizontal flip, normalization — minus the CPU prefetch target generation,
which the rebuild runs inside the jitted train step (train/targets.py).

All randomness flows through an explicit ``numpy.random.Generator`` so
transforms are deterministic under a fixed seed (tested).

Geometry notes:
* ``letterbox`` is the aspect-preserving resize+pad used by the streaming
  inference path (BASELINE.json north star names it explicitly); it returns
  the scale/offset needed to map detections back to original coordinates.
* ``resize_plain`` is the squash-to-size resize of the recalled GluonCV val
  transform.  Exact interpolation parity with MXNet ``interp=9`` is flagged
  unverifiable while the reference mount is empty (SURVEY.md §8 hard part 4);
  both entry points take an ``interp`` argument so the fix stays localized.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize(image: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> float32 normalized by ImageNet stats.

    In-place on one f32 buffer — the same float ops in the same order as
    the naive ``(x/255 - mean)/std`` expression (bit-identical results),
    without its three full-image temporaries (this runs per sample on the
    host loader's critical path).
    """
    out = image.astype(np.float32)
    out /= 255.0
    out -= IMAGENET_MEAN
    out /= IMAGENET_STD
    return out


def denormalize(image: np.ndarray) -> np.ndarray:
    return np.clip((image * IMAGENET_STD + IMAGENET_MEAN) * 255.0, 0, 255).astype(
        np.uint8
    )


def resize_plain(
    image: np.ndarray, size: Tuple[int, int], interp: int = cv2.INTER_LINEAR
) -> Tuple[np.ndarray, np.ndarray]:
    """Squash-resize to (h, w). Returns (image, affine [sx, sy, 0, 0])."""
    h, w = size
    resized = cv2.resize(image, (w, h), interpolation=interp)
    sx = w / image.shape[1]
    sy = h / image.shape[0]
    return resized, np.array([sx, sy, 0.0, 0.0], np.float32)


def letterbox(
    image: np.ndarray,
    size: Tuple[int, int],
    pad_value: int = 128,
    interp: int = cv2.INTER_LINEAR,
) -> Tuple[np.ndarray, np.ndarray]:
    """Aspect-preserving resize + centered pad to (h, w).

    Returns (image, affine [s, s, dx, dy]) with box mapping
    ``out = in * s + (dx, dy)``.
    """
    h, w = size
    ih, iw = image.shape[:2]
    s = min(h / ih, w / iw)
    nh, nw = int(round(ih * s)), int(round(iw * s))
    resized = cv2.resize(image, (nw, nh), interpolation=interp)
    out = np.full((h, w, image.shape[2]), pad_value, image.dtype)
    dy, dx = (h - nh) // 2, (w - nw) // 2
    out[dy : dy + nh, dx : dx + nw] = resized
    return out, np.array([s, s, dx, dy], np.float32)


def apply_affine_to_boxes(boxes: np.ndarray, affine: np.ndarray) -> np.ndarray:
    """Apply [sx, sy, dx, dy] to corner boxes (padding rows of -1 preserved)."""
    out = boxes.copy()
    valid = (boxes[:, :4] >= 0).all(axis=1)
    sx, sy, dx, dy = affine
    out[valid, 0] = boxes[valid, 0] * sx + dx
    out[valid, 1] = boxes[valid, 1] * sy + dy
    out[valid, 2] = boxes[valid, 2] * sx + dx
    out[valid, 3] = boxes[valid, 3] * sy + dy
    return out


def invert_affine_to_boxes(boxes: np.ndarray, affine: np.ndarray) -> np.ndarray:
    """Map network-input-coordinate boxes back to original image coords."""
    sx, sy, dx, dy = affine
    out = boxes.copy()
    out[..., 0] = (boxes[..., 0] - dx) / sx
    out[..., 1] = (boxes[..., 1] - dy) / sy
    out[..., 2] = (boxes[..., 2] - dx) / sx
    out[..., 3] = (boxes[..., 3] - dy) / sy
    return out


# ---------------------------------------------------------------------------
# Random augmentations (training)
# ---------------------------------------------------------------------------


def random_color_distort(
    image: np.ndarray,
    rng: np.random.Generator,
    brightness_delta: int = 32,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: int = 18,
) -> np.ndarray:
    """Photometric distortions, uint8 in/out (brightness, contrast, sat, hue).

    Implemented as 256-entry uint8 LUTs (``cv2.LUT``): a LUT precomputes
    the exact same f32 op chain once per possible pixel value instead of
    once per pixel, cutting the full-image float passes (~9 ms/416px image
    -> well under 1 ms on the loader's critical path).  Per transformed
    channel the output is bit-identical to the direct float chain; the
    RGB->HSV->RGB round trip — itself lossy on uint8 — is skipped entirely
    when neither saturation nor hue fires (a strict quality improvement).
    RNG draw order is unchanged, so seeded determinism is preserved.
    """
    b = c = None
    if rng.random() < 0.5:
        b = rng.uniform(-brightness_delta, brightness_delta)
    if rng.random() < 0.5:
        c = rng.uniform(*contrast_range)
    if b is not None or c is not None:
        lut = np.arange(256, dtype=np.float32)
        if b is not None:
            lut = lut + np.float32(b)
        if c is not None:
            lut = lut * np.float32(c)
        image = cv2.LUT(image, np.clip(lut, 0, 255).astype(np.uint8))
    k = d = None
    if rng.random() < 0.5:
        k = rng.uniform(*saturation_range)
    if rng.random() < 0.5:
        d = rng.uniform(-hue_delta, hue_delta)
    if k is not None or d is not None:
        hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
        h_ch, s_ch, v_ch = cv2.split(hsv)
        if k is not None:
            s_lut = np.clip(
                np.arange(256, dtype=np.float32) * np.float32(k), 0, 255
            ).astype(np.uint8)
            s_ch = cv2.LUT(s_ch, s_lut)
        if d is not None:
            # uint8 HSV hue lives in [0, 180); inputs never exceed 179
            h_lut = (
                (np.arange(256, dtype=np.float32) + np.float32(d)) % 180
            ).astype(np.uint8)
            h_ch = cv2.LUT(h_ch, h_lut)
        image = cv2.cvtColor(
            cv2.merge([h_ch, s_ch, v_ch]), cv2.COLOR_HSV2RGB
        )
    return image


def random_expand(
    image: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    max_ratio: float = 4.0,
    fill: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Place the image on a larger mean-filled canvas (zoom-out aug)."""
    if max_ratio <= 1.0 or rng.random() < 0.5:
        return image, boxes
    h, w, c = image.shape
    ratio = rng.uniform(1.0, max_ratio)
    oh, ow = int(h * ratio), int(w * ratio)
    off_y = int(rng.uniform(0, oh - h))
    off_x = int(rng.uniform(0, ow - w))
    if fill is None:
        fill = (IMAGENET_MEAN * 255.0).astype(image.dtype)
    # copyMakeBorder writes only the border region (the naive
    # fill-whole-canvas-then-paste double-writes the interior — measurable
    # at expand ratios up to 4x on the loader's critical path)
    value = [float(v) for v in np.broadcast_to(fill, (c,))]
    canvas = cv2.copyMakeBorder(
        image, off_y, oh - h - off_y, off_x, ow - w - off_x,
        cv2.BORDER_CONSTANT, value=value,
    )
    return canvas, apply_affine_to_boxes(boxes, np.array([1, 1, off_x, off_y], np.float32))


def random_crop_with_constraints(
    image: np.ndarray,
    boxes: np.ndarray,
    rng: np.random.Generator,
    min_scale: float = 0.3,
    max_aspect_ratio: float = 2.0,
    constraints=((0.1,), (0.3,), (0.5,), (0.7,), (0.9,), (None,)),
    max_trial: int = 50,
) -> Tuple[np.ndarray, np.ndarray]:
    """SSD-style random crop: sampled crops must reach a min IoU with GT.

    Boxes whose centers fall outside the crop are dropped (set to -1).

    RNG-stream note: the vectorized trial scan draws all ``max_trial``
    scale/aspect values (and cy/cx) per constraint up front, where the
    pre-vectorization loop stopped at the first passing trial and skipped
    cy/cx for full-coverage crops.  The sampling *distribution* is
    unchanged, but a fixed seed no longer reproduces pre-change
    augmentation sequences (unlike random_color_distort, whose LUT
    rewrite kept draw order).
    """
    h, w = image.shape[:2]
    valid = boxes[:, 4] >= 0 if boxes.shape[1] > 4 else (boxes[:, :4] >= 0).all(1)
    if not valid.any():
        return image, boxes
    gt = boxes[valid, :4]
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    candidates = []
    for (min_iou,) in constraints:
        # All max_trial samples for this constraint are drawn and scored in
        # one vectorized batch; the sequential-scan semantics (the first
        # trial meeting the IoU bar wins) are kept by taking the lowest
        # passing index.  ~50 python-loop iterations of scalar numpy ops
        # collapse to ~10 vector ops (~2 ms -> ~0.1 ms per sample).
        scale = rng.uniform(min_scale, 1.0, size=max_trial)
        ar = rng.uniform(
            np.maximum(1.0 / max_aspect_ratio, scale * scale),
            np.minimum(max_aspect_ratio, 1.0 / (scale * scale)),
        )
        ch = (h * scale / np.sqrt(ar)).astype(np.int64)
        cw = (w * scale * np.sqrt(ar)).astype(np.int64)
        cy = np.where(
            ch < h,
            (rng.uniform(0.0, 1.0, size=max_trial) * (h - ch)).astype(np.int64),
            0,
        )
        cx = np.where(
            cw < w,
            (rng.uniform(0.0, 1.0, size=max_trial) * (w - cw)).astype(np.int64),
            0,
        )
        crops = np.stack(
            [cx, cy, cx + cw, cy + ch], axis=1
        ).astype(np.float32)
        if min_iou is None:
            candidates.append(crops[0])
            continue
        ix1 = np.maximum(gt[:, 0], crops[:, 0:1])
        iy1 = np.maximum(gt[:, 1], crops[:, 1:2])
        ix2 = np.minimum(gt[:, 2], crops[:, 2:3])
        iy2 = np.minimum(gt[:, 3], crops[:, 3:4])
        inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)  # (n, G)
        area_c = (cw * ch).astype(np.float32)[:, None]
        iou = inter / np.maximum(area_g + area_c - inter, 1e-12)
        ok = iou.min(axis=1) >= min_iou
        first = int(np.argmax(ok))
        if ok[first]:
            candidates.append(crops[first])
    if not candidates:
        return image, boxes
    crop = candidates[int(rng.integers(len(candidates)))]
    cx1, cy1, cx2, cy2 = crop.astype(int)
    new_boxes = boxes.copy()
    centers = 0.5 * (boxes[:, :2] + boxes[:, 2:4])
    keep = (
        valid
        & (centers[:, 0] >= cx1)
        & (centers[:, 0] < cx2)
        & (centers[:, 1] >= cy1)
        & (centers[:, 1] < cy2)
    )
    new_boxes[~keep] = -1.0
    if keep.any():
        nb = new_boxes[keep]
        nb[:, 0] = np.clip(nb[:, 0] - cx1, 0, cx2 - cx1)
        nb[:, 1] = np.clip(nb[:, 1] - cy1, 0, cy2 - cy1)
        nb[:, 2] = np.clip(nb[:, 2] - cx1, 0, cx2 - cx1)
        nb[:, 3] = np.clip(nb[:, 3] - cy1, 0, cy2 - cy1)
        new_boxes[keep] = nb
    return image[cy1:cy2, cx1:cx2], new_boxes


def random_hflip(
    image: np.ndarray, boxes: np.ndarray, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    if rng.random() < 0.5:
        return image, boxes
    w = image.shape[1]
    flipped = image[:, ::-1]
    out = boxes.copy()
    valid = (boxes[:, :4] >= 0).all(axis=1)
    out[valid, 0] = w - boxes[valid, 2]
    out[valid, 2] = w - boxes[valid, 0]
    return np.ascontiguousarray(flipped), out


# ---------------------------------------------------------------------------
# End-to-end transforms
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainTransform:
    """Full YOLO training transform: distort/expand/crop/resize/flip/norm.

    ``normalize=False`` keeps the sample uint8 end-to-end — the whole
    augmentation chain already runs in uint8 — and defers the ImageNet
    normalization to the jitted train step (train/loop.py normalizes
    uint8 batches in-graph): 4x smaller host->device batch transfers and
    one fewer full-image float pass per sample on the loader's critical
    path.
    """

    size: Tuple[int, int]  # (h, w)
    mixup: bool = False
    letterbox_resize: bool = False
    normalize: bool = True

    def __call__(self, image: np.ndarray, label: np.ndarray, rng: np.random.Generator):
        """image uint8 HWC RGB, label (M, 6) [x1 y1 x2 y2 cls difficult].

        Returns (image float32 normalized — or uint8 with
        ``normalize=False`` — and the transformed label).
        """
        image = random_color_distort(image, rng)
        image, label = random_expand(image, label, rng)
        image, label = random_crop_with_constraints(image, label, rng)
        if self.letterbox_resize:
            image, affine = letterbox(image, self.size)
        else:
            image, affine = resize_plain(image, self.size)
        label = apply_affine_to_boxes(label, affine)
        image, label = random_hflip(image, label, rng)
        return (normalize(image) if self.normalize else image), label


@dataclasses.dataclass
class ValTransform:
    """Deterministic eval/inference transform: resize + normalize.

    ``normalize=False`` returns the resized uint8 image instead — the
    device-normalize path for streaming/serving: frames cross host->device
    at 1/4 the bytes and the identical ``(x/255 - mean)/std`` runs fused
    on-chip (``cli.common.make_predictor`` normalizes uint8 inputs).
    """

    size: Tuple[int, int]
    letterbox_resize: bool = False
    normalize: bool = True

    def __call__(self, image: np.ndarray, label: Optional[np.ndarray] = None):
        if self.letterbox_resize:
            image, affine = letterbox(image, self.size)
        else:
            image, affine = resize_plain(image, self.size)
        if label is not None:
            label = apply_affine_to_boxes(label, affine)
        return (normalize(image) if self.normalize else image), label, affine
