"""Box math primitives (corner format ``[x1, y1, x2, y2]`` unless noted).

Pure ``jax.numpy`` — everything here is shape-polymorphic, jit-safe and
differentiable where meaningful.  These are the TPU-side equivalents of the
reference stack's box utilities (GluonCV ``bbox_iou`` / MXNet in-graph box
ops; reference mount was empty — see SURVEY.md §0 — so semantics follow the
standard VOC/COCO conventions the reference uses).

Conventions
-----------
* Boxes are ``(..., 4)`` arrays in corner format, in pixels.
* Invalid / padding boxes are all ``-1`` (the reference pads labels to the
  max object count with ``-1`` in its batchify step; we keep that contract).
* Widths/heights are computed WITHOUT the ``+1`` legacy VOC offset; the
  11-point VOC metric applies its own convention at eval time.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of corner-format boxes. ``(..., 4) -> (...)``; 0 for degenerate."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Pairwise IoU between two corner-format box sets.

    a: (..., N, 4), b: (..., M, 4)  ->  (..., N, M).
    Leading batch dims broadcast.  Degenerate boxes yield IoU 0.
    """
    a = a[..., :, None, :]  # (..., N, 1, 4)
    b = b[..., None, :, :]  # (..., 1, M, 4)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = box_area(a)
    area_b = box_area(b)
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, eps)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip corner boxes to ``[0, width] x [0, height]``."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def corner_to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """``[x1,y1,x2,y2] -> [cx,cy,w,h]``."""
    wh = boxes[..., 2:] - boxes[..., :2]
    c = boxes[..., :2] + 0.5 * wh
    return jnp.concatenate([c, wh], axis=-1)


def center_to_corner(boxes: jnp.ndarray) -> jnp.ndarray:
    """``[cx,cy,w,h] -> [x1,y1,x2,y2]``."""
    half = 0.5 * boxes[..., 2:]
    return jnp.concatenate([boxes[..., :2] - half, boxes[..., :2] + half], axis=-1)
