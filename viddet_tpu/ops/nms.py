"""Class-aware non-maximum suppression — pure-jnp reference implementation.

The reference runs NMS *inside* the model's forward graph (MXNet
``contrib.box_nms``, a native C++/CUDA op — SURVEY.md §3.2 N4) so the host
only ever sees fixed-size, already-suppressed detections.  We keep that
contract: everything here is fixed-shape, jit-safe, and returns padded
results plus validity, so the whole decode→NMS path stays on the TPU.

Semantics mirror ``contrib.box_nms(overlap_thresh, valid_thresh, topk,
id_index=0, score_index=1, coord_start=2, force_suppress=False)`` as used by
the GluonCV YOLOv3/SSD heads:

* candidates are sorted by score (descending); only the top-``topk`` survive
  to the suppression stage, the rest are dropped outright;
* suppression is greedy in score order; a candidate is suppressed when its
  IoU with an already-kept candidate exceeds ``iou_thresh``;
* with ``force_suppress=False`` suppression only applies between candidates
  of the same class id (class-aware NMS);
* candidates with score < ``valid_thresh`` are invalid;
* output is the surviving candidates in score order, padded with ``-1``.

A Pallas TPU kernel with identical semantics lives in ``nms_pallas.py`` and
is validated against this implementation; this file is the oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from viddet_tpu.ops.boxes import box_iou


def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """Greedy NMS keep mask over score-sorted candidates.

    Args:
      boxes:  (K, 4) corner boxes, already sorted by descending score.
      scores: (K,) descending scores (used only for validity ordering).
      valid:  (K,) bool — candidates eligible for keeping.
      iou_thresh: suppression overlap threshold.

    Returns:
      (K,) bool keep mask.  Greedy: iterate in score order; keep a candidate
      iff it is valid and not suppressed by any previously KEPT candidate.
    """
    del scores  # ordering is positional; scores only define `valid` upstream
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)  # (K, K)
    suppress = iou > iou_thresh
    idx = jnp.arange(k)

    def body(i, keep):
        # If candidate i is kept, suppress every later candidate overlapping it.
        row = suppress[i] & (idx > i)
        return jnp.where(keep[i], keep & ~row, keep)

    return jax.lax.fori_loop(0, k, body, valid)


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "valid_thresh", "topk", "post_nms"),
)
def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    iou_thresh: float = 0.45,
    valid_thresh: float = 0.01,
    topk: int = 400,
    post_nms: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched class-aware NMS over dense per-class scores.

    Each anchor contributes one candidate per class (the reference flattens
    (N, C) scores to N*C candidates before ``box_nms`` — SURVEY.md §4.4).

    Args:
      boxes:  (B, N, 4) decoded corner boxes (shared across classes).
      scores: (B, N, C) per-class scores (objectness * class prob).

    Returns:
      (ids, out_scores, out_boxes):
        ids        (B, post_nms)    float class ids, -1 for padding
        out_scores (B, post_nms)    scores, -1 for padding
        out_boxes  (B, post_nms, 4) corner boxes, -1 for padding
    """
    b, n, c = scores.shape

    def single(boxes_i, scores_i):
        flat = scores_i.reshape(-1)  # (N*C,) candidate per (anchor, class)
        k = min(topk, flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat, k)
        anchor_idx = top_idx // c
        cls_idx = (top_idx % c).astype(jnp.float32)
        cand_boxes = boxes_i[anchor_idx]  # (k, 4)
        valid = top_scores > valid_thresh

        # Class-aware suppression via the coordinate-offset trick: shift each
        # class into its own disjoint region so cross-class IoU is exactly 0.
        span = jnp.maximum(jnp.max(jnp.abs(cand_boxes)), 1.0) + 1.0
        offset = (cls_idx * 2.0 * span)[:, None]
        keep = nms_keep_mask(cand_boxes + offset, top_scores, valid, iou_thresh)

        # Compact kept candidates to the front (stable, score order preserved)
        # then truncate to post_nms.
        order = jnp.argsort(~keep, stable=True)
        take = order[:post_nms]
        kept = keep[take]
        out_ids = jnp.where(kept, cls_idx[take], -1.0)
        out_scores = jnp.where(kept, top_scores[take], -1.0)
        out_boxes = jnp.where(kept[:, None], cand_boxes[take], -1.0)
        return out_ids, out_scores, out_boxes

    return jax.vmap(single)(boxes, scores)
