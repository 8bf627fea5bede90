"""In-step YOLOv3 training-target assignment (jittable, static shapes).

The reference splits target generation in two (SURVEY.md §3.1 item 9):
a CPU "prefetch" generator inside DataLoader workers (best-anchor matching)
plus an on-device "dynamic" generator (IoU ignore mask) merged in-graph.
On TPU we fold BOTH into the jitted train step, computed from padded ground
truth — this removes the host-side per-sample Python work that bottlenecks
the reference at high device throughput (SURVEY.md §4.1 hot-loop note).

Assignment rule (YOLOv3 paper §2.1 + recalled GluonCV semantics):
each ground-truth box is matched to the single anchor (of all scales) with
the highest shape-IoU (boxes concentric); that anchor's cell at that scale
becomes the positive.  Center targets are the sub-cell offsets in [0, 1),
scale targets are log(gt / anchor), box-loss weights are ``2 - w*h/area``.

Ground truth is padded to a fixed M with class id -1 (the reference pads
with -1 in batchify — SURVEY.md §2 L4→L2).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _shape_iou(wh_a: jnp.ndarray, wh_b: jnp.ndarray) -> jnp.ndarray:
    """IoU of concentric boxes given (..., 2) sizes. a:(M,2), b:(A,2) -> (M,A)."""
    inter = jnp.minimum(wh_a[:, None, 0], wh_b[None, :, 0]) * jnp.minimum(
        wh_a[:, None, 1], wh_b[None, :, 1]
    )
    area_a = wh_a[:, 0] * wh_a[:, 1]
    area_b = wh_b[:, 0] * wh_b[:, 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


@functools.partial(
    jax.jit, static_argnames=("image_size", "strides", "anchors", "num_classes")
)
def assign_targets(
    gt_boxes: jnp.ndarray,
    gt_ids: jnp.ndarray,
    gt_weights: jnp.ndarray | None = None,
    *,
    image_size: Tuple[int, int],
    strides: Tuple[int, ...],
    anchors: Tuple[Tuple[Tuple[float, float], ...], ...],
    num_classes: int,
) -> Dict[str, jnp.ndarray]:
    """Batched prefetch-style target assignment.

    Args:
      gt_boxes: (B, M, 4) corner boxes in input-pixel coords, -1 padded.
      gt_ids: (B, M) class ids, -1 for padding.
      gt_weights: (B, M) per-box objectness weight (mixup lambda), default 1.
      image_size: (H, W) network input size (static).
      strides / anchors: deepest-first, same ordering as the model's
        flattened anchor axis (models/yolo3.py docstring).

    Returns dict of (B, N, ...) arrays:
      objectness (B,N,1) in {0, w_m}; center (B,N,2); scale (B,N,2);
      weight (B,N,2) box-loss weight (0 where unmatched);
      class_onehot (B,N,C); class_mask (B,N,1) 1 at positives.
    """
    img_h, img_w = image_size
    b, m = gt_ids.shape
    if gt_weights is None:
        gt_weights = jnp.ones((b, m), jnp.float32)

    # Static per-scale layout: deepest-first flat offsets.
    grid_hw = [(img_h // s, img_w // s) for s in strides]
    counts = [h * w * len(a) for (h, w), a in zip(grid_hw, anchors)]
    n_total = sum(counts)
    starts = jnp.asarray(
        [sum(counts[:i]) for i in range(len(counts))], jnp.int32
    )
    anchors_flat = jnp.asarray(
        [a for scale in anchors for a in scale], jnp.float32
    )  # (A, 2), deepest-first
    num_per_scale = len(anchors[0])
    stride_of_scale = jnp.asarray(strides, jnp.float32)
    gridw_of_scale = jnp.asarray([w for (_, w) in grid_hw], jnp.int32)
    gridh_of_scale = jnp.asarray([h for (h, _) in grid_hw], jnp.int32)

    def single(boxes, ids, weights):
        wh = jnp.maximum(boxes[:, 2:4] - boxes[:, 0:2], 0.0)  # (M, 2)
        center = 0.5 * (boxes[:, 0:2] + boxes[:, 2:4])  # (M, 2)
        valid = (ids >= 0) & (wh[:, 0] > 0) & (wh[:, 1] > 0)

        iou = _shape_iou(wh, anchors_flat)  # (M, A)
        best = jnp.argmax(iou, axis=1)  # (M,)
        scale_idx = best // num_per_scale
        anchor_in_scale = best % num_per_scale

        stride = stride_of_scale[scale_idx]  # (M,)
        gw = gridw_of_scale[scale_idx]
        gh = gridh_of_scale[scale_idx]
        col = jnp.clip((center[:, 0] / stride).astype(jnp.int32), 0, gw - 1)
        row = jnp.clip((center[:, 1] / stride).astype(jnp.int32), 0, gh - 1)
        flat = (
            starts[scale_idx]
            + (row * gw + col) * num_per_scale
            + anchor_in_scale
        )
        flat = jnp.where(valid, flat, n_total)  # dummy slot for padding

        t_center = center / stride[:, None] - jnp.stack([col, row], -1).astype(
            jnp.float32
        )
        anchor_wh = anchors_flat[best]
        t_scale = jnp.log(jnp.maximum(wh, 1e-6) / anchor_wh)
        t_weight = jnp.broadcast_to(
            (2.0 - wh[:, 0] * wh[:, 1] / float(img_h * img_w))[:, None], (m, 2)
        )
        onehot = jax.nn.one_hot(jnp.maximum(ids, 0), num_classes)

        def scatter(shape, updates):
            buf = jnp.zeros((n_total + 1,) + shape, jnp.float32)
            return buf.at[flat].set(updates)[:n_total]

        return {
            "objectness": scatter((1,), weights[:, None] * valid[:, None]),
            "center": scatter((2,), t_center),
            "scale": scatter((2,), t_scale),
            "weight": scatter((2,), t_weight * valid[:, None]),
            "class_onehot": scatter((num_classes,), onehot),
            "class_mask": scatter((1,), valid[:, None].astype(jnp.float32)),
        }

    return jax.vmap(single)(gt_boxes, gt_ids, gt_weights)
