"""YOLOv3 training loss with in-graph dynamic ignore mask.

Semantics follow the recalled GluonCV ``YOLOV3Loss`` + dynamic target
generator the reference wires up (SURVEY.md §3.1 item 9, §4.1):

* objectness: sigmoid BCE; positives are matched anchors (target = mixup
  weight), anchors whose *predicted* box overlaps any GT above
  ``ignore_thresh`` (0.7) but are not positives are IGNORED (no gradient);
* center: sigmoid BCE against sub-cell offsets, weighted by the box-size
  weight (2 - wh/area), positives only;
* scale: L1 on raw log-scale predictions, same weighting;
* class: sigmoid BCE on one-hot (optionally label-smoothed), positives only.

Reduction: per-sample sums, mean over the batch — matching the reference's
"loss mean × element count, Trainer.step(batch_size)" arithmetic so learning
rates transfer.
"""

from __future__ import annotations


from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from viddet_tpu.ops.boxes import box_iou
from viddet_tpu.train.targets import assign_targets


def sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise sigmoid binary cross-entropy."""
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def yolo_loss(
    outputs: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_ids: jnp.ndarray,
    gt_weights: jnp.ndarray | None,
    *,
    image_size: Tuple[int, int],
    strides,
    anchors,
    num_classes: int,
    ignore_thresh: float = 0.7,
    label_smooth: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Compute the four YOLOv3 loss terms + total.

    Args:
      outputs: dict from ``YOLOv3.__call__`` (train mode).
      gt_boxes/gt_ids/gt_weights: padded ground truth (B, M, 4)/(B, M).
    """
    t = assign_targets(
        gt_boxes,
        gt_ids,
        gt_weights,
        image_size=image_size,
        strides=tuple(strides),
        anchors=tuple(tuple(tuple(a) for a in s) for s in anchors),
        num_classes=num_classes,
    )

    # Dynamic ignore mask from *predicted* boxes (no gradient through it).
    pred_boxes = jax.lax.stop_gradient(outputs["boxes"])  # (B, N, 4)
    iou = box_iou(pred_boxes, gt_boxes)  # (B, N, M)
    gt_valid = (gt_ids >= 0)[:, None, :]  # (B, 1, M)
    best_iou = jnp.max(jnp.where(gt_valid, iou, 0.0), axis=-1, keepdims=True)
    ignore = (best_iou > ignore_thresh).astype(jnp.float32)  # (B, N, 1)

    pos = (t["objectness"] > 0).astype(jnp.float32)  # (B, N, 1)
    obj_mask = jnp.maximum(pos, 1.0 - ignore)  # gradient everywhere but ignored

    b = gt_boxes.shape[0]

    def reduce(x):
        return jnp.sum(x.reshape(b, -1), axis=1).mean()

    raw_obj = outputs["raw_obj"].astype(jnp.float32)
    raw_cls = outputs["raw_cls"].astype(jnp.float32)
    obj_loss = reduce(sigmoid_bce(raw_obj, t["objectness"]) * obj_mask)
    center_loss = reduce(
        sigmoid_bce(outputs["raw_xy"], t["center"]) * t["weight"] * pos
    )
    scale_loss = reduce(jnp.abs(outputs["raw_wh"] - t["scale"]) * t["weight"] * pos)

    cls_t = t["class_onehot"]
    if label_smooth:
        smooth = min(1.0 / num_classes, 1.0 / 40.0)
        cls_t = jnp.where(cls_t > 0.5, cls_t - smooth, smooth)
    cls_loss = reduce(sigmoid_bce(raw_cls, cls_t) * t["class_mask"] * pos)

    total = obj_loss + center_loss + scale_loss + cls_loss
    return {
        "obj": obj_loss,
        "center": center_loss,
        "scale": scale_loss,
        "cls": cls_loss,
        "total": total,
    }
