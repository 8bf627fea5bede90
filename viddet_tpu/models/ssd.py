"""SSD-512 (ResNet-50) — single-shot detector with in-graph decode + NMS.

Capability parity with the reference's SSD support (GluonCV
``model_zoo/ssd`` — SURVEY.md §3.1 item 21; in scope per BASELINE.json
config #3).  TPU-first design mirrors the YOLOv3 rebuild: static anchor
grids folded into the graph as constants, targets assigned inside the
jitted train step, softmax-score two-stage top-k + class-aware NMS on
device, fixed-shape padded outputs.

Structure (SSD512 arrangement):
  ResNet-50 c3/c4/c5 (strides 8/16/32) + 4 extra stride-2 conv blocks
  (strides 64/128/256/512) -> 7 feature maps; per-map 3x3 class and box
  convs with (len(ratios)+1) anchors per cell; box deltas use the standard
  (0.1, 0.2) center/size variances; matching: IoU >= 0.5 plus per-GT
  best-anchor forcing; loss: softmax CE with 3:1 in-graph hard-negative
  mining + SmoothL1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY
from viddet_tpu.models.resnet import ResNet50, _ConvBN
from viddet_tpu.ops.boxes import box_iou
from viddet_tpu.ops.nms import multiclass_nms_dense_two_stage

# SSD512 layer config: stride, anchor size s_k, next size s_{k+1}, ratios
SSD512_STRIDES = (8, 16, 32, 64, 128, 256, 512)
SSD512_SIZES = (35.84, 76.8, 153.6, 230.4, 307.2, 384.0, 460.8, 537.6)
SSD512_RATIOS = (
    (1.0, 2.0, 0.5),
    (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0),
    (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0),
    (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0),
    (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0),
    (1.0, 2.0, 0.5),
    (1.0, 2.0, 0.5),
)
BOX_VARIANCES = (0.1, 0.1, 0.2, 0.2)


def anchors_per_cell(ratios: Sequence[float]) -> int:
    return len(ratios) + 1  # extra geometric-mean-size square box


def _layer_anchors(fh: int, fw: int, stride: int, layer_idx: int) -> np.ndarray:
    """(fh*fw*A, 4) corner anchors for one feature map, (row, col, anchor)
    ordering to match the head reshape."""
    ratios = SSD512_RATIOS[layer_idx]
    s = SSD512_SIZES[layer_idx]
    s_next = SSD512_SIZES[layer_idx + 1]
    whs = [(s, s), (math.sqrt(s * s_next), math.sqrt(s * s_next))]
    for r in ratios:
        if r == 1.0:
            continue
        whs.append((s * math.sqrt(r), s / math.sqrt(r)))
    cx, cy = np.meshgrid(
        (np.arange(fw) + 0.5) * stride, (np.arange(fh) + 0.5) * stride
    )
    for_layer = []
    for w, h in whs:
        for_layer.append(
            np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
        )
    layer = np.stack(for_layer, axis=2)  # (fh, fw, A, 4)
    return layer.reshape(-1, 4)


def generate_ssd_anchors(image_size: int) -> np.ndarray:
    """Static (N, 4) corner anchors for all 7 maps (numpy; graph constant).

    Feature-map sizes follow SAME-padding stride-2 convs: ceil division.
    """
    all_anchors = []
    for li, stride in enumerate(SSD512_STRIDES):
        fm = max(-(-image_size // stride), 1)
        all_anchors.append(_layer_anchors(fm, fm, stride, li))
    return np.concatenate(all_anchors, axis=0).astype(np.float32)


class SSD(nn.Module):
    """SSD-512 ResNet-50.  ``__call__`` returns:
      cls_logits (B, N, C+1)  (background = class 0), compute dtype
      box_deltas (B, N, 4)    float32
      anchors    (N, 4)       corner, float32 (graph constant)
      boxes      (B, N, 4)    decoded corner boxes, float32
    """

    num_classes: int  # foreground classes
    image_size: int = 512
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None
    # Backbone stage overrides (None = ResNet-50). Lets tests and small
    # deployments run the SAME SSD graph (anchors, matching, OHEM, NMS)
    # over a shallow ResNet — compile-bound CPU gates use (1,1,1,1).
    backbone_blocks: tuple | None = None
    backbone_widths: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        if self.backbone_blocks is not None:
            kw["BLOCKS"] = self.backbone_blocks
        if self.backbone_widths is not None:
            kw["WIDTHS"] = self.backbone_widths
        feats = ResNet50(**kw)(x, train)[1:]  # c3, c4, c5
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        y = feats[-1]
        extras = []
        for ch in (512, 256, 256, 256):
            y = _ConvBN(ch // 2, 1, 1, **kw)(y, train)
            y = _ConvBN(ch, 3, 2, **kw)(y, train)
            extras.append(y)
        maps = list(feats) + extras  # strides 8..512

        cls_outs, box_outs, anchor_parts = [], [], []
        for i, (fm, ratios) in enumerate(zip(maps, SSD512_RATIOS)):
            a = anchors_per_cell(ratios)
            anchor_parts.append(
                _layer_anchors(fm.shape[1], fm.shape[2], SSD512_STRIDES[i], i)
            )
            cls = nn.Conv(
                a * (self.num_classes + 1), (3, 3), padding="SAME",
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name=f"cls_pred_{i}",
            )(fm)
            box = nn.Conv(
                a * 4, (3, 3), padding="SAME",
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name=f"box_pred_{i}",
            )(fm)
            b, h, w, _ = cls.shape
            cls_outs.append(cls.reshape(b, h * w * a, self.num_classes + 1))
            box_outs.append(box.reshape(b, h * w * a, 4).astype(jnp.float32))

        cls_logits = jnp.concatenate(cls_outs, axis=1)
        box_deltas = jnp.concatenate(box_outs, axis=1)
        anchors = jnp.asarray(
            np.concatenate(anchor_parts, axis=0).astype(np.float32)
        )
        boxes = decode_ssd_boxes(box_deltas, anchors)
        return {
            "cls_logits": cls_logits,
            "box_deltas": box_deltas,
            "anchors": anchors,
            "boxes": boxes,
        }


def encode_ssd_boxes(gt_boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Corner GT (…, 4) vs corner anchors (…, 4) -> variance-scaled deltas."""
    vx, vy, vw, vh = BOX_VARIANCES
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    acx = anchors[..., 0] + 0.5 * aw
    acy = anchors[..., 1] + 0.5 * ah
    gw = jnp.maximum(gt_boxes[..., 2] - gt_boxes[..., 0], 1e-6)
    gh = jnp.maximum(gt_boxes[..., 3] - gt_boxes[..., 1], 1e-6)
    gcx = gt_boxes[..., 0] + 0.5 * gw
    gcy = gt_boxes[..., 1] + 0.5 * gh
    return jnp.stack(
        [
            (gcx - acx) / (aw * vx),
            (gcy - acy) / (ah * vy),
            jnp.log(gw / aw) / vw,
            jnp.log(gh / ah) / vh,
        ],
        axis=-1,
    )


def decode_ssd_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    vx, vy, vw, vh = BOX_VARIANCES
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    acx = anchors[..., 0] + 0.5 * aw
    acy = anchors[..., 1] + 0.5 * ah
    cx = deltas[..., 0] * vx * aw + acx
    cy = deltas[..., 1] * vy * ah + acy
    w = jnp.exp(jnp.clip(deltas[..., 2] * vw, -10.0, 10.0)) * aw
    h = jnp.exp(jnp.clip(deltas[..., 3] * vh, -10.0, 10.0)) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def assign_ssd_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_ids: jnp.ndarray,
    match_thresh: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-batch matching.  Returns (cls_target (B,N) int32 with 0=bg,
    box_target (B,N,4) encoded deltas).

    Rules: each anchor matches its best-IoU GT if IoU >= thresh; each GT's
    single best anchor is force-matched (standard SSD bipartite + threshold).
    """

    def single(gt_b, gt_i):
        valid = gt_i >= 0
        iou = box_iou(anchors, gt_b)  # (N, M)
        iou = jnp.where(valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)  # (N,)
        best_iou = jnp.max(iou, axis=1)
        matched = best_iou >= match_thresh

        # force-match: for each valid GT, its argmax anchor.  Invalid
        # (padded) GTs all argmax to anchor 0; with duplicate scatter indices
        # the winner is undefined, so route them to an out-of-range slot and
        # drop — only valid GTs ever scatter.
        best_anchor = jnp.argmax(iou, axis=0)  # (M,)
        safe_anchor = jnp.where(valid, best_anchor, anchors.shape[0])
        forced = (
            jnp.zeros(anchors.shape[0], bool)
            .at[safe_anchor]
            .set(True, mode="drop")
        )
        forced_gt = (
            jnp.zeros(anchors.shape[0], jnp.int32)
            .at[safe_anchor]
            .set(jnp.arange(gt_b.shape[0], dtype=jnp.int32), mode="drop")
        )
        assigned_gt = jnp.where(forced, forced_gt, best_gt)
        matched = matched | forced

        cls_target = jnp.where(
            matched, gt_i[assigned_gt].astype(jnp.int32) + 1, 0
        )
        box_target = encode_ssd_boxes(gt_b[assigned_gt], anchors)
        box_target = jnp.where(matched[:, None], box_target, 0.0)
        return cls_target, box_target

    return jax.vmap(single)(gt_boxes, gt_ids)


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def ssd_loss(
    outputs: Dict[str, jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_ids: jnp.ndarray,
    neg_ratio: float = 3.0,
) -> Dict[str, jnp.ndarray]:
    """Softmax CE with 3:1 in-graph hard-negative mining + SmoothL1.

    Reductions: sums normalized by the number of positives (standard SSD),
    mean over batch.
    """
    cls_logits = outputs["cls_logits"].astype(jnp.float32)
    cls_t, box_t = assign_ssd_targets(outputs["anchors"], gt_boxes, gt_ids)

    log_probs = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, cls_t[..., None], axis=-1)[..., 0]  # (B,N)
    pos = cls_t > 0
    npos = jnp.sum(pos, axis=1)  # (B,)

    # hard negative mining: keep top (neg_ratio * npos) negative CE losses
    neg_ce = jnp.where(pos, -jnp.inf, ce)
    order = jnp.argsort(-neg_ce, axis=1)
    rank = jnp.argsort(order, axis=1)  # rank of each anchor among negatives
    keep_neg = rank < (neg_ratio * npos)[:, None]
    cls_mask = pos | keep_neg

    denom = jnp.maximum(npos.astype(jnp.float32), 1.0)
    cls_loss = jnp.mean(jnp.sum(ce * cls_mask, axis=1) / denom)
    box_err = smooth_l1(outputs["box_deltas"] - box_t)
    box_loss = jnp.mean(jnp.sum(box_err * pos[..., None], axis=(1, 2)) / denom)
    total = cls_loss + box_loss
    return {"cls": cls_loss, "box": box_loss, "total": total,
            "npos": jnp.mean(npos.astype(jnp.float32))}


@dataclasses.dataclass(frozen=True)
class SSDNMSConfig:
    iou_thresh: float = 0.45
    valid_thresh: float = 0.01
    topk: int = 400
    post_nms: int = 100
    backend: str = "auto"

    def resolved_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        from viddet_tpu.core.platform import default_nms_backend

        return default_nms_backend()


def ssd_forward_and_postprocess(module, variables, images, nms: SSDNMSConfig = SSDNMSConfig()):
    """images -> (ids, scores, boxes); jit the whole thing."""
    out = module.apply(variables, images, train=False)
    probs = jax.nn.softmax(out["cls_logits"].astype(jnp.float32), axis=-1)
    scores = probs[..., 1:]  # drop background
    return multiclass_nms_dense_two_stage(
        out["boxes"],
        scores,
        iou_thresh=nms.iou_thresh,
        valid_thresh=nms.valid_thresh,
        topk=nms.topk,
        post_nms=nms.post_nms,
        backend=nms.resolved_backend(),
    )
