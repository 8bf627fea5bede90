"""Faster R-CNN ResNet-50 FPN — two-stage detector, fully in-graph.

Capability parity with the reference's Faster R-CNN support (GluonCV
``model_zoo/rcnn/faster_rcnn`` — SURVEY.md §3.1 item 22; in scope per
BASELINE.json config #4).  This is the hardest static-shape problem in the
rebuild (SURVEY.md §8 hard part 5); every stage keeps fixed shapes:

* RPN proposals: per-level top-k -> concat -> score top-k -> class-agnostic
  greedy NMS (Pallas kernel on TPU) -> fixed post-NMS count + validity mask;
* ROI sampling (train): the random-priority top-k trick gives a fixed
  512-roi batch with a dynamic positive *count* but static shapes;
* ROIAlign: every roi aligned on every FPN level, masked by the assigned
  level (ops/roi_align.py);
* detections: per-class boxes flattened to N*C candidates -> top-k ->
  class-aware NMS, padded output.

Anchors: one scale per FPN level (32..512) x ratios (0.5, 1, 2).
Box coding: R-CNN parameterization; RPN weights (1,1,1,1), head per-class
deltas with weights (10,10,5,5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY
from viddet_tpu.models.resnet import ResNet50
from viddet_tpu.ops.boxes import box_iou, clip_boxes
from viddet_tpu.ops.nms import nms_keep_mask
from viddet_tpu.ops.roi_align_pallas import multilevel_roi_align_auto

FPN_STRIDES = (4, 8, 16, 32, 64)  # P2..P6
ANCHOR_SCALES = (32.0, 64.0, 128.0, 256.0, 512.0)
ANCHOR_RATIOS = (0.5, 1.0, 2.0)


@dataclasses.dataclass(frozen=True)
class FRCNNConfig:
    rpn_pre_nms_topk: int = 1000  # per level
    rpn_nms_input: int = 1000  # candidates entering proposal NMS
    rpn_post_nms_train: int = 512
    rpn_post_nms_test: int = 300
    rpn_nms_thresh: float = 0.7
    rpn_batch: int = 256
    rpn_pos_fraction: float = 0.5
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    roi_batch: int = 512
    roi_pos_fraction: float = 0.25
    roi_pos_iou: float = 0.5
    nms_backend: str = "auto"
    # ROIAlign backend: "xla" (packed-gather, ops/roi_align.py) or "pallas"
    # (window-DMA MXU kernel, ops/roi_align_pallas.py — 220 -> 377 fps at
    # FRCNN-512 batch 8 on v5e, tools/frcnn_bench.py).  "auto" picks the
    # kernel on real accelerators and the jnp path on CPU.
    roi_backend: str = "auto"

    def resolved_backend(self) -> str:
        if self.nms_backend != "auto":
            return self.nms_backend
        from viddet_tpu.core.platform import default_nms_backend

        return default_nms_backend()

    def resolved_roi_backend(self) -> str:
        if self.roi_backend != "auto":
            return self.roi_backend
        from viddet_tpu.core.platform import default_nms_backend

        return default_nms_backend()


# ---------------------------------------------------------------------------
# Box coding
# ---------------------------------------------------------------------------


def encode_rcnn(gt: jnp.ndarray, anchors: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)
    acx = anchors[..., 0] + 0.5 * aw
    acy = anchors[..., 1] + 0.5 * ah
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
    gcx = gt[..., 0] + 0.5 * gw
    gcy = gt[..., 1] + 0.5 * gh
    return jnp.stack(
        [
            wx * (gcx - acx) / aw,
            wy * (gcy - acy) / ah,
            ww * jnp.log(gw / aw),
            wh * jnp.log(gh / ah),
        ],
        axis=-1,
    )


def decode_rcnn(deltas: jnp.ndarray, anchors: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)):
    wx, wy, ww, wh = weights
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)
    acx = anchors[..., 0] + 0.5 * aw
    acy = anchors[..., 1] + 0.5 * ah
    cx = deltas[..., 0] / wx * aw + acx
    cy = deltas[..., 1] / wy * ah + acy
    w = jnp.exp(jnp.clip(deltas[..., 2] / ww, -10.0, 10.0)) * aw
    h = jnp.exp(jnp.clip(deltas[..., 3] / wh, -10.0, 10.0)) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def _level_anchors(fh: int, fw: int, stride: int, scale: float) -> np.ndarray:
    """(fh*fw*A, 4) anchors, (row, col, ratio) order matching head reshape."""
    whs = []
    for r in ANCHOR_RATIOS:
        whs.append((scale * np.sqrt(1.0 / r), scale * np.sqrt(r)))
    cx, cy = np.meshgrid(
        (np.arange(fw) + 0.5) * stride, (np.arange(fh) + 0.5) * stride
    )
    per = [
        np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
        for w, h in whs
    ]
    return np.stack(per, axis=2).reshape(-1, 4).astype(np.float32)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class FPN(nn.Module):
    """Top-down feature pyramid (FPN paper): P2..P5 + pooled P6, 256ch."""

    channels: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        conv_kw = dict(
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype
        )
        laterals = [
            nn.Conv(self.channels, (1, 1), name=f"lateral_{i}", **conv_kw)(f)
            for i, f in enumerate(feats)
        ]
        outs = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = jnp.repeat(jnp.repeat(outs[0], 2, axis=1), 2, axis=2)
            up = up[:, : lat.shape[1], : lat.shape[2], :]
            outs.insert(0, lat + up)
        pyramid = [
            nn.Conv(self.channels, (3, 3), padding="SAME", name=f"post_{i}", **conv_kw)(o)
            for i, o in enumerate(outs)
        ]
        p6 = nn.max_pool(pyramid[-1], (1, 1), strides=(2, 2))
        return pyramid + [p6]


class RPNHead(nn.Module):
    """Shared conv + objectness / delta 1x1s, applied to every level."""

    channels: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, pyramid: List[jnp.ndarray]):
        conv_kw = dict(
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype
        )
        shared = nn.Conv(self.channels, (3, 3), padding="SAME", name="rpn_conv", **conv_kw)
        obj_conv = nn.Conv(len(ANCHOR_RATIOS), (1, 1), name="rpn_obj", **conv_kw)
        delta_conv = nn.Conv(len(ANCHOR_RATIOS) * 4, (1, 1), name="rpn_delta", **conv_kw)
        objs, deltas = [], []
        for fm in pyramid:
            x = nn.relu(shared(fm))
            b, h, w, _ = x.shape
            objs.append(obj_conv(x).reshape(b, h * w * len(ANCHOR_RATIOS)))
            deltas.append(
                delta_conv(x).reshape(b, h * w * len(ANCHOR_RATIOS), 4).astype(jnp.float32)
            )
        return objs, deltas


class FasterRCNN(nn.Module):
    """Returns a dict; contents depend on mode (see ``__call__``)."""

    num_classes: int  # foreground
    config: FRCNNConfig = FRCNNConfig()
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None
    # Backbone stage overrides (None = ResNet-50); same RPN/FPN/ROI graph
    # over a shallow ResNet for compile-bound CPU gates.
    backbone_blocks: tuple | None = None
    backbone_widths: tuple | None = None

    def _proposals(self, objs, deltas, anchor_parts, image_hw, post_nms):
        """Static-shape proposal generation. Returns (B, post_nms, 4) + valid."""
        cfg = self.config
        h, w = image_hw
        cand_boxes, cand_scores = [], []
        for obj, delta, anchors in zip(objs, deltas, anchor_parts):
            b, n = obj.shape
            k = min(cfg.rpn_pre_nms_topk, n)
            score = obj.astype(jnp.float32)
            top, idx = jax.lax.top_k(score, k)
            sel_deltas = jnp.take_along_axis(delta, idx[..., None], axis=1)
            sel_anchors = jnp.asarray(anchors)[idx]
            boxes = decode_rcnn(sel_deltas, sel_anchors)
            boxes = clip_boxes(boxes, float(h), float(w))
            cand_boxes.append(boxes)
            cand_scores.append(top)
        boxes = jnp.concatenate(cand_boxes, axis=1)
        scores = jnp.concatenate(cand_scores, axis=1)
        k = min(cfg.rpn_nms_input, scores.shape[1])
        top, idx = jax.lax.top_k(scores, k)
        boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)

        # degenerate proposals are invalid
        wh_ok = (boxes[..., 2] - boxes[..., 0] > 1.0) & (boxes[..., 3] - boxes[..., 1] > 1.0)
        valid = wh_ok
        backend = cfg.resolved_backend()
        if backend == "xla":
            keep = jax.vmap(
                lambda bb, vv: nms_keep_mask(bb, None, vv, cfg.rpn_nms_thresh)
            )(boxes, valid)
        else:
            from viddet_tpu.ops.nms_pallas import nms_keep_mask_pallas

            keep = nms_keep_mask_pallas(
                boxes, valid, cfg.rpn_nms_thresh,
                interpret=(backend == "pallas_interpret"),
            ) > 0.5

        def compact(bb, ss, kk):
            order = jnp.argsort(~kk, stable=True)[:post_nms]
            return bb[order], ss[order], kk[order]

        p_boxes, p_scores, p_valid = jax.vmap(compact)(boxes, top, keep)
        return p_boxes, p_scores, p_valid

    def _roi_head(self, pyramid, rois, train):
        """Box head on (B, R, 4) rois -> cls logits + per-class deltas."""
        conv_kw = dict(
            dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype
        )
        b, r, _ = rois.shape
        # ROIAlign per image over the P2..P5 pyramid (P6 is RPN-only);
        # backend per config: packed single-gather (xla) or window-DMA MXU
        # kernel (pallas).  TRAINING always takes the xla path: pallas_call
        # has no JVP rule, and a custom-vjp wrapper whose backward re-runs
        # the XLA forward would cost strictly more than XLA end-to-end —
        # the kernel is an inference-speed play (220 -> 377 fps).
        backend = "xla" if train else self.config.resolved_roi_backend()
        feats = multilevel_roi_align_auto(
            [p for p in pyramid[:4]], rois, strides=FPN_STRIDES[:4],
            output_size=7, k_min=2, backend=backend,
        )  # (B, R, 7, 7, C)
        x = feats.reshape(b * r, -1).astype(self.policy.compute_dtype)
        x = nn.relu(nn.Dense(1024, name="fc1", **conv_kw)(x))
        x = nn.relu(nn.Dense(1024, name="fc2", **conv_kw)(x))
        cls_logits = nn.Dense(self.num_classes + 1, name="cls_score", **conv_kw)(x)
        box_deltas = nn.Dense(self.num_classes * 4, name="bbox_pred", **conv_kw)(x)
        return (
            cls_logits.reshape(b, r, self.num_classes + 1).astype(jnp.float32),
            box_deltas.reshape(b, r, self.num_classes, 4).astype(jnp.float32),
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        gt_boxes: Optional[jnp.ndarray] = None,
        gt_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.config
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        if self.backbone_blocks is not None:
            kw["BLOCKS"] = self.backbone_blocks
        if self.backbone_widths is not None:
            kw["WIDTHS"] = self.backbone_widths
        c2345 = ResNet50(**kw)(x, train)
        pyramid = FPN(policy=self.policy)(c2345)
        objs, deltas = RPNHead(policy=self.policy)(pyramid)

        anchor_parts = [
            _level_anchors(p.shape[1], p.shape[2], s, sc)
            for p, s, sc in zip(pyramid, FPN_STRIDES, ANCHOR_SCALES)
        ]
        anchors = jnp.asarray(np.concatenate(anchor_parts, axis=0))
        rpn_obj = jnp.concatenate([o.astype(jnp.float32) for o in objs], axis=1)
        rpn_delta = jnp.concatenate(deltas, axis=1)

        post_nms = cfg.rpn_post_nms_train if train else cfg.rpn_post_nms_test
        proposals, p_scores, p_valid = self._proposals(
            objs, deltas, anchor_parts, (x.shape[1], x.shape[2]), post_nms
        )
        proposals = jax.lax.stop_gradient(proposals)
        p_valid = jax.lax.stop_gradient(p_valid)

        out = {
            "anchors": anchors,
            "rpn_obj": rpn_obj,
            "rpn_delta": rpn_delta,
            "proposals": proposals,
            "proposal_valid": p_valid,
        }

        if train:
            assert gt_boxes is not None and gt_ids is not None
            rng = self.make_rng("sampling")
            rois, roi_cls_t, roi_box_t, roi_mask = sample_rois(
                rng, proposals, p_valid, gt_boxes, gt_ids, cfg
            )
            cls_logits, box_deltas = self._roi_head(pyramid, rois, train)
            out.update(
                {
                    "rois": rois,
                    "roi_cls_target": roi_cls_t,
                    "roi_box_target": roi_box_t,
                    "roi_mask": roi_mask,
                    "roi_cls_logits": cls_logits,
                    "roi_box_deltas": box_deltas,
                }
            )
        else:
            cls_logits, box_deltas = self._roi_head(pyramid, proposals, train)
            out.update({"roi_cls_logits": cls_logits, "roi_box_deltas": box_deltas})
        return out


# ---------------------------------------------------------------------------
# Training targets / sampling (static shapes)
# ---------------------------------------------------------------------------


def _random_topk_select(rng, eligible: jnp.ndarray, k) -> jnp.ndarray:
    """Boolean-select up to k eligible entries uniformly at random.

    k may be a traced scalar.  Returns a bool mask with
    ``sum(mask) == min(k, sum(eligible))`` — the static-shape sampler.
    """
    n = eligible.shape[0]
    priority = jax.random.uniform(rng, (n,)) + (~eligible) * 10.0
    rank = jnp.argsort(jnp.argsort(priority))
    return eligible & (rank < k)


def assign_rpn_targets(anchors, gt_boxes, gt_ids, cfg: FRCNNConfig, rng):
    """Per-batch RPN labels. Returns (labels (B,N) in {-1,0,1} AFTER
    sampling — unsampled = -1, box_targets (B,N,4))."""

    def single(rng_i, gt_b, gt_i):
        valid = gt_i >= 0
        iou = jnp.where(valid[None, :], box_iou(anchors, gt_b), -1.0)  # (N, M)
        best_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        pos = best_iou >= cfg.rpn_pos_iou
        # force best anchor per gt; invalid GTs routed out-of-range + dropped
        # so they can't overwrite a valid GT's forced match at anchor 0
        best_anchor = jnp.argmax(iou, axis=0)  # (M,)
        safe_anchor = jnp.where(valid, best_anchor, anchors.shape[0])
        pos = pos | jnp.zeros(anchors.shape[0], bool).at[safe_anchor].set(
            True, mode="drop"
        )
        neg = (best_iou < cfg.rpn_neg_iou) & ~pos

        rng_p, rng_n = jax.random.split(rng_i)
        max_pos = int(cfg.rpn_batch * cfg.rpn_pos_fraction)
        pos_sel = _random_topk_select(rng_p, pos, max_pos)
        num_pos = jnp.sum(pos_sel)
        neg_sel = _random_topk_select(rng_n, neg, cfg.rpn_batch - num_pos)

        labels = jnp.where(pos_sel, 1, jnp.where(neg_sel, 0, -1))
        box_t = encode_rcnn(gt_b[best_gt], anchors)
        return labels, box_t

    rngs = jax.random.split(rng, gt_boxes.shape[0])
    return jax.vmap(single)(rngs, gt_boxes, gt_ids)


def sample_rois(rng, proposals, p_valid, gt_boxes, gt_ids, cfg: FRCNNConfig):
    """Append GT to proposals, match, and sample a fixed roi batch.

    Returns (rois (B,S,4), cls_target (B,S) int32 bg=0, box_target (B,S,4)
    encoded for the matched class, mask (B,S) {0=pad,1=sampled}).
    Positive rois are the first-ranked entries; box targets are zero for
    negatives.
    """
    s = cfg.roi_batch

    def single(rng_i, props, pv, gt_b, gt_i):
        gt_valid = gt_i >= 0
        cands = jnp.concatenate([props, gt_b], axis=0)
        cand_valid = jnp.concatenate([pv, gt_valid], axis=0)
        iou = jnp.where(gt_valid[None, :], box_iou(cands, gt_b), -1.0)
        best_iou = jnp.where(cand_valid, jnp.max(iou, axis=1), -1.0)
        best_gt = jnp.argmax(iou, axis=1)

        pos = best_iou >= cfg.roi_pos_iou
        neg = cand_valid & ~pos & (best_iou >= 0.0)

        rng_p, rng_n = jax.random.split(rng_i)
        max_pos = int(s * cfg.roi_pos_fraction)
        pos_sel = _random_topk_select(rng_p, pos, max_pos)
        num_pos = jnp.sum(pos_sel)
        neg_sel = _random_topk_select(rng_n, neg, s - num_pos)
        selected = pos_sel | neg_sel

        # order: positives first, then negatives, then padding
        order_key = jnp.where(pos_sel, 0, jnp.where(neg_sel, 1, 2))
        if cands.shape[0] < s:  # fewer candidates than the roi batch: pad
            pad = s - cands.shape[0]
            cands = jnp.concatenate([cands, jnp.zeros((pad, 4))], axis=0)
            order_key = jnp.concatenate([order_key, jnp.full((pad,), 2)], axis=0)
            selected = jnp.concatenate([selected, jnp.zeros((pad,), bool)], axis=0)
            pos_sel = jnp.concatenate([pos_sel, jnp.zeros((pad,), bool)], axis=0)
            best_gt = jnp.concatenate(
                [best_gt, jnp.zeros((pad,), best_gt.dtype)], axis=0
            )
        order = jnp.argsort(order_key, stable=True)[:s]
        rois = cands[order]
        sel = selected[order]
        is_pos = pos_sel[order]
        matched_gt = best_gt[order]
        cls_t = jnp.where(is_pos, gt_i[matched_gt].astype(jnp.int32) + 1, 0)
        cls_t = jnp.where(sel, cls_t, -1)  # -1 = padding (masked in loss)
        box_t = encode_rcnn(gt_b[matched_gt], rois, weights=(10.0, 10.0, 5.0, 5.0))
        box_t = jnp.where(is_pos[:, None], box_t, 0.0)
        return rois, cls_t, box_t, sel.astype(jnp.float32)

    rngs = jax.random.split(rng, proposals.shape[0])
    return jax.vmap(single)(rngs, proposals, p_valid, gt_boxes, gt_ids)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def _smooth_l1(x, beta: float = 1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def frcnn_loss(outputs, gt_boxes, gt_ids, cfg: FRCNNConfig, rng) -> Dict[str, jnp.ndarray]:
    """RPN (BCE + SmoothL1) + head (CE + per-class SmoothL1)."""
    labels, rpn_box_t = assign_rpn_targets(
        outputs["anchors"], gt_boxes, gt_ids, cfg, rng
    )
    obj = outputs["rpn_obj"]
    pos = (labels == 1).astype(jnp.float32)
    sampled = (labels >= 0).astype(jnp.float32)
    bce = jnp.maximum(obj, 0) - obj * pos + jnp.log1p(jnp.exp(-jnp.abs(obj)))
    denom = jnp.maximum(jnp.sum(sampled), 1.0)
    rpn_cls_loss = jnp.sum(bce * sampled) / denom
    rpn_box_loss = jnp.sum(
        _smooth_l1(outputs["rpn_delta"] - rpn_box_t) * pos[..., None]
    ) / denom

    cls_t = outputs["roi_cls_target"]  # (B, S), -1 pad
    mask = (cls_t >= 0).astype(jnp.float32)
    logp = jax.nn.log_softmax(outputs["roi_cls_logits"], axis=-1)
    ce = -jnp.take_along_axis(logp, jnp.maximum(cls_t, 0)[..., None], axis=-1)[..., 0]
    head_denom = jnp.maximum(jnp.sum(mask), 1.0)
    head_cls_loss = jnp.sum(ce * mask) / head_denom

    is_pos = (cls_t > 0).astype(jnp.float32)
    cls_idx = jnp.maximum(cls_t - 1, 0)  # foreground class slot
    deltas = jnp.take_along_axis(
        outputs["roi_box_deltas"], cls_idx[..., None, None].repeat(4, -1), axis=2
    )[:, :, 0, :]
    head_box_loss = jnp.sum(
        _smooth_l1(deltas - outputs["roi_box_target"]) * is_pos[..., None]
    ) / head_denom

    total = rpn_cls_loss + rpn_box_loss + head_cls_loss + head_box_loss
    return {
        "rpn_cls": rpn_cls_loss,
        "rpn_box": rpn_box_loss,
        "cls": head_cls_loss,
        "box": head_box_loss,
        "total": total,
    }


# ---------------------------------------------------------------------------
# Inference post-processing
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "valid_thresh", "topk", "post_nms", "backend"),
)
def frcnn_postprocess(
    proposals: jnp.ndarray,
    cls_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    image_hw: jnp.ndarray,
    *,
    iou_thresh: float = 0.5,
    valid_thresh: float = 0.05,
    topk: int = 400,
    post_nms: int = 100,
    backend: str = "xla",
):
    """(B,R,4) proposals + head outputs -> padded (ids, scores, boxes)."""
    b, r = box_deltas.shape[0], box_deltas.shape[1]
    probs = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]  # (B, R, C)
    boxes = decode_rcnn(
        box_deltas, proposals[:, :, None, :], weights=(10.0, 10.0, 5.0, 5.0)
    )  # (B, R, C, 4)
    boxes = clip_boxes(boxes, image_hw[0], image_hw[1])
    c = probs.shape[-1]
    flat_scores = probs.reshape(b, r * c)
    flat_boxes = boxes.reshape(b, r * c, 4)
    k = min(topk, r * c)
    top, idx = jax.lax.top_k(flat_scores, k)
    cand_boxes = jnp.take_along_axis(flat_boxes, idx[..., None], axis=1)
    cls_idx = (idx % c).astype(jnp.float32)
    valid = top > valid_thresh

    from viddet_tpu.ops.nms import _nms_on_candidates

    return _nms_on_candidates(cand_boxes, top, cls_idx, valid, iou_thresh, post_nms, backend)


def frcnn_forward_and_postprocess(module, variables, images, backend: str = "auto", **nms_kw):
    out = module.apply(variables, images, train=False)
    if backend == "auto":
        from viddet_tpu.core.platform import default_nms_backend

        backend = default_nms_backend()
    return frcnn_postprocess(
        out["proposals"],
        out["roi_cls_logits"],
        out["roi_box_deltas"],
        jnp.asarray([images.shape[1], images.shape[2]], jnp.float32),
        backend=backend,
        **nms_kw,
    )
