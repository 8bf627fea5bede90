"""YOLOv3 detector — Flax modules with in-graph box decode and NMS.

Capability parity with the reference's ``models/definitions/yolo/yolo3.py``
(YOLOV3 HybridBlock: detection blocks, output heads, in-graph decode and
``contrib.box_nms`` — SURVEY.md §3.1 item 8, §4.4; reference mount empty so
structure follows the YOLOv3 paper, arXiv 1804.02767, and the recalled
GluonCV surface).  Design is TPU-first:

* the ENTIRE decode→score→top-k→NMS pipeline is traced into the same XLA
  program as the backbone, so the host only receives fixed-shape
  ``(ids, scores, boxes)`` padded with -1 — the contract the reference's
  eval/detect loops rely on (SURVEY.md §4.2) and the thing that makes the
  >2k fps/chip target feasible (no host round-trips);
* all shapes are static: candidate top-k is fixed (400), post-NMS output is
  fixed (100);
* box math runs in float32 even when the backbone computes in bf16.

Scale ordering convention (matches the recalled reference: deepest first):
``strides = (32, 16, 8)``, ``anchors[0]`` are the largest anchors.  The
flattened anchor axis is ordered (row, col, anchor) per scale, scales
concatenated deepest-first.  Target assignment (train/targets.py) uses the
same ordering.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY
from viddet_tpu.models.common import ConvBNLeaky, upsample2x_nearest
from viddet_tpu.models.darknet import Darknet53, DarknetTiny

# Default COCO anchor boxes (input-pixel units), deepest scale first.
ANCHORS_DARKNET53: Tuple[Tuple[Tuple[float, float], ...], ...] = (
    ((116, 90), (156, 198), (373, 326)),  # stride 32
    ((30, 61), (62, 45), (59, 119)),  # stride 16
    ((10, 13), (16, 30), (33, 23)),  # stride 8
)
STRIDES_DARKNET53: Tuple[int, ...] = (32, 16, 8)

ANCHORS_TINY: Tuple[Tuple[Tuple[float, float], ...], ...] = (
    ((81, 82), (135, 169), (344, 319)),  # stride 32
    ((10, 14), (23, 27), (37, 58)),  # stride 16
)
STRIDES_TINY: Tuple[int, ...] = (32, 16)


class YOLODetectionBlock(nn.Module):
    """Five conv block + branch: returns (route, tip).

    route feeds the lateral upsample path; tip feeds the output head.
    """

    channels: int  # bottleneck width c; tip is 2c
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        for _ in range(2):
            x = ConvBNLeaky(self.channels, 1, **kw)(x, train)
            x = ConvBNLeaky(self.channels * 2, 3, **kw)(x, train)
        route = ConvBNLeaky(self.channels, 1, **kw)(x, train)
        tip = ConvBNLeaky(self.channels * 2, 3, **kw)(route, train)
        return route, tip


def _scale_constants(h: int, w: int, anchors, stride: int):
    """Static per-scale decode constants, flattened in (row, col, anchor) order.

    Returns (grid_xy (N,2), anchor_wh (N,2), stride (N,1)) with N = h*w*3.
    """
    na = len(anchors)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w, na), 1)
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w, na), 0)
    grid_xy = jnp.stack([grid_x, grid_y], axis=-1).reshape(-1, 2)
    anchor_wh = jnp.broadcast_to(
        jnp.asarray(anchors, jnp.float32)[None, None, :, :], (h, w, na, 2)
    ).reshape(-1, 2)
    strides = jnp.full((h * w * na, 1), float(stride), jnp.float32)
    return grid_xy, anchor_wh, strides


def yolo_head_config(backbone: str, anchors=None, strides=None):
    """Default (anchors, strides, head_channels) per backbone family."""
    if backbone == "darknet53":
        return (
            anchors or ANCHORS_DARKNET53,
            strides or STRIDES_DARKNET53,
            (512, 256, 128),
        )
    if backbone == "tiny":
        return anchors or ANCHORS_TINY, strides or STRIDES_TINY, (256, 128)
    raise ValueError(f"unknown backbone {backbone!r}")


class YOLOv3Head(nn.Module):
    """FPN-lite neck + per-scale output convs + in-graph decode.

    Consumes multi-scale features (DEEPEST FIRST) and returns the output
    dict documented on ``YOLOv3``.  Shared by the single-frame network and
    the temporal k-frame variants (models/temporal.py).
    """

    num_classes: int
    anchors: Any
    strides: Any
    head_channels: Any
    tiny: bool = False
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        anchors, strides = self.anchors, self.strides
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        num_pred = 5 + self.num_classes
        raws: List[jnp.ndarray] = []
        raws_cells: List[jnp.ndarray] = []
        raws_conv: List[jnp.ndarray] = []
        consts = []
        route = None
        for i, (feat, ch) in enumerate(zip(feats, self.head_channels)):
            if route is not None:
                lateral = ConvBNLeaky(ch, 1, **kw)(route, train)
                lateral = upsample2x_nearest(lateral)
                feat = jnp.concatenate([lateral, feat], axis=-1)
            if self.tiny and i == 0:
                # tiny head: single 1x1 bottleneck + 3x3 tip (no 5-conv block)
                route = ConvBNLeaky(ch, 1, **kw)(feat, train)
                tip = ConvBNLeaky(ch * 2, 3, **kw)(route, train)
            elif self.tiny:
                route = None
                tip = ConvBNLeaky(ch * 2, 3, **kw)(feat, train)
            else:
                route, tip = YOLODetectionBlock(ch, **kw)(feat, train)
            na = len(anchors[i])
            out = nn.Conv(
                na * num_pred,
                (1, 1),
                dtype=self.policy.compute_dtype,
                param_dtype=self.policy.param_dtype,
                name=f"output_{i}",
            )(tip)
            b, h, w, _ = out.shape
            raws.append(out.reshape(b, h * w * na, num_pred))
            raws_cells.append(out.reshape(b, h * w, na * num_pred))
            raws_conv.append(out)
            consts.append(_scale_constants(h, w, anchors[i], strides[i]))

        # Keep the big head tensor in compute dtype (bf16): the dense
        # (B, N, C) class logits are only ever reduced/gathered by the
        # two-stage NMS (ops/nms.py) or upcast per-term by the loss, so a
        # float32 materialization here would cost pure HBM bandwidth.
        # cls_max / obj (feeding the NMS's stage-1 top-k) are reduced /
        # sliced PER SCALE from the CELL layout right after each output
        # conv, so they fuse with the conv's epilogue and the fused-NMS
        # path never materializes the (B, h*w*na, 5+C) anchor-split
        # reshape.  Lane group [a*(5+C), (a+1)*(5+C)) is anchor a; the
        # stack axis keeps the (cell, anchor) flattening order.
        def _per_anchor(rc, fn):
            na_rc = rc.shape[-1] // num_pred
            return jnp.stack(
                [fn(rc, a * num_pred) for a in range(na_rc)], axis=-1
            ).reshape(rc.shape[0], -1)

        cls_max = jnp.concatenate(
            [
                _per_anchor(
                    rc, lambda r, o: jnp.max(r[..., o + 5 : o + num_pred], axis=-1)
                )
                for rc in raws_cells
            ],
            axis=1,
        )  # (B, N), compute dtype
        obj_logit = jnp.concatenate(
            [_per_anchor(rc, lambda r, o: r[..., o + 4]) for rc in raws_cells],
            axis=1,
        )  # (B, N), compute dtype
        grid_xy = jnp.concatenate([c[0] for c in consts], axis=0)
        anchor_wh = jnp.concatenate([c[1] for c in consts], axis=0)
        stride_n = jnp.concatenate([c[2] for c in consts], axis=0)

        # One concatenated (B, N, 5+C) tensor, sliced per field.  (Profiled
        # alternative — concatenating per field from per-scale slices — costs
        # +1.5 ms/batch-128 on v5e in pad/epilogue fusions; XLA handles the
        # single concat + slices better.)
        raw = jnp.concatenate(raws, axis=1)  # (B, N, 5+C), compute dtype

        raw_xy = raw[..., 0:2].astype(jnp.float32)
        raw_wh = raw[..., 2:4].astype(jnp.float32)
        raw_obj = raw[..., 4:5]
        raw_cls = raw[..., 5:]

        # In-graph decode (float32): centers via sigmoid + grid, sizes via exp.
        center = (jax.nn.sigmoid(raw_xy) + grid_xy) * stride_n
        wh = jnp.exp(raw_wh) * anchor_wh
        half = 0.5 * wh
        boxes = jnp.concatenate([center - half, center + half], axis=-1)

        return {
            "raw_xy": raw_xy,
            "raw_wh": raw_wh,
            "raw_obj": raw_obj,  # compute dtype; upcast at point of use
            "raw_cls": raw_cls,  # compute dtype; upcast at point of use
            "cls_max": cls_max,
            "boxes": boxes,
            "grid_xy": grid_xy,
            "anchors": anchor_wh,
            "strides": stride_n,
            # Per-scale CELL-layout head tensors (deepest first) plus the
            # flat objectness logits for the fused gather-decode NMS path;
            # unused consumers are dead-code eliminated under jit.
            "raws_cells": tuple(raws_cells),
            # The output convs' untouched 4-D (B, h, w, na*num_pred)
            # tensors: the VIDDET_TAIL_INPUT=conv fused path consumes
            # these directly so the cell-layout relayout copy above is
            # DCE'd (bit-identical results; see forward_and_postprocess).
            "raws_conv": tuple(raws_conv),
            "obj_logit": obj_logit,
        }


class YOLOv3(nn.Module):
    """Full YOLOv3 network: backbone + head (neck/outputs/decode).

    ``__call__`` returns a dict of flattened-over-anchors tensors:
      raw_xy   (B, N, 2)  center logits (pre-sigmoid), float32
      raw_wh   (B, N, 2)  log-scale offsets, float32
      raw_obj  (B, N, 1)  objectness logits, compute dtype
      raw_cls  (B, N, C)  per-class logits, compute dtype
      boxes    (B, N, 4)  decoded corner boxes, float32, input-pixel coords
      grid_xy / anchors / strides — decode constants (N, 2/2/1), for losses.
    """

    num_classes: int
    backbone: str = "darknet53"  # or "tiny"
    anchors: Any = None  # defaults per backbone
    strides: Any = None
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    def _config(self):
        return yolo_head_config(self.backbone, self.anchors, self.strides)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        anchors, strides, head_channels = self._config()
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        if self.backbone == "darknet53":
            feats = Darknet53(**kw)(x, train)  # [c3, c4, c5]
        else:
            feats = DarknetTiny(**kw)(x, train)  # [c4, c5]
        head = YOLOv3Head(
            num_classes=self.num_classes,
            anchors=anchors,
            strides=strides,
            head_channels=head_channels,
            tiny=self.backbone == "tiny",
            **kw,
        )
        return head(feats[::-1], train)  # deepest first


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    """Post-processing knobs, defaults per the recalled reference surface
    (``nms_thresh=0.45, topk=400, post_nms=100`` — SURVEY.md §4.4; exact
    counts flagged K-low there, re-verify when the reference is mounted).

    backend: "auto" picks the Pallas greedy-scan kernel on TPU and the jnp
    loop elsewhere; "xla" / "pallas" / "pallas_interpret" force a choice.
    """

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


def postprocess(
    outputs: Dict[str, jnp.ndarray], nms: NMSConfig = NMSConfig()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decoded outputs -> (ids, scores, boxes), fixed-shape, -1 padded.

    Uses the late-decode NMS path (top-k the anchors first, decode boxes for
    the k winners only — bit-identical to decoding everything, strictly less
    work); under jit the head's full (B, N, 4) ``boxes`` decode is then
    dead-code-eliminated on the inference path.
    """
    from viddet_tpu.ops.nms import multiclass_nms_late_decode

    cls_max = outputs.get("cls_max")
    if cls_max is None:
        cls_max = jnp.max(outputs["raw_cls"], axis=-1)
    return multiclass_nms_late_decode(
        outputs["raw_xy"],
        outputs["raw_wh"],
        outputs["raw_obj"],
        outputs["raw_cls"],
        cls_max,
        outputs["grid_xy"],
        outputs["anchors"],
        outputs["strides"],
        iou_thresh=nms.iou_thresh,
        valid_thresh=nms.valid_thresh,
        topk=nms.topk,
        post_nms=nms.post_nms,
        backend=nms.resolved_backend(),
    )


def forward_and_postprocess(module: YOLOv3, variables, images, nms: NMSConfig = NMSConfig()):
    """Single fused inference step: images -> (ids, scores, boxes).

    Jit this whole function so XLA dead-code-eliminates the training-only
    outputs and fuses decode+NMS with the backbone.
    """
    outputs = module.apply(variables, images, train=False)
    backend = nms.resolved_backend()
    anchors, strides, _ = module._config()
    # Negative indexing so (B, k, H, W, 3) temporal clips resolve the same
    # spatial dims as (B, H, W, 3) frames and reach the fused path too.
    img_h, img_w = images.shape[-3], images.shape[-2]
    # Non-multiple-of-stride inputs give SAME-padded ceil-sized feature
    # maps, so meta recomputed from image size would disagree with the
    # actual raws_cells shapes — route those through the XLA postprocess,
    # which reads shapes directly.
    aligned = all(img_h % st == 0 and img_w % st == 0 for st in strides)
    if (
        backend in ("pallas", "pallas_interpret")
        and "raws_cells" in outputs
        and aligned
    ):
        # Fused per-scale gather-decode path (bit-identical; ~3 ms faster
        # per batch-128 on v5e): the kernel consumes the output convs'
        # natural cell layout and recomputes decode constants from the
        # static config, so the (B, N, 5+C) concat and the per-scale
        # anchor-split reshapes never materialize.
        from viddet_tpu.ops.nms import multiclass_nms_late_decode_fused

        meta = tuple(
            (
                (img_h // st) * (img_w // st),
                img_w // st,
                int(st),
                tuple((float(aw), float(ah)) for aw, ah in anc),
            )
            for anc, st in zip(anchors, strides)
        )
        # Trace-time knob (like every VIDDET_* flag — set before process
        # start): "conv" feeds the kernels the output convs' native 4-D
        # layout so the (B, h*w, lanes) relayout copy never materializes;
        # bit-identical outputs (interpret-parity gated).  Staged opt-in
        # until trace_tail/bench prove it on-chip (docs/perf_notes.md).
        tail_input = os.environ.get("VIDDET_TAIL_INPUT", "cells")
        if tail_input not in ("cells", "conv"):
            # a typo'd flag silently measuring the wrong path would
            # corrupt the flip decision — fail loudly
            raise ValueError(
                f"VIDDET_TAIL_INPUT {tail_input!r} is not 'cells' or 'conv'"
            )
        return multiclass_nms_late_decode_fused(
            outputs["raws_conv" if tail_input == "conv" else "raws_cells"],
            None,  # anchor scores via the Pallas score kernel
            meta,
            iou_thresh=nms.iou_thresh,
            valid_thresh=nms.valid_thresh,
            topk=nms.topk,
            post_nms=nms.post_nms,
            backend=backend,
        )
    return postprocess(outputs, nms)
