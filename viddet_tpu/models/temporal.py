"""Temporal multi-frame YOLOv3 variants for ImageNet-VID clips.

Capability parity with the reference's k-frame experiments
(``models/definitions/yolo`` k/t-parameterized variants — SURVEY.md §3.1
item 11, §4.5): the model consumes a ``[B, k, H, W, 3]`` clip and predicts
boxes for the KEY (center) frame.

Variants (``aggregation``):
  * ``"stack"`` — channel-stacked input: the clip becomes a ``3k``-channel
    image and the stem conv widens accordingly (the reference's widened
    input-conv variant);
  * ``"max"`` / ``"mean"`` — shared per-frame backbone, elementwise temporal
    pooling of each feature scale before the shared head;
  * ``"conv"`` — shared per-frame backbone, per-scale 1x1 conv over the
    time-stacked channels (learned temporal aggregation).

TPU-first: the per-frame backbone runs as one batched pass over ``B*k``
frames (bigger MXU batches, no Python loop over time), and temporal
reduction is a reshape + reduce that XLA fuses into the adjacent convs.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY
from viddet_tpu.models.common import ConvBNLeaky
from viddet_tpu.models.darknet import Darknet53, DarknetTiny
from viddet_tpu.models.yolo3 import YOLOv3Head, yolo_head_config


class TemporalYOLOv3(nn.Module):
    """YOLOv3 over k-frame clips; output dict matches ``YOLOv3``."""

    num_classes: int
    k: int = 3
    backbone: str = "darknet53"
    aggregation: str = "max"  # stack | max | mean | conv
    anchors: Any = None
    strides: Any = None
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    def _config(self):
        return yolo_head_config(self.backbone, self.anchors, self.strides)

    @nn.compact
    def __call__(self, clips: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        assert clips.ndim == 5, "clips must be [B, k, H, W, 3]"
        b, k, h, w, c = clips.shape
        assert k == self.k, f"expected k={self.k}, got {k}"
        anchors, strides, head_channels = self._config()
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        backbone = Darknet53(**kw) if self.backbone == "darknet53" else DarknetTiny(**kw)

        if self.aggregation == "stack":
            # [B, k, H, W, 3] -> [B, H, W, 3k]; stem conv widens to 3k inputs.
            x = jnp.moveaxis(clips, 1, 3).reshape(b, h, w, k * c)
            feats = backbone(x, train)
        else:
            # one batched pass over all frames: [B*k, H, W, 3]
            frames = clips.reshape(b * k, h, w, c)
            per_frame = backbone(frames, train)
            feats = []
            for f in per_frame:
                _, fh, fw, fc = f.shape
                ft = f.reshape(b, k, fh, fw, fc)
                if self.aggregation == "max":
                    feats.append(jnp.max(ft, axis=1))
                elif self.aggregation == "mean":
                    feats.append(jnp.mean(ft, axis=1))
                elif self.aggregation == "conv":
                    stacked = jnp.moveaxis(ft, 1, 3).reshape(b, fh, fw, k * fc)
                    feats.append(ConvBNLeaky(fc, 1, **kw)(stacked, train))
                else:
                    raise ValueError(f"unknown aggregation {self.aggregation!r}")

        head = YOLOv3Head(
            num_classes=self.num_classes,
            anchors=anchors,
            strides=strides,
            head_channels=head_channels,
            tiny=self.backbone == "tiny",
            **kw,
        )
        return head(feats[::-1], train)
