"""ResNet backbones (ResNet-50 v1.5) for SSD and Faster R-CNN.

Capability parity with the reference stack's GluonCV ResNet features
(SURVEY.md §3.1 items 21-22 use resnet50 bases).  NHWC / bf16 / BatchNorm,
stride-2 in the 3x3 bottleneck conv (the "v1.5" arrangement GluonCV's v1b
uses), returning (c2, c3, c4, c5) at strides (4, 8, 16, 32).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY


class _ConvBN(nn.Module):
    """conv -> BN -> (ReLU), the ResNet unit cell.

    Honors ``policy.quant == "int8"`` the same way ConvBNLeaky does
    (models/common.py): BN-folded int8 MXU conv at inference with
    calibrated activation ranges, so SSD/Faster R-CNN backbones quantize
    under the same ``viddet_tpu.quant`` PTQ flow as the YOLO family.
    """

    features: int
    kernel: int = 3
    strides: int = 1
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.policy.quant == "int8":
            from viddet_tpu import quant

            q = quant.maybe_int8_cell(
                self, x, train,
                features=self.features, kernel_size=self.kernel,
                strides=self.strides, policy=self.policy,
                act="relu" if self.act else "none",
            )
            if q is not None:
                return q
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=False,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
            axis_name=self.bn_axis_name if train else None,
        )(x)
        return nn.relu(x) if self.act else x


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(4x) with projection shortcut when needed."""

    features: int  # bottleneck width; output is 4x
    strides: int = 1
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        out_ch = self.features * 4
        shortcut = x
        if x.shape[-1] != out_ch or self.strides != 1:
            shortcut = _ConvBN(out_ch, 1, self.strides, act=False, **kw)(x, train)
        y = _ConvBN(self.features, 1, 1, **kw)(x, train)
        y = _ConvBN(self.features, 3, self.strides, **kw)(y, train)
        y = _ConvBN(out_ch, 1, 1, act=False, **kw)(y, train)
        return nn.relu(y + shortcut)


class ResNet50(nn.Module):
    """Returns [c2, c3, c4, c5] at strides (4, 8, 16, 32)."""

    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    BLOCKS: Tuple[int, ...] = (3, 4, 6, 3)
    WIDTHS: Tuple[int, ...] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        x = self.policy.cast_to_compute(x)
        x = _ConvBN(64, 7, 2, **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        for stage, (blocks, width) in enumerate(zip(self.BLOCKS, self.WIDTHS)):
            for b in range(blocks):
                strides = 2 if (b == 0 and stage > 0) else 1
                x = Bottleneck(width, strides, **kw)(x, train)
            feats.append(x)
        return feats
