"""Darknet backbones (Darknet-53 and the yolov3-tiny backbone).

Capability parity with the reference's ``models/definitions/darknet``
(DarknetV3 53-layer + tiny variant; reference mount empty — SURVEY.md §3.1
item 7), re-designed for TPU: NHWC, bf16 compute, strided convs (53) /
max-pools (tiny), returning multi-scale features deepest-last.

Architecture source: YOLOv3 paper (arXiv 1804.02767, PAPERS.md) Table 1.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY
from viddet_tpu.models.common import (
    ConvBNLeaky,
    DarknetResidual,
    maxpool2d,
)


class Darknet53(nn.Module):
    """53-layer Darknet. Returns (c3, c4, c5) at strides (8, 16, 32)."""

    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    # (num_residual_blocks, out_channels) per downsampling stage
    STAGES: Tuple[Tuple[int, int], ...] = ((1, 64), (2, 128), (8, 256), (8, 512), (4, 1024))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        x = self.policy.cast_to_compute(x)
        x = ConvBNLeaky(32, 3, **kw)(x, train)
        feats = []
        for num_blocks, channels in self.STAGES:
            x = ConvBNLeaky(channels, 3, strides=2, **kw)(x, train)
            for _ in range(num_blocks):
                x = DarknetResidual(channels, **kw)(x, train)
            feats.append(x)
        return feats[-3:]  # strides 8, 16, 32


class DarknetTiny(nn.Module):
    """yolov3-tiny backbone: conv/max-pool ladder.

    Returns (c4, c5) at strides (16, 32).  The final pool is stride-1
    (window 2, SAME) as in the original tiny config, so c5 stays stride 32.
    """

    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        kw = dict(policy=self.policy, bn_axis_name=self.bn_axis_name)
        x = self.policy.cast_to_compute(x)
        for channels in (16, 32, 64, 128):
            x = ConvBNLeaky(channels, 3, **kw)(x, train)
            x = maxpool2d(x)  # stride cumulative: 2, 4, 8, 16
        c4 = ConvBNLeaky(256, 3, **kw)(x, train)  # stride 16
        x = maxpool2d(c4)  # stride 32
        x = ConvBNLeaky(512, 3, **kw)(x, train)
        x = maxpool2d(x, window=2, stride=1)  # keep stride 32
        c5 = ConvBNLeaky(1024, 3, **kw)(x, train)
        return [c4, c5]
