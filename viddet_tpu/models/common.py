"""Shared building blocks for detection backbones and heads.

TPU-first choices:
* NHWC layout everywhere (native for XLA:TPU convolutions on the MXU).
* bfloat16 compute / float32 parameters via ``core.precision.Policy``;
  BatchNorm running statistics stay float32.
* No data-dependent control flow — every module traces to a static graph.
"""

from __future__ import annotations



import flax.linen as nn
import jax.numpy as jnp

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY


class ConvBNLeaky(nn.Module):
    """3x3/1x1 conv -> BatchNorm -> LeakyReLU(0.1), the Darknet unit cell.

    Mirrors the reference stack's ``_conv2d`` helper (conv + BN + leaky in
    every Darknet/YOLO layer); here the BN scale/shift folds into the conv
    epilogue under XLA at inference.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None  # set to mesh axis for SyncBN semantics

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
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
        return nn.leaky_relu(x, negative_slope=0.1)


class DarknetResidual(nn.Module):
    """1x1 (c/2) -> 3x3 (c) with additive skip — Darknet-53 residual unit."""

    features: int
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        x = ConvBNLeaky(
            self.features // 2, 1, policy=self.policy, bn_axis_name=self.bn_axis_name
        )(x, train)
        x = ConvBNLeaky(
            self.features, 3, policy=self.policy, bn_axis_name=self.bn_axis_name
        )(x, train)
        return x + residual


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x spatial upsample, NHWC.

    Implemented as repeats (pure data movement) — XLA lowers this to cheap
    broadcasts, no gather needed.
    """
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def maxpool2d(x: jnp.ndarray, window: int = 2, stride: int = 2) -> jnp.ndarray:
    """SAME max-pool, NHWC."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding="SAME"
    )
