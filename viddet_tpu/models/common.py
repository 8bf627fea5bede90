"""Shared building blocks for detection backbones and heads.

TPU-first choices:
* NHWC layout everywhere (native for XLA:TPU convolutions on the MXU).
* bfloat16 compute / float32 parameters via ``core.precision.Policy``;
  BatchNorm running statistics stay float32.
* No data-dependent control flow — every module traces to a static graph.
"""

from __future__ import annotations



from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from viddet_tpu.core.precision import Policy, DEFAULT_POLICY


class _ConvParams(nn.Module):
    """Mimics ``nn.Conv``'s parameter tree (scope name set by the caller) so
    the fused Pallas path can fetch the SAME 'Conv_0/kernel' parameter the
    XLA path creates — checkpoints and init are byte-identical either way."""

    features: int
    kernel_size: int
    param_dtype: Any

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, in_features, self.features),
            self.param_dtype,
        )


class _BNParams(nn.Module):
    """Mimics ``nn.BatchNorm``'s parameter/batch_stats tree (see above)."""

    param_dtype: Any

    @nn.compact
    def __call__(self, features: int):
        scale = self.param(
            "scale", nn.initializers.ones, (features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (features,), self.param_dtype
        )
        mean = self.variable(
            "batch_stats",
            "mean",
            lambda: jnp.zeros((features,), jnp.float32),
        )
        var = self.variable(
            "batch_stats",
            "var",
            lambda: jnp.ones((features,), jnp.float32),
        )
        return scale, bias, mean.value, var.value


class ConvBNLeaky(nn.Module):
    """3x3/1x1 conv -> BatchNorm -> LeakyReLU(0.1), the Darknet unit cell.

    Mirrors the reference stack's ``_conv2d`` helper (conv + BN + leaky in
    every Darknet/YOLO layer); here the BN scale/shift folds into the conv
    epilogue under XLA at inference.

    The shallow stride-2 3x3 downsample convs (Cin < 256) run below
    speed-of-light under XLA's conv lowering (MXU K-dim padding), but the
    fused im2col Pallas kernel (``ops/conv_pallas.py``) measured SLOWER
    still (4.97 vs 1.60 ms standalone — docs/perf_notes.md dead ends), so
    the default conv backend is XLA; the Pallas kernel stays available
    opt-in via ``VIDDET_CONV_BACKEND=pallas`` (``core/platform.py``).
    Parameter trees are identical on every path.

    With ``policy.quant == "int8"`` the inference path runs as a BN-folded
    int8xint8->int32 MXU conv using calibrated activation ranges from the
    ``"quant"`` collection (see ``viddet_tpu.quant``); training and
    calibration applies still take the float path.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    policy: Policy = DEFAULT_POLICY
    bn_axis_name: str | None = None  # set to mesh axis for SyncBN semantics

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.policy.quant == "int8":
            from viddet_tpu import quant

            q = quant.maybe_int8_cell(
                self, x, train,
                features=self.features, kernel_size=self.kernel_size,
                strides=self.strides, policy=self.policy, act="leaky",
            )
            if q is not None:
                return q
        if (
            not train
            and not self.is_initializing()
            and self.strides == 2
            and self.kernel_size == 3
            and x.shape[-1] < 256
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        ):
            from viddet_tpu.core.platform import conv_backend

            backend = conv_backend()
            if backend in ("pallas", "pallas_interpret"):
                from viddet_tpu.ops.conv_pallas import conv_down2_bn_leaky

                kernel = _ConvParams(
                    self.features,
                    self.kernel_size,
                    self.policy.param_dtype,
                    name="Conv_0",
                )(x.shape[-1])
                scale, bias, mean, var = _BNParams(
                    self.policy.param_dtype, name="BatchNorm_0"
                )(self.features)
                return conv_down2_bn_leaky(
                    x,
                    kernel,
                    scale,
                    bias,
                    mean,
                    var,
                    interpret=(backend == "pallas_interpret"),
                )

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
