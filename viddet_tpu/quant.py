"""Post-training int8 quantization (PTQ) for inference.

The reference stack has no quantization story (MXNet float32 throughout —
SURVEY.md §5; mount empty); this is a TPU-native performance feature: the
v5e MXU's int8 peak is 2x its bf16 peak, and the Darknet-53 backbone is
>95% of the flagship's FLOPs, all in ConvBNLeaky cells.

Scheme (the standard static-PTQ recipe, chosen for MXU friendliness):

* **BN folded into the conv** at apply time: ``W' = W * g/sqrt(var+eps)``
  per output channel, ``b' = beta - mean * g/sqrt(var+eps)``.  The fold is
  O(weights) work per step — negligible against the conv itself — and keeps
  the stored checkpoint byte-identical to the float model.
* **Weights**: symmetric per-output-channel int8 (scale ``max|W'_c|/127``).
  Per-channel output scales factor out of the int32 accumulator, so they
  cost one fused multiply in the epilogue.
* **Activations**: symmetric per-tensor int8, scale calibrated offline as
  the abs-max over a calibration set (`calibrate`).  Per-*input*-channel
  activation scales would NOT factor out of the accumulator — per-tensor is
  the MXU-native choice.
* The conv itself is ``int8 x int8 -> int32`` via
  ``lax.conv_general_dilated(preferred_element_type=int32)`` (XLA:TPU lowers
  this onto the MXU at the int8 rate); dequant + bias + LeakyReLU fuse into
  the epilogue.
* Output heads (the 1x1 ``output_i`` convs in the YOLO/SSD/FRCNN heads)
  stay in the float compute dtype: they are accuracy-sensitive and a
  rounding-error share of the FLOPs.

This is a speed/accuracy trade, **not bit-for-bit** with the float path
(PARITY.md): it is off by default everywhere and opted into via
``Policy(quant="int8")`` (``core.precision.INT8_POLICY``), the CLIs'
``--quant int8``, or ``VIDDET_QUANT=int8`` on bench.py.

Usage::

    module = YOLOv3(num_classes, policy=INT8_POLICY)
    variables = calibrate(module, trained_variables, calib_batches)
    fn = jax.jit(lambda v, x: forward_and_postprocess(module, v, x))
    ids, scores, boxes = fn(variables, images)

Calibration runs the FLOAT forward (so every cell observes unquantized
upstream activations) while each cell records ``max|x|`` of its input into
the ``"quant"`` Flax collection.  Deploy apply then reads those ranges; a
missing/zero range is a hard error (`check_calibrated`).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Iterable

import jax
import jax.numpy as jnp

_CALIBRATING = False


def mode_from_env() -> str | None:
    """Validated ``VIDDET_QUANT`` value: ``"int8"`` or ``None``.

    Single source of truth for every bench/CLI entry point — a typo'd
    value (``VIDDET_QUANT=1``, ``in8``) must fail loudly rather than
    silently measuring (and recording) the wrong path, the same rule the
    ``VIDDET_*_KERNEL`` knobs follow.
    """
    mode = os.environ.get("VIDDET_QUANT")
    if mode and mode != "int8":
        raise ValueError(f"VIDDET_QUANT={mode!r}: only 'int8' exists")
    return mode or None


def maybe_int8_cell(mod, x, train, *, features, kernel_size, strides,
                    policy, act):
    """Shared PTQ hook for conv+BN cells (ConvBNLeaky, resnet._ConvBN).

    Returns the int8 deploy output, or ``None`` when the caller should run
    its float path: policy is not int8, training, module init, or
    calibration (which additionally records the activation abs-max into the
    cell's ``"quant"`` variable before falling through to float).

    Kept here so the two cell families can never drift: the ``"quant"``
    variable is created on every non-float policy trace (so it exists in
    the variables tree from init on), and the deploy branch reuses the
    cell's own ``Conv_0``/``BatchNorm_0`` parameter names via the shared
    param shims.
    """
    if policy.quant != "int8":
        return None
    from viddet_tpu.models.common import _BNParams, _ConvParams

    act_amax = mod.variable(
        "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
    )
    if train or mod.is_initializing():
        return None
    if is_calibrating():
        act_amax.value = jnp.maximum(
            act_amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
        )
        return None  # calibration observes the float path
    kernel = _ConvParams(
        features, kernel_size, policy.param_dtype, name="Conv_0"
    )(x.shape[-1])
    scale, bias, mean, var = _BNParams(
        policy.param_dtype, name="BatchNorm_0"
    )(features)
    return int8_conv_bn(
        x, kernel, scale, bias, mean, var, act_amax.value,
        strides=strides, act=act, out_dtype=policy.compute_dtype,
    )


def is_calibrating() -> bool:
    """Trace-time flag read by ConvBNLeaky (models/common.py): inside a
    ``calibration()`` block cells record activation ranges and run the
    float path."""
    return _CALIBRATING


@contextlib.contextmanager
def calibration():
    """Enable calibration mode for the enclosed (trace-time) applies."""
    global _CALIBRATING
    prev = _CALIBRATING
    _CALIBRATING = True
    try:
        yield
    finally:
        _CALIBRATING = prev


def int8_conv_bn(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bn_scale: jnp.ndarray,
    bn_bias: jnp.ndarray,
    bn_mean: jnp.ndarray,
    bn_var: jnp.ndarray,
    act_amax: jnp.ndarray,
    *,
    strides: int = 1,
    act: str = "leaky",  # "leaky" (0.1) | "relu" | "none"
    eps: float = 1e-5,
    out_dtype: Any = jnp.bfloat16,
) -> jnp.ndarray:
    """BN-folded int8 conv + bias + activation (NHWC/HWIO).

    ``act_amax`` is the calibrated abs-max of ``x`` (scalar).  Symmetric
    quantization keeps SAME-padding zeros exact (0 maps to 0).  ``act``
    covers both conv-cell families: Darknet's LeakyReLU(0.1) and ResNet's
    ReLU / pre-residual identity.
    """
    f32 = jnp.float32
    inv = bn_scale.astype(f32) * jax.lax.rsqrt(bn_var.astype(f32) + eps)
    w = kernel.astype(f32) * inv  # (kh, kw, cin, cout) * (cout,)
    b = bn_bias.astype(f32) - bn_mean.astype(f32) * inv
    w_amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))  # per output channel
    sw = jnp.maximum(w_amax, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    sx = jnp.maximum(act_amax.astype(f32), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(f32) / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        (strides, strides),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(f32) * (sx * sw) + b
    if act == "leaky":
        y = jax.nn.leaky_relu(y, 0.1)
    elif act == "relu":
        y = jax.nn.relu(y)
    elif act != "none":
        raise ValueError(f"act={act!r} is not one of 'leaky'/'relu'/'none'")
    return y.astype(out_dtype)


def calibrate(module, variables, batches: Iterable, **apply_kwargs):
    """Record activation ranges over ``batches``; returns variables with the
    populated ``"quant"`` collection merged in.

    ``module`` must be built with a ``quant="int8"`` policy.  Each batch is
    the positional input(s) to ``module.apply`` — a single array or a tuple.
    Extra keyword args (e.g. ``train=False`` is implied) pass through.
    """
    variables = dict(variables)
    with calibration():
        fn = jax.jit(
            lambda v, args: module.apply(
                v, *args, train=False, mutable=["quant"], **apply_kwargs
            )[1]
        )
        n = 0
        for batch in batches:
            if not isinstance(batch, (tuple, list)):
                batch = (batch,)
            mutated = fn(variables, tuple(batch))
            if not mutated.get("quant"):
                raise ValueError(
                    "model has no quant-aware conv cells — was the module "
                    "built with a quant policy (e.g. INT8_POLICY)?"
                )
            variables["quant"] = mutated["quant"]
            n += 1
    if n == 0:
        raise ValueError("calibrate() got an empty batch iterable")
    check_calibrated(variables)
    return variables


def check_calibrated(variables) -> None:
    """Raise unless every recorded activation range is present and positive
    (an all-zero range means the cell never saw calibration data)."""
    q = variables.get("quant")
    if not q:
        raise ValueError(
            "int8 inference needs calibrated activation ranges: run "
            "viddet_tpu.quant.calibrate(module, variables, batches) first"
        )
    bad = [
        path
        for path, leaf in jax.tree_util.tree_flatten_with_path(q)[0]
        if float(jnp.min(leaf)) <= 0.0
    ]
    if bad:
        raise ValueError(
            f"{len(bad)} uncalibrated (non-positive) activation ranges, "
            f"e.g. {bad[:3]} — calibration data never reached these cells"
        )
