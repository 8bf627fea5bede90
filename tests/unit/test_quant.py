"""Int8 PTQ path (viddet_tpu/quant.py + the ConvBNLeaky int8 branch).

The reference has no quantization (SURVEY.md §5 — MXNet f32); these gates
pin the TPU-native PTQ feature's correctness on CPU:

* exact-representability: when activations and BN-folded weights are exact
  int8 grid points, the quantized cell must equal the float cell bit-for-bit
  (the only error sources are round/clip, which are zero by construction);
* calibration records the abs-max across ALL batches and is monotone;
* an end-to-end quantized tiny-YOLOv3 stays numerically close to its float
  twin (same trained variables) and runs under jit with static shapes;
* uncalibrated deploy is a hard, actionable error.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu import quant
from viddet_tpu.core.precision import INT8_POLICY, FLOAT32_POLICY, Policy
from viddet_tpu.models.common import ConvBNLeaky
from viddet_tpu.models.yolo3 import YOLOv3

F32_INT8 = Policy(compute_dtype=jnp.float32, quant="int8")


def test_int8_cell_exact_on_grid_points():
    """Grid-point inputs/weights quantize losslessly -> bit-equal outputs."""
    rng = np.random.default_rng(0)
    cin, cout, h = 8, 16, 12
    # activations: multiples of sx = amax/127 with |x| <= amax
    amax = 63.5  # sx = 0.5
    x = jnp.asarray(
        rng.integers(-127, 128, size=(2, h, h, cin)).astype(np.float32) * 0.5
    )
    # identity BN fold (scale = sqrt(var + eps)) and integer weights in
    # [-127, 127] with max exactly 127 -> sw = 1, wq = w exactly
    w = rng.integers(-127, 128, size=(3, 3, cin, cout)).astype(np.float32)
    w[0, 0, 0, :] = 127.0
    eps = 1e-5
    var = jnp.ones((cout,), jnp.float32)
    scale = jnp.sqrt(var + eps)
    bias = jnp.asarray(rng.normal(size=cout).astype(np.float32))
    mean = jnp.zeros((cout,), jnp.float32)

    got = quant.int8_conv_bn(
        x, jnp.asarray(w), scale, bias, mean, var,
        jnp.asarray(amax, jnp.float32), strides=1, out_dtype=jnp.float32,
    )
    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    ref = jax.nn.leaky_relu(ref, 0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-4)


def test_int8_cell_stride2_shapes_and_error_bound():
    """Random case: stride-2 output shape + quantization error stays small
    relative to activation magnitude (per-tensor int8 => ~1/254 resolution)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, 8, 16)) * 0.2).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=16).astype(np.float32))
    mean = jnp.asarray((rng.normal(size=16) * 0.1).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32))
    amax = jnp.max(jnp.abs(x))

    got = quant.int8_conv_bn(
        x, w, scale, bias, mean, var, amax, strides=2, out_dtype=jnp.float32
    )
    inv = scale / jnp.sqrt(var + 1e-5)
    ref = jax.lax.conv_general_dilated(
        x, w * inv, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + (bias - mean * inv)
    ref = jax.nn.leaky_relu(ref, 0.1)
    assert got.shape == ref.shape == (2, 8, 8, 16)
    err = float(jnp.max(jnp.abs(got - ref)))
    # 3x3x8 accumulation of ~unit values at int8 resolution
    assert err < 0.15, err


def _apply_cell(module, variables, x, **kw):
    return module.apply(variables, x, train=False, **kw)


def test_calibration_records_absmax_and_is_monotone():
    module = ConvBNLeaky(4, 3, policy=F32_INT8)
    x0 = jnp.zeros((1, 8, 8, 4), jnp.float32)
    variables = module.init(jax.random.key(0), x0, train=True)
    b1 = jnp.full((1, 8, 8, 4), 2.0, jnp.float32)
    b2 = jnp.full((1, 8, 8, 4), -5.0, jnp.float32)
    calibrated = quant.calibrate(module, variables, [b1, b2])
    amax = float(jax.tree_util.tree_leaves(calibrated["quant"])[0])
    assert amax == 5.0
    # a third, smaller batch must not shrink the range
    again = quant.calibrate(module, calibrated, [b1])
    assert float(jax.tree_util.tree_leaves(again["quant"])[0]) == 5.0


def test_uncalibrated_deploy_raises():
    module = ConvBNLeaky(4, 3, policy=F32_INT8)
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=True)
    with pytest.raises(ValueError, match="calibrate"):
        quant.check_calibrated(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]}
        )
    # all-zero ranges (init state, calibration never ran) are also rejected
    with pytest.raises(ValueError, match="uncalibrated"):
        quant.check_calibrated(variables)


def test_quantized_tiny_yolo_close_to_float_twin():
    """Same trained variables through the float and int8 modules: head
    outputs must correlate tightly (random-init weights, fixed seed)."""
    kw = dict(
        num_classes=3, backbone="tiny",
        anchors=(((40, 40), (24, 48), (48, 24)),
                 ((10, 10), (16, 8), (8, 16))),
        strides=(32, 16),
    )
    f_module = YOLOv3(policy=FLOAT32_POLICY, **kw)
    q_module = YOLOv3(policy=F32_INT8, **kw)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32))
    variables = f_module.init(jax.random.key(0), images, train=False)

    calibrated = quant.calibrate(q_module, dict(variables), [images])
    f_out = jax.jit(lambda v, x: _apply_cell(f_module, v, x))(variables, images)
    q_out = jax.jit(lambda v, x: _apply_cell(q_module, v, x))(calibrated, images)

    for key in ("obj_logit", "cls_max"):
        a = np.asarray(f_out[key], np.float64).ravel()
        b = np.asarray(q_out[key], np.float64).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.99, (key, corr)
    # decoded boxes stay finite and in-image-order magnitude
    assert bool(jnp.all(jnp.isfinite(q_out["boxes"])))


def test_quantized_ssd_resnet_close_to_float_twin():
    """ResNet's _ConvBN honors the same PTQ flow: quantized SSD class
    logits track the float twin's."""
    from viddet_tpu.models.ssd import SSD

    # shallow backbone: the PTQ flow through ResNet's _ConvBN (BN folding,
    # per-channel scales, requant epilogues) is identical at any depth
    shallow = dict(backbone_blocks=(1, 1, 1, 1), backbone_widths=(8, 16, 32, 64))
    f_module = SSD(num_classes=3, image_size=128, policy=FLOAT32_POLICY, **shallow)
    q_module = SSD(num_classes=3, image_size=128, policy=F32_INT8, **shallow)
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32))
    variables = f_module.init(jax.random.key(0), images, train=False)

    calibrated = quant.calibrate(q_module, dict(variables), [images])
    f_out = jax.jit(lambda v, x: _apply_cell(f_module, v, x))(variables, images)
    q_out = jax.jit(lambda v, x: _apply_cell(q_module, v, x))(calibrated, images)

    a = np.asarray(f_out["cls_logits"], np.float64).ravel()
    b = np.asarray(q_out["cls_logits"], np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_int8_policy_trains_on_float_path():
    """train=True with a quant policy must not quantize (PTQ is
    inference-only); gradients flow and the quant collection is inert."""
    module = ConvBNLeaky(4, 3, policy=F32_INT8)
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=True)
    assert "quant" in variables

    def loss(params):
        out, _ = module.apply(
            {**variables, "params": params}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree_util.tree_leaves(g)
    )
