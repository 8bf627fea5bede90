"""Weight converter: foreign-layout dump -> our tree, value-exact."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tools.convert_weights import convert, target_leaves_in_order
from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.models.yolo3 import YOLOv3


def test_roundtrip_through_foreign_layout():
    module = YOLOv3(num_classes=3, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v1 = module.init(jax.random.key(1), x, train=False)
    v2 = module.init(jax.random.key(2), x, train=False)

    # export v1 in "mxnet-like" layout/order (conv OIHW, bn arrays 1-D)
    src_items = []
    for i, (path, arr, store, kind) in enumerate(
        target_leaves_in_order(v1["params"], v1["batch_stats"])
    ):
        arr = np.asarray(arr)
        if kind == "conv_kernel":
            src_items.append((f"{i}_conv_weight", np.transpose(arr, (3, 2, 0, 1))))
        elif kind == "dense_kernel":
            src_items.append((f"{i}_dense_weight", arr.T))
        elif kind == "scale":
            src_items.append((f"{i}_bn_gamma", arr))
        elif kind == "mean":
            src_items.append((f"{i}_bn_running_mean", arr))
        elif kind == "var":
            src_items.append((f"{i}_bn_running_var", arr))
        else:
            name = "bn_beta" if path[-2].startswith("BatchNorm") else "bias"
            src_items.append((f"{i}_{name}", arr))

    params, stats, n_filled, n_targets = convert(
        src_items, v2["params"], v2["batch_stats"]
    )
    assert n_filled == n_targets

    want = [np.asarray(a) for a in jax.tree.leaves(v1["params"])]
    got = [np.asarray(a) for a in jax.tree.leaves(params)]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a, b)
    want_s = [np.asarray(a) for a in jax.tree.leaves(v1["batch_stats"])]
    got_s = [np.asarray(a) for a in jax.tree.leaves(stats)]
    for a, b in zip(want_s, got_s):
        np.testing.assert_array_equal(a, b)


def test_darknet_weights_roundtrip(tmp_path):
    """export -> .weights file -> import == identity on every leaf.

    Pins the darknet binary format handling (header, per-layer
    beta/gamma/mean/var vs bias interleave, OIHW flattening) and the
    cfg-order == construction-order mapping against ourselves; parity
    against an official yolov3.weights file is deferred with the golden
    gates (no network in this environment)."""
    from tools.darknet_weights import (
        conv_layer_specs,
        read_darknet_weights,
        write_darknet_weights,
    )

    module = YOLOv3(num_classes=3, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v1 = module.init(jax.random.key(3), x, train=False)
    # distinct values everywhere so any mis-assignment cannot cancel out
    leaves, treedef = jax.tree.flatten(v1)
    rng = np.random.default_rng(0)
    leaves = [jnp.asarray(rng.normal(size=np.shape(l)).astype(np.float32))
              for l in leaves]
    v1 = jax.tree.unflatten(treedef, leaves)

    path = str(tmp_path / "m.weights")
    n_convs = write_darknet_weights(path, v1["params"], v1["batch_stats"])
    specs = conv_layer_specs(v1["params"])
    assert len(specs) == n_convs
    # tiny yolov3: 2 output convs carry a bias, every other conv is BN'd
    assert sum(1 for _, has_bias in specs if has_bias) == 2

    items = read_darknet_weights(path, specs)
    params, stats, n_filled, n_targets = convert(
        items, v1["params"], v1["batch_stats"]
    )
    assert n_filled == n_targets
    for a, b in zip(jax.tree.leaves(v1["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(v1["batch_stats"]), jax.tree.leaves(stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_darknet_weights_rejects_mismatched_file(tmp_path):
    from tools.darknet_weights import conv_layer_specs, read_darknet_weights

    module = YOLOv3(num_classes=3, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = module.init(jax.random.key(4), x, train=False)
    specs = conv_layer_specs(v["params"])

    path = str(tmp_path / "short.weights")
    with open(path, "wb") as f:
        np.asarray([0, 2, 0], np.int32).tofile(f)
        np.asarray([0], np.int64).tofile(f)
        np.zeros(100, np.float32).tofile(f)  # far too short
    import pytest

    with pytest.raises(ValueError, match="truncated|left after"):
        read_darknet_weights(path, specs)


def test_darknet_weights_truncation_names_the_tensor(tmp_path):
    """A file cut inside a BN block must error on THAT tensor (advisor
    r4: a short gamma surfacing later as 'truncated at conv weight'
    points debugging at the wrong layer)."""
    from tools.darknet_weights import conv_layer_specs, read_darknet_weights

    module = YOLOv3(num_classes=3, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = module.init(jax.random.key(4), x, train=False)
    specs = conv_layer_specs(v["params"])

    # conv 0 is BN'd with `o` output channels: beta reads fully, gamma is cut
    o = specs[0][0][0]
    path = str(tmp_path / "cut.weights")
    with open(path, "wb") as f:
        np.asarray([0, 2, 0], np.int32).tofile(f)
        np.asarray([0], np.int64).tofile(f)
        np.zeros(o + o // 2, np.float32).tofile(f)  # beta + half of gamma
    import pytest

    with pytest.raises(ValueError, match=r"conv 0 BN gamma"):
        read_darknet_weights(path, specs)


import pytest as _pytest


def yolov3_cfg_conv_specs():
    """((out, in, k, k), has_bias) for yolov3.cfg's 75 convs, in FILE order.

    Transcribed from the official cfg structure (darknet53 backbone;
    per scale: 5-conv block, tip, linear output conv; 1x1 lateral +
    upsample between scales), INDEPENDENT of this repo's module tree —
    so a construction-order drift in models/yolo3.py fails here locally
    without needing the official yolov3.weights file.
    """
    specs = []

    def conv(o, i, k, bias=False):
        specs.append(((o, i, k, k), bias))

    conv(32, 3, 3)
    in_c = 32
    for out_c, blocks in [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]:
        conv(out_c, in_c, 3)  # stride-2 downsample
        for _ in range(blocks):
            conv(out_c // 2, out_c, 1)
            conv(out_c, out_c // 2, 3)
        in_c = out_c

    def scale(in_c, mid):
        conv(mid, in_c, 1)
        conv(mid * 2, mid, 3)
        conv(mid, mid * 2, 1)
        conv(mid * 2, mid, 3)
        conv(mid, mid * 2, 1)
        conv(mid * 2, mid, 3)  # tip
        conv(255, mid * 2, 1, bias=True)  # 3 anchors * (5 + 80 classes)

    scale(1024, 512)
    conv(256, 512, 1)  # lateral into scale 2
    scale(256 + 512, 256)  # upsampled lateral + stage-4 route
    conv(128, 256, 1)  # lateral into scale 3
    scale(128 + 256, 128)  # upsampled lateral + stage-3 route
    return specs


@_pytest.mark.slow
def test_darknet_weights_roundtrip_darknet53(tmp_path):
    """Full-size check: the 75-conv darknet53+head interleave (backbone,
    per-scale 5-conv blocks, tips, biased output convs, lateral convs
    between scales) survives export -> import bit-exactly, and the
    construction-order spec list equals the hard-coded yolov3.cfg
    sequence layer by layer.  Slow: one full model init on CPU."""
    from tools.darknet_weights import (
        conv_layer_specs,
        read_darknet_weights,
        write_darknet_weights,
    )
    from viddet_tpu.models import get_model

    module, _ = get_model("yolo3_darknet53_coco")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = module.init(jax.random.key(5), x, train=False)

    specs = conv_layer_specs(v["params"])
    assert specs == yolov3_cfg_conv_specs()  # full per-layer cfg-order pin
    assert len(specs) == 75  # yolov3.cfg conv count
    assert sum(1 for _, has_bias in specs if has_bias) == 3  # output convs

    path = str(tmp_path / "d53.weights")
    write_darknet_weights(path, v["params"], v["batch_stats"])
    items = read_darknet_weights(path, specs)
    params, stats, n_filled, n_targets = convert(items, v["params"], v["batch_stats"])
    assert n_filled == n_targets
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(v["batch_stats"]), jax.tree.leaves(stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
