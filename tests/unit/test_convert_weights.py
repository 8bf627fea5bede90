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


import pytest as _pytest


@_pytest.mark.slow
def test_darknet_weights_roundtrip_darknet53(tmp_path):
    """Full-size check: the 75-conv darknet53+head interleave (backbone,
    per-scale 5-conv blocks, tips, biased output convs, lateral convs
    between scales) survives export -> import bit-exactly.  Slow: one
    full model init on CPU."""
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
