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
