import jax.numpy as jnp
import numpy as np

from viddet_tpu.models.yolo3 import ANCHORS_DARKNET53, STRIDES_DARKNET53
from viddet_tpu.train.targets import assign_targets

KW = dict(
    image_size=(416, 416),
    strides=STRIDES_DARKNET53,
    anchors=ANCHORS_DARKNET53,
    num_classes=20,
)


def test_single_box_assignment():
    # GT sized exactly like anchor (116, 90) -> matches scale 0 (stride 32),
    # anchor 0. Center at (208, 208) -> cell (6, 6) of the 13x13 grid.
    cx, cy, w, h = 208.0, 208.0, 116.0, 90.0
    gt_boxes = jnp.array([[[cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]]])
    gt_ids = jnp.array([[3]])
    t = assign_targets(gt_boxes, gt_ids, None, **KW)

    flat = (6 * 13 + 6) * 3 + 0  # deepest-first: scale 0 starts at 0
    obj = np.asarray(t["objectness"][0, :, 0])
    assert obj[flat] == 1.0
    assert obj.sum() == 1.0
    np.testing.assert_allclose(
        np.asarray(t["center"][0, flat]), [208 / 32 - 6, 208 / 32 - 6], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(t["scale"][0, flat]), [0.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(t["weight"][0, flat]),
        [2 - 116 * 90 / 416**2] * 2,
        atol=1e-5,
    )
    cls = np.asarray(t["class_onehot"][0, flat])
    assert cls[3] == 1.0 and cls.sum() == 1.0


def test_small_box_goes_to_fine_scale():
    # GT sized like anchor (10, 13) -> scale 2 (stride 8), anchor 0.
    cx, cy, w, h = 100.0, 60.0, 10.0, 13.0
    gt_boxes = jnp.array([[[cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]]])
    gt_ids = jnp.array([[0]])
    t = assign_targets(gt_boxes, gt_ids, None, **KW)
    n32, n16 = 13 * 13 * 3, 26 * 26 * 3
    col, row = int(100 // 8), int(60 // 8)
    flat = n32 + n16 + (row * 52 + col) * 3 + 0
    obj = np.asarray(t["objectness"][0, :, 0])
    assert obj[flat] == 1.0 and obj.sum() == 1.0


def test_padding_boxes_produce_no_targets():
    gt_boxes = -jnp.ones((2, 5, 4))
    gt_ids = -jnp.ones((2, 5), jnp.int32)
    t = assign_targets(gt_boxes, gt_ids, None, **KW)
    for key in ("objectness", "weight", "class_mask"):
        assert float(jnp.sum(t[key])) == 0.0


def test_mixup_weight_propagates():
    cx, cy, w, h = 208.0, 208.0, 116.0, 90.0
    gt_boxes = jnp.array([[[cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]]])
    gt_ids = jnp.array([[3]])
    gt_w = jnp.array([[0.6]])
    t = assign_targets(gt_boxes, gt_ids, gt_w, **KW)
    assert abs(float(jnp.max(t["objectness"])) - 0.6) < 1e-6
