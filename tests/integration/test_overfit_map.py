"""End-to-end overfit test: synthetic dataset -> train -> eval -> mAP ≈ 1.

The reference ecosystem validated correctness by reproducing model-zoo mAP
(SURVEY.md §6); without network/weights, this is our equivalent gate: the
full pipeline (loader, transforms, in-step targets, DP train step, fused
forward+NMS, VOC metric) must be able to drive mAP to ~1.0 on a tiny
memorizable dataset.
"""

import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.data.loader import DetectionLoader, pad_label
from viddet_tpu.data.synthetic import SyntheticDetection
from viddet_tpu.data.transforms import ValTransform
from viddet_tpu.eval.voc_map import VOCMApMetric
from viddet_tpu.models.yolo3 import YOLOv3, NMSConfig, forward_and_postprocess
from viddet_tpu.train.loop import make_train_step
from viddet_tpu.train.state import TrainState, make_lr_schedule, make_optimizer

ANCHORS = (((40, 40), (24, 44), (44, 24)), ((14, 14), (10, 20), (20, 10)))
STRIDES = (32, 16)
SIZE = 64
NUM_CLASSES = 3


import pytest


@pytest.mark.slow
def test_overfit_reaches_high_map():
    ds = SyntheticDetection(num_images=8, size=SIZE, num_classes=NUM_CLASSES, seed=3)
    module = YOLOv3(
        num_classes=NUM_CLASSES, backbone="tiny", policy=FLOAT32_POLICY,
        anchors=ANCHORS, strides=STRIDES,
    )
    x0 = jnp.zeros((8, SIZE, SIZE, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x0, train=True)
    tx = make_optimizer(make_lr_schedule(1e-3, 1), weight_decay=0.0)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    step = make_train_step(
        module, strides=STRIDES, anchors=ANCHORS, num_classes=NUM_CLASSES
    )

    # fixed batch: the whole dataset through the val transform (deterministic)
    tf = ValTransform(size=(SIZE, SIZE))
    images, labels = [], []
    for i in range(len(ds)):
        img, lab = ds[i]
        x, lab_t, _ = tf(img, lab)
        images.append(x)
        labels.append(pad_label(lab_t, 10))
    images = jnp.asarray(np.stack(images))
    labels = np.stack(labels)
    gt_boxes = jnp.asarray(labels[:, :, :4])
    gt_ids = jnp.asarray(labels[:, :, 4].astype(np.int32))

    first = last = None
    for i in range(250):
        state, losses = step(state, images, gt_boxes, gt_ids)
        if first is None:
            first = float(losses["total"])
    last = float(losses["total"])
    assert last < 0.1 * first, (first, last)

    ids, scores, boxes = forward_and_postprocess(
        module,
        {"params": state.params, "batch_stats": state.batch_stats},
        images,
        NMSConfig(backend="xla"),
    )
    metric = VOCMApMetric(class_names=[f"c{i}" for i in range(NUM_CLASSES)])
    metric.update(
        np.asarray(boxes), np.asarray(ids), np.asarray(scores),
        labels[:, :, :4], labels[:, :, 4],
    )
    names, values = metric.get()
    assert values[-1] > 0.85, dict(zip(names, values))

    # mAP-retention gate for PTQ (PARITY.md "Int8 PTQ"): the int8-quantized
    # twin of the overfit model must keep (nearly) all of the float mAP.
    from viddet_tpu import quant
    from viddet_tpu.core.precision import Policy

    q_module = YOLOv3(
        num_classes=NUM_CLASSES, backbone="tiny",
        policy=Policy(compute_dtype=jnp.float32, quant="int8"),
        anchors=ANCHORS, strides=STRIDES,
    )
    q_vars = quant.calibrate(
        q_module,
        {"params": state.params, "batch_stats": state.batch_stats},
        [images],
    )
    q_ids, q_scores, q_boxes = forward_and_postprocess(
        q_module, q_vars, images, NMSConfig(backend="xla")
    )
    q_metric = VOCMApMetric(class_names=[f"c{i}" for i in range(NUM_CLASSES)])
    q_metric.update(
        np.asarray(q_boxes), np.asarray(q_ids), np.asarray(q_scores),
        labels[:, :, :4], labels[:, :, 4],
    )
    q_names, q_values = q_metric.get()
    assert q_values[-1] > 0.8 * values[-1], (
        dict(zip(names, values)), dict(zip(q_names, q_values))
    )
