"""Overfit-to-mAP validation for every model family (run on TPU or CPU).

The reference ecosystem validated correctness by reproducing model-zoo mAP
(SURVEY.md §6); without network access this is the equivalent gate: each
family must drive a tiny synthetic dataset to mAP ≈ 1.0 through its full
pipeline (targets/sampling, loss, optimizer, decode, NMS).

Results (TPU v5e, 2026-08-16, 400 steps, 8 images, 3 classes):
  yolo3 (tiny, 64px, CPU suite)  mAP 1.0   (tests/integration/test_overfit_map.py)
  ssd   (resnet50, 256px)        mAP 1.0   (final loss 0.033)
  frcnn (resnet50-fpn, 256px)    mAP 1.0   (final loss 0.084)

Usage: python tools/overfit_check.py --family ssd|frcnn|yolo3 [--steps 400]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_fixed_batch(size, num_classes, n=8, seed=3):
    import jax.numpy as jnp

    from viddet_tpu.data.loader import pad_label
    from viddet_tpu.data.synthetic import SyntheticDetection
    from viddet_tpu.data.transforms import ValTransform

    ds = SyntheticDetection(num_images=n, size=size, num_classes=num_classes, seed=seed)
    tf = ValTransform(size=(size, size))
    images, labels = [], []
    for i in range(len(ds)):
        img, lab = ds[i]
        x, lab_t, _ = tf(img, lab)
        images.append(x)
        labels.append(pad_label(lab_t, 10))
    labels = np.stack(labels)
    return (
        jnp.asarray(np.stack(images)),
        jnp.asarray(labels[:, :, :4]),
        jnp.asarray(labels[:, :, 4].astype(np.int32)),
        labels,
    )


def eval_map(boxes, ids, scores, labels, num_classes):
    from viddet_tpu.eval.voc_map import VOCMApMetric

    metric = VOCMApMetric(class_names=[f"c{i}" for i in range(num_classes)])
    metric.update(
        np.asarray(boxes), np.asarray(ids), np.asarray(scores),
        labels[:, :, :4], labels[:, :, 4],
    )
    names, values = metric.get()
    return dict(zip(names, values))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", choices=["yolo3", "ssd", "frcnn"], required=True)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from viddet_tpu.train.state import TrainState, make_lr_schedule, make_optimizer

    nc = 3
    images, gt_boxes, gt_ids, labels = build_fixed_batch(args.size, nc)
    tx = make_optimizer(
        make_lr_schedule(args.lr, 1, warmup_epochs=50), weight_decay=0.0
    )

    if args.family == "yolo3":
        from viddet_tpu.models.yolo3 import YOLOv3, forward_and_postprocess
        from viddet_tpu.train.loop import make_train_step

        module = YOLOv3(num_classes=nc, backbone="darknet53")
        variables = module.init(jax.random.key(0), images, train=True)
        state = TrainState.create(
            params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
        )
        anchors, strides, _ = module._config()
        step = make_train_step(
            module,
            strides=tuple(strides),
            anchors=tuple(tuple(tuple(a) for a in s) for s in anchors),
            num_classes=nc,
        )
        for i in range(args.steps):
            state, losses = step(state, images, gt_boxes, gt_ids)
            if i % 50 == 0:
                print(i, round(float(losses["total"]), 3), flush=True)
        out = forward_and_postprocess(
            module, {"params": state.params, "batch_stats": state.batch_stats}, images
        )
        result = eval_map(out[2], out[0], out[1], labels, nc)
    elif args.family == "ssd":
        from viddet_tpu.models import ssd as S
        from viddet_tpu.train.loop import make_ssd_train_step

        module = S.SSD(num_classes=nc, image_size=args.size)
        variables = module.init(jax.random.key(0), images, train=True)
        state = TrainState.create(
            params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
        )
        step = make_ssd_train_step(module)
        for i in range(args.steps):
            state, losses = step(state, images, gt_boxes, gt_ids)
            if i % 50 == 0:
                print(i, round(float(losses["total"]), 3), flush=True)
        ids, scores, boxes = S.ssd_forward_and_postprocess(
            module, {"params": state.params, "batch_stats": state.batch_stats}, images
        )
        result = eval_map(boxes, ids, scores, labels, nc)
    else:
        from viddet_tpu.models import faster_rcnn as F
        from viddet_tpu.train.loop import make_frcnn_train_step

        cfg = F.FRCNNConfig(
            rpn_pre_nms_topk=500, rpn_nms_input=500, rpn_post_nms_train=256,
            rpn_post_nms_test=100, roi_batch=128,
        )
        module = F.FasterRCNN(num_classes=nc, config=cfg)
        variables = module.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(1)},
            images, gt_boxes, gt_ids, train=True,
        )
        state = TrainState.create(
            params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
        )
        step = make_frcnn_train_step(module)
        key = jax.random.key(7)
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            state, losses = step(state, sub, images, gt_boxes, gt_ids)
            if i % 50 == 0:
                print(i, {k: round(float(v), 3) for k, v in losses.items()}, flush=True)
        ids, scores, boxes = F.frcnn_forward_and_postprocess(
            module, {"params": state.params, "batch_stats": state.batch_stats}, images
        )
        result = eval_map(boxes, ids, scores, labels, nc)

    print("FINAL:", result)
    assert result["mAP"] > 0.85, result
    print("OVERFIT GATE PASSED")


if __name__ == "__main__":
    main()
