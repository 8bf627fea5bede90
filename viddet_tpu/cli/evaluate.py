"""Evaluation CLI — mAP on VOC / COCO / DET / VID.

Rebuild of the reference's ``evaluate.py`` (SURVEY.md §4.2): build the val
loader and dataset metric, run the fused forward+NMS, rescale detections to
original image coordinates, accumulate, print the per-class table.

Example:
  python -m viddet_tpu.cli.evaluate --network yolo3_darknet53 --dataset voc \
      --data-root /data/VOCdevkit --weights model.npz --data-shape 416
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.cli.common import build_model, get_dataset, load_weights, setup_logging
from viddet_tpu.data.loader import DetectionLoader
from viddet_tpu.data.transforms import ValTransform, invert_affine_to_boxes


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a detector.")
    p.add_argument("--network", default="yolo3_darknet53")
    p.add_argument("--dataset", default="voc")
    p.add_argument("--data-root", required=True)
    p.add_argument("--weights", default="", help=".npz weights (random if empty)")
    p.add_argument("--data-shape", type=int, default=416)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--letterbox", action="store_true", default=False)
    p.add_argument("--max-images", type=int, default=0, help="0 = all")
    p.add_argument("--save-detections", default="",
                   help="write per-image detections (original coords) to "
                        "this jsonl file while evaluating")
    p.add_argument("--from-detections", default="",
                   help="re-score a saved detections jsonl against the "
                        "dataset GT without running the model (the "
                        "reference evaluate.py's write/read detection "
                        "files — SURVEY.md §4.2)")
    p.add_argument("--device-normalize", action="store_true",
                   help="ship raw uint8 val batches and normalize in-graph "
                        "(4x smaller host->device transfers; detections "
                        "equal within 1 ulp of the host-normalized path)")
    p.add_argument("--temporal-k", type=int, default=1,
                   help="k-frame clip window for VID temporal models")
    p.add_argument("--temporal-stride", type=int, default=1)
    p.add_argument("--temporal-agg", default="max",
                   choices=["stack", "max", "mean", "conv"])
    from viddet_tpu.cli.common import add_quant_flags, parse_with_config
    add_quant_flags(p)
    return parse_with_config(p, argv)


def evaluate(module, variables, dataset, metric, args, logger):
    from viddet_tpu.cli.common import make_predictor
    from viddet_tpu.parallel.mesh import make_mesh, put_batch, replicate

    infer = make_predictor(module)

    size = (args.data_shape, args.data_shape)
    if getattr(args, "temporal_k", 1) > 1:
        from viddet_tpu.data.clip_transforms import ClipValTransform

        transform = ClipValTransform(
            size=size, letterbox_resize=args.letterbox, k=args.temporal_k,
            normalize=not args.device_normalize,
        )
    else:
        transform = ValTransform(size=size, letterbox_resize=args.letterbox,
                                 normalize=not args.device_normalize)
    # Multi-host eval sharding: each process takes a disjoint strided slice
    # of the val set (the loader keeps uneven tails — eval must not drop
    # images), runs it on its local devices, and the metric states are
    # all-gathered + merged afterwards (eval/distributed.py).
    # VIDDET_EVAL_SHARD=i,count forces a shard in a single-process job
    # (used by the sharded==unsharded regression tests).
    import os as _os

    shard_env = _os.environ.get("VIDDET_EVAL_SHARD", "")
    if shard_env:
        shard = tuple(int(x) for x in shard_env.split(","))
    elif jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    else:
        shard = None
    loader = DetectionLoader(
        dataset,
        transform,
        batch_size=args.batch_size,
        train=False,
        num_workers=args.num_workers,
        shard=shard,
    )

    if getattr(args, "quant", ""):
        from viddet_tpu.cli.common import calibrate_variables

        calib, it = [], iter(loader)
        try:
            for _ in range(max(1, args.calib_batches)):
                try:
                    images = next(it)[0]
                    if images.dtype == np.uint8:
                        # calibration applies the module directly (not the
                        # dtype-keyed predictor) — normalize on host first
                        from viddet_tpu.data.transforms import normalize

                        images = normalize(images)
                    calib.append(jnp.asarray(images))
                except StopIteration:
                    break
        finally:
            it.close()
        variables = calibrate_variables(module, variables, calib, logger)

    # Multi-chip eval: shard the batch over the data mesh (the reference
    # splits eval batches across GPUs the same way — SURVEY.md §4.2); GSPMD
    # needs the batch divisible by the device count, else fall back to the
    # default single-device placement.
    mesh = make_mesh()
    # Within-process device sharding splits each batch over local devices;
    # across processes the LOADER shard above already partitions the image
    # set, so each process computes on its own slice and only the final
    # metric-state gather is collective.
    sharded = (
        jax.process_count() == 1
        and mesh.devices.size > 1
        and args.batch_size % mesh.devices.size == 0
    )
    if sharded:
        variables = jax.device_put(variables, replicate(mesh))
        logger.info("eval sharded over %d device(s)", mesh.devices.size)
    elif jax.process_count() > 1:
        logger.info(
            "multi-host eval: process %d/%d takes a strided shard of "
            "%d image(s); metric states merged after the loop",
            jax.process_index(), jax.process_count(), len(dataset),
        )
    elif mesh.devices.size > 1:
        logger.info(
            "eval on 1 device (batch %d not divisible by %d devices)",
            args.batch_size, mesh.devices.size,
        )

    t0 = time.time()
    seen = 0
    det_path = args.save_detections
    if det_path and jax.process_count() > 1:
        # one detections file per process shard; merge with plain concat
        det_path = f"{det_path}.p{jax.process_index()}"
    det_file = open(det_path, "w") if det_path else None
    try:
        # explicit iterator so an early --max-images break closes the
        # generator deterministically (its finally stops prefetch workers)
        batches = iter(loader)
        for images, gt_boxes, gt_ids, difficult, affines, idxs in batches:
            batch = images
            if batch.shape[0] < args.batch_size:  # pad last batch: one XLA shape
                pad = args.batch_size - batch.shape[0]
                batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            device_batch = jnp.asarray(batch)
            if sharded:
                device_batch = put_batch(device_batch, mesh)
            ids, scores, boxes = (np.asarray(r) for r in infer(variables, device_batch))
            n = images.shape[0]
            ids, scores, boxes = ids[:n], scores[:n], boxes[:n]
            # metric protocol runs in ORIGINAL image coordinates
            boxes_orig = np.stack(
                [invert_affine_to_boxes(boxes[i], affines[i]) for i in range(n)]
            )
            gt_orig = np.stack(
                [invert_affine_to_boxes(gt_boxes[i], affines[i]) for i in range(n)]
            )
            gt_orig[gt_ids < 0] = -1.0
            if hasattr(metric, "update_with_indices"):
                metric.update_with_indices(boxes_orig, ids, scores, idxs[:n])
            else:
                metric.update(boxes_orig, ids, scores, gt_orig, gt_ids[:n], difficult[:n] if difficult is not None else None)
            if det_file is not None:
                for i in range(n):
                    keep = ids[i] >= 0
                    det_file.write(json.dumps({
                        "index": int(idxs[i]),
                        "ids": ids[i][keep].astype(int).tolist(),
                        "scores": scores[i][keep].astype(float).tolist(),
                        "boxes": boxes_orig[i][keep].astype(float).tolist(),
                    }) + "\n")
            seen += n
            if args.max_images and seen >= args.max_images:
                batches.close()
                break
    finally:
        if det_file is not None:
            det_file.close()
            logger.info("detections written to %s", det_path)
    dt = time.time() - t0
    logger.info("evaluated %d images in %.1fs (%.1f img/s)", seen, dt, seen / dt)
    if jax.process_count() > 1:
        from viddet_tpu.eval.distributed import gather_states, merge_metric_states

        states = gather_states(metric.state_dict())
        merge_metric_states(metric, states)
        logger.info("merged metric state from %d process(es)", len(states))
    return metric.get()


def rescore_from_detections(dataset, metric, path, logger):
    """Feed a saved detections jsonl back into the metric — no model run.

    The reference's evaluate.py can re-score previously written detection
    files (SURVEY.md §4.2); detections were saved in ORIGINAL image
    coordinates, which is exactly the metric protocol, and GT comes from
    ``dataset.label(idx)`` without decoding images.
    """
    t0 = time.time()
    seen = 0
    with_idx = hasattr(metric, "update_with_indices")
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            idx = int(rec["index"])
            m = len(rec["ids"])
            ids = np.asarray(rec["ids"], np.float32).reshape(1, m)
            scores = np.asarray(rec["scores"], np.float32).reshape(1, m)
            boxes = np.asarray(rec["boxes"], np.float32).reshape(1, m, 4)
            if with_idx:
                metric.update_with_indices(boxes, ids, scores, [idx])
            else:
                label = dataset.label(idx)
                g = label.shape[0]
                metric.update(
                    boxes, ids, scores,
                    label[None, :, :4].astype(np.float32),
                    label[None, :, 4].astype(np.float32),
                    label[None, :, 5].astype(np.float32) if label.shape[1] > 5 else np.zeros((1, g), np.float32),
                )
            seen += 1
    logger.info(
        "re-scored %d images from %s in %.1fs", seen, path, time.time() - t0
    )
    return metric.get()


def main(argv=None):
    args = parse_args(argv)
    logger = setup_logging()
    temporal = args.temporal_k > 1
    ds_kw = (
        dict(window=args.temporal_k, stride=args.temporal_stride)
        if temporal and "vid" in args.dataset.split("+") else {}
    )
    dataset, metric_factory = get_dataset(
        args.dataset, args.data_root, split="val", **ds_kw
    )
    if args.from_detections:
        metric = metric_factory(list(dataset.classes))
        names, values = rescore_from_detections(
            dataset, metric, args.from_detections, logger
        )
        width = max(len(str(n)) for n in names)
        for name, value in zip(names, values):
            logger.info("%-*s %s", width, name,
                        f"{value:.4f}" if isinstance(value, float) else value)
        return
    from viddet_tpu.cli.common import quant_policy_kw

    qkw = quant_policy_kw(args)
    if temporal:
        from viddet_tpu.models.zoo import temporal_yolo3_custom

        backbone = "tiny" if "tiny" in args.network else "darknet53"
        module, class_names = temporal_yolo3_custom(
            dataset.classes, k=args.temporal_k,
            aggregation=args.temporal_agg, backbone=backbone, **qkw,
        )
    else:
        module, class_names = build_model(
            args.network, args.dataset, classes=dataset.classes, **qkw
        )
    variables = load_weights(module, args.weights, args.data_shape)
    metric = metric_factory(class_names)
    names, values = evaluate(module, variables, dataset, metric, args, logger)
    width = max(len(str(n)) for n in names)
    for name, value in zip(names, values):
        logger.info("%-*s %s", width, name, f"{value:.4f}" if isinstance(value, float) else value)


if __name__ == "__main__":
    main()
