"""YOLOv3 training CLI.

Rebuild of the reference's ``train_yolov3.py`` (SURVEY.md §4.1): same flag
surface (dataset, batch-size, epochs, lr schedule, warmup, mixup,
label-smooth, multi-scale random shapes, num-workers, resume, val/save/log
intervals), backed by the jitted DP train step (train/loop.py).

TPU-first differences from the reference, by design:
* target generation runs in-step on device, not in DataLoader workers;
* multi-scale sizes cycle through a fixed bucket list (320..608 step 64 by
  default) so XLA compiles a bounded set of executables;
* batches are sharded over the device mesh; no per-GPU Python loop;
* Orbax checkpoints carry the full TrainState (resume restores momentum).

Example (synthetic smoke run):
  python -m viddet_tpu.cli.train_yolov3 --dataset voc --data-root /data/VOCdevkit \
      --network yolo3_darknet53 --batch-size 32 --epochs 200
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.cli.common import build_model, get_dataset, setup_logging
from viddet_tpu.data.loader import DetectionLoader
from viddet_tpu.data.transforms import TrainTransform, ValTransform
from viddet_tpu.parallel.mesh import make_mesh, put_batch, replicate
from viddet_tpu.train.loop import make_eval_step, make_train_step
from viddet_tpu.train.state import (
    TrainState,
    latest_checkpoint,
    make_lr_schedule,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
    save_weights_npz,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train YOLOv3.")
    p.add_argument("--network", default="yolo3_darknet53")
    p.add_argument("--dataset", default="voc")
    p.add_argument("--data-root", required=True)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr-decay", type=float, default=0.1)
    p.add_argument("--lr-decay-epoch", default="160,180")
    p.add_argument("--warmup-epochs", type=float, default=2.0)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", type=float, default=5e-4)
    p.add_argument("--data-shape", type=int, default=416)
    p.add_argument("--no-random-shape", action="store_true")
    p.add_argument("--mixup", action="store_true")
    p.add_argument("--no-mixup-epochs", type=int, default=20,
                   help="disable mixup for the final N epochs")
    p.add_argument("--label-smooth", action="store_true")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--max-gt-boxes", type=int, default=100,
                   help="static GT pad per image; overflow boxes are dropped "
                        "and counted in the per-epoch log")
    p.add_argument("--temporal-k", type=int, default=1,
                   help="k-frame clip window (VID temporal models; 1 = single frame)")
    p.add_argument("--temporal-stride", type=int, default=1)
    p.add_argument("--temporal-agg", default="max",
                   choices=["stack", "max", "mean", "conv"])
    p.add_argument("--resume", default="", help="checkpoint dir/path to resume")
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--save-prefix", default="yolo3")
    p.add_argument("--save-interval", type=int, default=10)
    p.add_argument("--val-interval", type=int, default=10)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--seed", type=int, default=233)
    p.add_argument("--max-steps", type=int, default=0,
                   help="stop after N steps total (debug/smoke)")
    p.add_argument("--syncbn", action="store_true",
                   help="accepted for reference CLI parity; BatchNorm stats "
                        "are always global-batch under GSPMD (a superset)")
    p.add_argument("--profile", type=int, default=0,
                   help="trace N steps with jax.profiler into <save-prefix>_trace")
    p.add_argument("--fault-inject", type=int, default=0,
                   help="crash (after checkpointing) at step N — resume-path "
                        "test hook (SURVEY.md §5.3)")
    p.add_argument("--log-dataset-stats", action="store_true",
                   help="print per-class image/box counts before training")
    p.add_argument("--metrics-jsonl", default="",
                   help="append per-log-interval scalars to this jsonl file")
    p.add_argument("--tensorboard", action="store_true",
                   help="write scalars to <save-prefix>_tb (tensorboardX), "
                        "the reference's optional mxboard equivalent")
    p.add_argument("--precompile", action="store_true",
                   help="AOT-compile the train step for every multi-scale "
                        "bucket before the first epoch (N2 equivalent: fixed "
                        "executable set, no mid-epoch compile stalls)")
    from viddet_tpu.cli.common import parse_with_config
    return parse_with_config(p, argv)


def mixup_batch(images, boxes, ids, rng):
    """Image-level mixup: blend pairs, concatenate labels with weights."""
    b = images.shape[0]
    perm = rng.permutation(b)
    lam = rng.beta(1.5, 1.5, size=(b,)).astype(np.float32)
    lam = np.maximum(lam, 1.0 - lam)  # keep the primary image dominant
    lam_b = lam.reshape((b,) + (1,) * (images.ndim - 1))  # images or clips
    mixed = images.astype(np.float32) * lam_b + images[perm].astype(np.float32) * (1 - lam_b)
    if images.dtype == np.uint8:
        # keep the uint8 transfer path: quantizing the blend adds at most
        # 0.5/255 of noise to an augmentation that is itself random
        mixed = (mixed + 0.5).astype(np.uint8)
    boxes2 = np.concatenate([boxes, boxes[perm]], axis=1)
    ids2 = np.concatenate([ids, ids[perm]], axis=1)
    w = np.concatenate(
        [np.broadcast_to(lam[:, None], ids.shape),
         np.broadcast_to((1 - lam)[:, None], ids.shape)], axis=1,
    ).astype(np.float32)
    w = np.where(ids2 >= 0, w, 0.0)
    return mixed, boxes2, ids2, w


def main(argv=None):
    args = parse_args(argv)
    logger = setup_logging(args.save_prefix)
    logger.info("args: %s", vars(args))

    temporal = args.temporal_k > 1
    # window kwargs reach VID members only (combined names route them per
    # member — cli/common.get_dataset); still-image datasets are tiled into
    # static k-frame clips by the clip transforms below.
    ds_kw = (
        dict(window=args.temporal_k, stride=args.temporal_stride)
        if temporal and "vid" in args.dataset.split("+") else {}
    )
    train_ds, _ = get_dataset(args.dataset, args.data_root, split="train", **ds_kw)
    val_ds, metric_factory = get_dataset(
        args.dataset, args.data_root, split="val", **ds_kw
    )
    if temporal:
        from viddet_tpu.models.zoo import temporal_yolo3_custom

        backbone = "tiny" if "tiny" in args.network else "darknet53"
        module, class_names = temporal_yolo3_custom(
            train_ds.classes, k=args.temporal_k,
            aggregation=args.temporal_agg, backbone=backbone,
        )
    else:
        module, class_names = build_model(
            args.network, args.dataset, classes=train_ds.classes
        )
    num_classes = len(class_names)
    if args.log_dataset_stats:
        stats = train_ds.statistics()
        logger.info(
            "train dataset: %d images, %d boxes", stats["images"], stats["boxes"]
        )
        for cls, n in stats["boxes_per_class"].items():
            logger.info("  %-20s %6d boxes in %5d images",
                        cls, n, stats["images_per_class"][cls])

    shape = args.data_shape
    sizes = None if args.no_random_shape else [
        (s, s) for s in range(320, 609, 64)
    ]
    if temporal:
        from viddet_tpu.data.clip_transforms import ClipTrainTransform

        train_transform = ClipTrainTransform(
            size=(shape, shape), k=args.temporal_k, normalize=False
        )
    else:
        # uint8 batches + in-step normalize (train/loop._maybe_normalize):
        # 4x smaller host->device transfers, faster host loader
        train_transform = TrainTransform(size=(shape, shape), normalize=False)
    train_loader = DetectionLoader(
        train_ds,
        train_transform,
        batch_size=args.batch_size,
        train=True,
        sizes=sizes,
        num_workers=args.num_workers,
        seed=args.seed,
        max_boxes=args.max_gt_boxes,
        # multi-host: each process loads its disjoint strided shard of the
        # identically-shuffled global order (no cross-host communication)
        shard=(
            (jax.process_index(), jax.process_count())
            if jax.process_count() > 1 else None
        ),
    )
    steps_per_epoch = max(len(train_loader), 1)

    # --- state -------------------------------------------------------------
    x0 = (
        jnp.zeros((2, args.temporal_k, shape, shape, 3), jnp.float32)
        if temporal else jnp.zeros((2, shape, shape, 3), jnp.float32)
    )
    variables = module.init(jax.random.key(args.seed), x0, train=True)
    schedule = make_lr_schedule(
        args.lr,
        steps_per_epoch,
        warmup_epochs=args.warmup_epochs,
        decay_epochs=[int(e) for e in args.lr_decay_epoch.split(",") if e],
        decay_factor=args.lr_decay,
    )
    tx = make_optimizer(schedule, momentum=args.momentum, weight_decay=args.wd)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    start_epoch = args.start_epoch
    if args.resume:
        path = args.resume if os.path.basename(args.resume).startswith("step_") \
            else latest_checkpoint(args.resume)
        if path:
            state = restore_checkpoint(path, state)
            start_epoch = int(state.step) // steps_per_epoch
            logger.info("resumed from %s (step %d, epoch %d)",
                        path, int(state.step), start_epoch)

    mesh = make_mesh()
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicate(mesh)), state
    )
    logger.info("mesh: %d device(s); %d steps/epoch", mesh.devices.size, steps_per_epoch)

    anchors, strides, _ = module._config()
    train_step = make_train_step(
        module,
        strides=tuple(strides),
        anchors=tuple(tuple(tuple(a) for a in s) for s in anchors),
        num_classes=num_classes,
        label_smooth=args.label_smooth,
    )
    eval_step = make_eval_step(module)

    best_map = -1.0
    total_steps = 0
    mix_rng = np.random.default_rng(args.seed + 1)
    ckpt_dir = f"{args.save_prefix}_ckpt"
    tb_writer = None
    if args.tensorboard:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(f"{args.save_prefix}_tb")

    if args.precompile and sizes and not temporal:
        # warm every multi-scale bucket's executable up front (on a copied
        # state: the real step donates its input buffers)
        logger.info("precompiling %d bucket sizes...", len(sizes))
        for sh, sw in sizes:
            dummy_state = jax.tree_util.tree_map(jnp.copy, state)
            per = max(args.batch_size, 1)
            tic = time.time()
            # Dummies must match the real loop exactly — the jit cache keys
            # on shape, sharding AND call arity (an explicit trailing None is
            # a different entry from a defaulted one), so: GT pad width =
            # loader's static pad, batch through put_batch, gt_weights=None
            # passed positionally like the hot loop does
            train_step(
                dummy_state,
                *put_batch(
                    (
                        # dtype must match the hot loop's batches (uint8 for
                        # the device-normalize loader) — jit caches on dtype
                        jnp.zeros((per, sh, sw, 3),
                                  jnp.uint8
                                  if not getattr(train_transform, "normalize", True)
                                  else jnp.float32),
                        -jnp.ones((per, train_loader.max_boxes, 4), jnp.float32),
                        -jnp.ones((per, train_loader.max_boxes), jnp.int32),
                    ),
                    mesh,
                ),
                None,
            )
            logger.info("  %dx%d compiled in %.1fs", sh, sw, time.time() - tic)

    for epoch in range(start_epoch, args.epochs):
        tic = time.time()
        btic = time.time()
        running = {}
        use_mixup = args.mixup and epoch < args.epochs - args.no_mixup_epochs
        for i, (images, boxes, ids, _diff, _aff, _idx) in enumerate(train_loader):
            gt_weights = None
            if use_mixup:
                images, boxes, ids, gt_weights = mixup_batch(images, boxes, ids, mix_rng)
            batch = put_batch(
                (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(ids.astype(np.int32))),
                mesh,
            )
            gw = None if gt_weights is None else put_batch(jnp.asarray(gt_weights), mesh)
            if args.profile and total_steps == 5:
                jax.profiler.start_trace(f"{args.save_prefix}_trace")
            state, losses = train_step(state, *batch, gw)
            if args.profile and total_steps == 5 + args.profile:
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
                logger.info("profile trace written to %s_trace", args.save_prefix)
            total_steps += 1
            for k, v in losses.items():
                running[k] = running.get(k, 0.0) + float(v)
            if args.log_interval and (i + 1) % args.log_interval == 0:
                speed = args.log_interval * args.batch_size / (time.time() - btic)
                btic = time.time()
                means = {k: v / (i + 1) for k, v in running.items()}
                logger.info(
                    "[Epoch %d][Batch %d] speed: %.1f samples/sec, "
                    "ObjLoss=%.3f, BoxCenterLoss=%.3f, BoxScaleLoss=%.3f, ClassLoss=%.3f",
                    epoch, i + 1, speed,
                    means.get("obj", 0), means.get("center", 0),
                    means.get("scale", 0), means.get("cls", 0),
                )
                if args.metrics_jsonl:
                    import json

                    with open(args.metrics_jsonl, "a") as mf:
                        mf.write(json.dumps({
                            "step": total_steps, "epoch": epoch,
                            "samples_per_sec": round(speed, 2),
                            **{k: round(v, 5) for k, v in means.items()},
                        }) + "\n")
                if tb_writer is not None:
                    tb_writer.add_scalar("speed/samples_per_sec", speed, total_steps)
                    for k, v in means.items():
                        tb_writer.add_scalar(f"loss/{k}", v, total_steps)
            if args.fault_inject and total_steps == args.fault_inject:
                save_checkpoint(ckpt_dir, state, int(state.step), block=True)
                raise RuntimeError(
                    f"fault injected at step {total_steps} (checkpoint saved; "
                    f"resume with --resume {ckpt_dir})"
                )
            if args.max_steps and total_steps >= args.max_steps:
                logger.info("reached max-steps=%d, stopping", args.max_steps)
                save_checkpoint(ckpt_dir, state, int(state.step), block=True)
                return
        logger.info("[Epoch %d] done in %.1fs", epoch, time.time() - tic)
        if train_loader.dropped_boxes:
            logger.warning(
                "[Epoch %d] %d GT boxes dropped by --max-gt-boxes=%d pad",
                epoch, train_loader.dropped_boxes, args.max_gt_boxes,
            )

        if args.val_interval and (epoch + 1) % args.val_interval == 0:
            metric = validate(
                module, state, val_ds, metric_factory(class_names), args, eval_step
            )
            names, values = metric.get()
            logger.info("[Epoch %d] validation: %s=%.4f", epoch, names[-1], values[-1])
            if values[-1] > best_map:
                best_map = values[-1]
                save_weights_npz(
                    f"{args.save_prefix}_best.npz", state.params, state.batch_stats
                )
        if args.save_interval and (epoch + 1) % args.save_interval == 0:
            save_checkpoint(ckpt_dir, state, int(state.step))
    save_checkpoint(ckpt_dir, state, int(state.step), block=True)
    save_weights_npz(f"{args.save_prefix}_final.npz", state.params, state.batch_stats)


def validate(module, state, val_ds, metric, args, eval_step):
    from viddet_tpu.data.transforms import invert_affine_to_boxes

    if getattr(args, "temporal_k", 1) > 1:
        from viddet_tpu.data.clip_transforms import ClipValTransform

        val_transform = ClipValTransform(
            size=(args.data_shape, args.data_shape), k=args.temporal_k
        )
    else:
        val_transform = ValTransform(size=(args.data_shape, args.data_shape))
    loader = DetectionLoader(
        val_ds,
        val_transform,
        batch_size=args.batch_size,
        train=False,
        num_workers=args.num_workers,
    )
    # validation batches shard over the same mesh as training (params are
    # already replicated); single-device fallback on non-divisible batches
    mesh = make_mesh()
    shard_val = mesh.devices.size > 1 and args.batch_size % mesh.devices.size == 0
    for images, gt_boxes, gt_ids, difficult, affines, idxs in loader:
        n = images.shape[0]
        batch = images
        if n < args.batch_size:
            batch = np.concatenate(
                [batch, np.zeros((args.batch_size - n,) + batch.shape[1:], batch.dtype)]
            )
        device_batch = jnp.asarray(batch)
        if shard_val:
            device_batch = put_batch(device_batch, mesh)
        ids, scores, boxes = (
            np.asarray(r)
            for r in eval_step(state.params, state.batch_stats, device_batch)
        )
        ids, scores, boxes = ids[:n], scores[:n], boxes[:n]
        boxes_orig = np.stack(
            [invert_affine_to_boxes(boxes[i], affines[i]) for i in range(n)]
        )
        if hasattr(metric, "update_with_indices"):  # COCO / VID protocols
            metric.update_with_indices(boxes_orig, ids, scores, idxs[:n])
        else:
            gt_orig = np.stack(
                [invert_affine_to_boxes(gt_boxes[i], affines[i]) for i in range(n)]
            )
            gt_orig[gt_ids < 0] = -1.0
            metric.update(boxes_orig, ids, scores, gt_orig, gt_ids,
                          difficult if difficult is not None else None)
    return metric


if __name__ == "__main__":
    main()
