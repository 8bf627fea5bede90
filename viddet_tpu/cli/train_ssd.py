"""SSD-512 training CLI (BASELINE.json config #3: SSD-512 ResNet-50 on VOC
with multi-scale augmentation).

Counterpart of the reference ecosystem's ``train_ssd.py`` (GluonCV — the
SSD family is in scope via BASELINE.json; SURVEY.md §3.1 item 21).  Fixed
512px input (SSD anchors are size-coupled); the multi-scale augmentation is
the random-expand/random-crop geometry in TrainTransform.
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
from viddet_tpu.data.transforms import TrainTransform
from viddet_tpu.parallel.mesh import make_mesh, put_batch, replicate
from viddet_tpu.train.loop import make_ssd_train_step
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
    p = argparse.ArgumentParser(description="Train SSD-512.")
    p.add_argument("--network", default="ssd_512_resnet50")
    p.add_argument("--dataset", default="voc")
    p.add_argument("--data-root", required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=240)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr-decay", type=float, default=0.1)
    p.add_argument("--lr-decay-epoch", default="160,200")
    p.add_argument("--warmup-epochs", type=float, default=1.0)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--wd", type=float, default=5e-4)
    p.add_argument("--data-shape", type=int, default=512)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--max-gt-boxes", type=int, default=100,
                   help="static GT pad per image; overflow is dropped+logged")
    p.add_argument("--resume", default="")
    p.add_argument("--save-prefix", default="ssd512")
    p.add_argument("--save-interval", type=int, default=10)
    p.add_argument("--val-interval", type=int, default=10)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--seed", type=int, default=233)
    p.add_argument("--max-steps", type=int, default=0)
    from viddet_tpu.cli.common import parse_with_config
    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    logger = setup_logging(args.save_prefix)
    logger.info("args: %s", vars(args))

    train_ds, _ = get_dataset(args.dataset, args.data_root, split="train")
    val_ds, metric_factory = get_dataset(args.dataset, args.data_root, split="val")
    module, class_names = build_model(
        args.network, args.dataset, classes=train_ds.classes,
        image_size=args.data_shape,
    )

    shape = args.data_shape
    loader = DetectionLoader(
        train_ds,
        TrainTransform(size=(shape, shape), normalize=False),
        batch_size=args.batch_size,
        train=True,
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
    steps_per_epoch = max(len(loader), 1)

    x0 = jnp.zeros((2, shape, shape, 3), jnp.float32)
    variables = module.init(jax.random.key(args.seed), x0, train=True)
    schedule = make_lr_schedule(
        args.lr, steps_per_epoch,
        warmup_epochs=args.warmup_epochs,
        decay_epochs=[int(e) for e in args.lr_decay_epoch.split(",") if e],
        decay_factor=args.lr_decay,
    )
    tx = make_optimizer(schedule, momentum=args.momentum, weight_decay=args.wd)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    start_epoch = 0
    if args.resume:
        path = args.resume if os.path.basename(args.resume).startswith("step_") \
            else latest_checkpoint(args.resume)
        if path:
            state = restore_checkpoint(path, state)
            start_epoch = int(state.step) // steps_per_epoch
            logger.info("resumed from %s", path)

    mesh = make_mesh()
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, replicate(mesh)), state)
    step = make_ssd_train_step(module)
    ckpt_dir = f"{args.save_prefix}_ckpt"
    best_map = -1.0
    total_steps = 0

    for epoch in range(start_epoch, args.epochs):
        btic = time.time()
        running = {}
        for i, (images, boxes, ids, _d, _a, _x) in enumerate(loader):
            batch = put_batch(
                (jnp.asarray(images), jnp.asarray(boxes),
                 jnp.asarray(ids.astype(np.int32))),
                mesh,
            )
            state, losses = step(state, *batch)
            total_steps += 1
            for k, v in losses.items():
                running[k] = running.get(k, 0.0) + float(v)
            if args.log_interval and (i + 1) % args.log_interval == 0:
                speed = args.log_interval * args.batch_size / (time.time() - btic)
                btic = time.time()
                logger.info(
                    "[Epoch %d][Batch %d] speed: %.1f samples/sec, "
                    "CrossEntropy=%.3f, SmoothL1=%.3f",
                    epoch, i + 1, speed,
                    running.get("cls", 0) / (i + 1), running.get("box", 0) / (i + 1),
                )
            if args.max_steps and total_steps >= args.max_steps:
                logger.info("reached max-steps=%d, stopping", args.max_steps)
                save_checkpoint(ckpt_dir, state, int(state.step), block=True)
                return
        if loader.dropped_boxes:
            logger.warning(
                "[Epoch %d] %d GT boxes dropped by --max-gt-boxes=%d pad",
                epoch, loader.dropped_boxes, args.max_gt_boxes,
            )
        if args.val_interval and (epoch + 1) % args.val_interval == 0:
            from viddet_tpu.cli.evaluate import evaluate

            eval_args = argparse.Namespace(
                data_shape=shape, batch_size=args.batch_size,
                num_workers=args.num_workers, letterbox=False, max_images=0,
            )
            names, values = evaluate(
                module,
                {"params": state.params, "batch_stats": state.batch_stats},
                val_ds, metric_factory(class_names), eval_args, logger,
            )
            logger.info("[Epoch %d] validation %s=%.4f", epoch, names[-1], values[-1])
            if values[-1] > best_map:
                best_map = values[-1]
                save_weights_npz(
                    f"{args.save_prefix}_best.npz", state.params, state.batch_stats
                )
        if args.save_interval and (epoch + 1) % args.save_interval == 0:
            save_checkpoint(ckpt_dir, state, int(state.step))
    save_checkpoint(ckpt_dir, state, int(state.step), block=True)
    save_weights_npz(f"{args.save_prefix}_final.npz", state.params, state.batch_stats)


if __name__ == "__main__":
    main()
