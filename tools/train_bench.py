"""Training-step throughput benchmark (samples/sec/chip).

Measures the jitted YOLOv3 train step — forward + in-step target assignment
+ dynamic-IoU ignore + backward + SGD update, the reference's whole per-batch
hot loop (SURVEY.md §4.1) as one XLA program — on synthetic data, one chip.

  python tools/train_bench.py [--batch 32] [--size 416] [--network yolo3_darknet53_coco]

Prints one JSON line: {"metric", "value", "unit", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "LIBTPU_INIT_ARGS" not in os.environ:
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=65536"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="yolo3_darknet53_coco")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--max-boxes", type=int, default=50)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--platform", default="auto", choices=("auto", "cpu", "tpu"))
    args = p.parse_args(argv)

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from viddet_tpu.models import get_model
    from viddet_tpu.train.loop import make_train_step
    from viddet_tpu.train.state import TrainState

    module, classes = get_model(args.network)
    anchors, strides, _ = module._config()
    num_classes = len(classes)
    b, s, m = args.batch, args.size, args.max_boxes
    rng = np.random.default_rng(0)

    images = jnp.asarray(
        rng.uniform(size=(b, s, s, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    pts = rng.uniform(16, s - 16, size=(b, m, 2, 2)).astype(np.float32)
    gt_boxes = jnp.asarray(
        np.concatenate([pts.min(2), pts.max(2)], axis=-1)
    )
    gt_ids = jnp.asarray(
        rng.integers(0, num_classes, size=(b, m)).astype(np.float32)
    )
    gt_weights = jnp.ones((b, m), jnp.float32)

    variables = module.init(
        jax.random.key(0), images[:1].astype(jnp.float32), train=False
    )
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=optax.sgd(args.lr, momentum=0.9),
    )
    train_step = make_train_step(
        module,
        strides=tuple(strides),
        anchors=tuple(tuple(tuple(a) for a in s) for s in anchors),
        num_classes=num_classes,
    )

    for _ in range(args.warmup):
        state, losses = train_step(state, images, gt_boxes, gt_ids, gt_weights)
    float(losses["total"])  # sync

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, losses = train_step(state, images, gt_boxes, gt_ids, gt_weights)
        float(losses["total"])  # host fetch = reliable sync on axon
        best = min(best, time.perf_counter() - t0)

    sps = b * args.iters / best
    print(
        json.dumps(
            {
                "metric": f"train_samples_per_sec_per_chip_{args.network}_{s}",
                "value": round(sps, 1),
                "unit": "samples/s",
                "batch": b,
                "step_latency_ms": round(best / args.iters * 1000.0, 2),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
