"""Training-step throughput benchmark (samples/sec/chip), all 3 families.

Measures the jitted train step — forward + in-step target assignment +
backward + SGD update, the reference's whole per-batch hot loop
(SURVEY.md §4.1) as one XLA program — on synthetic data, one chip.

  python tools/train_bench.py [--batch 32] [--size 416] [--network ...]
  python tools/train_bench.py --family ssd   [--batch 16] [--size 512]
  python tools/train_bench.py --family frcnn [--batch 8]  [--size 512]

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
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=73728"


def main(argv=None):
    from viddet_tpu.cli.common import enable_cache_from_env

    enable_cache_from_env()
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="yolo", choices=("yolo", "ssd", "frcnn"))
    p.add_argument("--network", default="",
                   help="zoo name (default: the family's COCO flagship)")
    p.add_argument("--batch", type=int, default=0,
                   help="default: 32 yolo / 16 ssd / 8 frcnn")
    p.add_argument("--size", type=int, default=0,
                   help="default: 416 yolo / 512 ssd+frcnn")
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

    defaults = {
        "yolo": ("yolo3_darknet53_coco", 32, 416),
        "ssd": ("ssd_512_resnet50_coco", 16, 512),
        "frcnn": ("faster_rcnn_resnet50_fpn_coco", 8, 512),
    }
    net_default, b_default, s_default = defaults[args.family]
    network = args.network or net_default
    b = args.batch or b_default
    s = args.size or s_default
    m = args.max_boxes

    module, classes = get_model(network)
    num_classes = len(classes)
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

    tx = optax.sgd(args.lr, momentum=0.9)
    if args.family == "yolo":
        anchors, strides, _ = module._config()
        variables = module.init(
            jax.random.key(0), images[:1].astype(jnp.float32), train=False
        )
        train_step = make_train_step(
            module,
            strides=tuple(strides),
            anchors=tuple(tuple(tuple(a) for a in sc) for sc in anchors),
            num_classes=num_classes,
        )
        step_args = (images, gt_boxes, gt_ids, gt_weights)
        run = lambda state: train_step(state, *step_args)
    elif args.family == "ssd":
        from viddet_tpu.train.loop import make_ssd_train_step

        gt_ids_i = gt_ids.astype(jnp.int32)
        variables = module.init(
            jax.random.key(0), images[:1].astype(jnp.float32), train=True
        )
        train_step = make_ssd_train_step(module)
        run = lambda state: train_step(state, images, gt_boxes, gt_ids_i)
    else:  # frcnn
        from viddet_tpu.train.loop import make_frcnn_train_step

        gt_ids_i = gt_ids.astype(jnp.int32)
        variables = module.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(1)},
            images[:1].astype(jnp.float32), gt_boxes[:1], gt_ids_i[:1],
            train=True,
        )
        train_step = make_frcnn_train_step(module)
        key = jax.random.key(5)
        run = lambda state: train_step(state, key, images, gt_boxes, gt_ids_i)

    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )

    for _ in range(args.warmup):
        state, losses = run(state)
    float(losses["total"])  # sync

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, losses = run(state)
        float(losses["total"])  # host fetch = reliable sync on axon
        best = min(best, time.perf_counter() - t0)

    sps = b * args.iters / best
    print(
        json.dumps(
            {
                "metric": f"train_samples_per_sec_per_chip_{network}_{s}",
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
