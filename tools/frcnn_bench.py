"""Faster R-CNN ResNet-50 FPN @ 512 inference benchmark (frames/sec/chip).

Measures the full fused device pipeline (backbone -> FPN -> RPN -> proposal
NMS -> ROIAlign -> box head -> per-class decode + NMS) on one chip, and
compares the two ROIAlign backends:

  xla     packed single-gather formulation (ops/roi_align.py)
  pallas  window-DMA MXU kernel (ops/roi_align_pallas.py)

Prints one JSON line per backend.  Run on a real TPU:
  python tools/frcnn_bench.py [--batch 8] [--iters 20] [--backends xla,pallas]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from viddet_tpu.cli.common import enable_cache_from_env

    enable_cache_from_env()
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--backends", default="xla,pallas")
    p.add_argument("--platform", default="auto", choices=("auto", "cpu", "tpu"))
    args = p.parse_args(argv)

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.models import faster_rcnn as F

    rng = jax.random.key(1)
    frames = jax.random.uniform(
        rng, (args.batch, args.size, args.size, 3)
    ).astype(jnp.float32)

    import os

    from viddet_tpu.quant import mode_from_env

    quant_mode = mode_from_env()  # staged int8 PTQ variant (validated)
    for backend in args.backends.split(","):
        cfg = dataclasses.replace(F.FRCNNConfig(), roi_backend=backend)
        kw = {}
        if quant_mode:
            from viddet_tpu.core.precision import INT8_POLICY

            kw["policy"] = INT8_POLICY
        module = F.FasterRCNN(num_classes=80, config=cfg, **kw)
        variables = module.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(1)},
            frames, train=False,
        )
        if quant_mode:
            from viddet_tpu import quant

            variables = quant.calibrate(module, variables, [frames])

        @jax.jit
        def infer(variables, images):
            return F.frcnn_forward_and_postprocess(module, variables, images)

        for _ in range(args.warmup):
            np.asarray(infer(variables, frames)[0])
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            for _ in range(args.iters):
                out = infer(variables, frames)
            np.asarray(out[0])
            best = min(best, time.perf_counter() - start)
        fps = args.batch * args.iters / best
        print(json.dumps({
            "metric": f"frames_per_sec_per_chip_frcnn_r50fpn_{args.size}",
            "roi_backend": backend,
            "value": round(fps, 1),
            "unit": "frames/s",
            "batch": args.batch,
            "batch_latency_ms": round(best / args.iters * 1000.0, 2),
            **({"quant": quant_mode} if quant_mode else {}),
        }))


if __name__ == "__main__":
    main()
