"""SSD-512 ResNet-50 inference benchmark (frames/sec/chip).

Measures the fused device pipeline (backbone -> multi-scale heads ->
in-graph decode + class-aware NMS -> fixed-shape detections) on one chip,
completing the per-family perf record next to ``bench.py`` (YOLOv3) and
``tools/frcnn_bench.py`` (Faster R-CNN).

  python tools/ssd_bench.py [--batch 32] [--iters 20]
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
    p.add_argument("--network", default="ssd_512_resnet50_coco")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--platform", default="auto", choices=("auto", "cpu", "tpu"))
    args = p.parse_args(argv)

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.models import get_model
    from viddet_tpu.models.ssd import ssd_forward_and_postprocess

    from viddet_tpu.quant import mode_from_env

    quant_mode = mode_from_env()  # staged int8 PTQ variant (validated)
    if quant_mode:
        from viddet_tpu.core.precision import INT8_POLICY

        module, _ = get_model(args.network, policy=INT8_POLICY)
    else:
        module, _ = get_model(args.network)
    frames = jax.random.uniform(
        jax.random.key(1), (args.batch, 512, 512, 3)
    ).astype(jnp.bfloat16)
    variables = module.init(
        jax.random.key(0), frames[:1].astype(jnp.float32), train=False
    )
    if quant_mode:
        from viddet_tpu import quant

        variables = quant.calibrate(module, variables, [frames])

    @jax.jit
    def infer(variables, images):
        return ssd_forward_and_postprocess(module, variables, images)

    for _ in range(args.warmup):
        out = infer(variables, frames)
        np.asarray(out[0])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = infer(variables, frames)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)

    fps = args.batch * args.iters / best
    print(
        json.dumps(
            {
                "metric": f"frames_per_sec_per_chip_{args.network}",
                "value": round(fps, 1),
                "unit": "frames/s",
                "batch": args.batch,
                "batch_latency_ms": round(best / args.iters * 1000.0, 2),
                "device": str(jax.devices()[0]),
                **({"quant": quant_mode} if quant_mode else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
