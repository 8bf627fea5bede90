"""Capture a jax.profiler trace of the fused YOLOv3-416 inference program.

For the >2000 fps push (VERDICT r1 item 3): run on a real chip, then inspect
the Perfetto trace for the NMS tail (top-k + suppression scan) vs conv time,
and dump the optimized HLO to check that the per-scale cls_max reductions
fused into the head convs.

  python tools/profile_infer.py --steps 5 --out /tmp/yolo_trace
  python tools/profile_infer.py --dump-hlo hlo.txt      # no trace, just HLO
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--out", default="/tmp/yolo_trace")
    p.add_argument("--dump-hlo", default="", help="write optimized HLO here")
    p.add_argument("--platform", default="auto", choices=("auto", "cpu", "tpu"))
    args = p.parse_args(argv)

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from viddet_tpu.models import get_model
    from viddet_tpu.models.yolo3 import forward_and_postprocess

    module, _ = get_model("yolo3_darknet53_coco")
    frames = jax.random.uniform(
        jax.random.key(1), (args.batch, 416, 416, 3)
    ).astype(jnp.bfloat16)
    variables = module.init(jax.random.key(0), frames.astype(jnp.float32),
                            train=False)

    @jax.jit
    def infer(variables, images):
        return forward_and_postprocess(module, variables, images)

    if args.dump_hlo:
        hlo = infer.lower(variables, frames).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
        n_fusion = hlo.count(" fusion(")
        n_allreduce = hlo.count("all-reduce")
        print(f"wrote {args.dump_hlo}: {len(hlo.splitlines())} lines, "
              f"{n_fusion} fusions, {n_allreduce} all-reduces")
        return

    np.asarray(infer(variables, frames)[0])  # compile + warm
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        out = infer(variables, frames)
    np.asarray(out[0])
    jax.profiler.stop_trace()
    print(f"trace written to {args.out} "
          f"({args.steps} steps, batch {args.batch})")

    # quick sustained number for context
    t0 = time.perf_counter()
    for _ in range(10):
        out = infer(variables, frames)
    np.asarray(out[0])
    dt = time.perf_counter() - t0
    print(f"sustained: {args.batch * 10 / dt:.1f} frames/s")


if __name__ == "__main__":
    main()
