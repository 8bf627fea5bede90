"""Export CLI — serialize a predictor for deployment.

No reference counterpart (the reference's scripts reload framework-native
checkpoint files everywhere, SURVEY.md §3.1); this is the TPU-native
deployment surface: one self-contained StableHLO artifact per model
(weights baked in, in-graph decode + NMS included) callable from any
JAX process via ``viddet_tpu.infer.export.load_artifact`` — or, with
``--savedmodel``, a TF SavedModel for TF Serving built from the same
traced function.

Examples:
  # portable artifact (cpu+tpu), any batch size, uint8 frames in
  python -m viddet_tpu.cli.export_model --network yolo3_darknet53 \
      --dataset coco --weights weights.npz --out yolo3_coco.shlo

  # TPU-only artifact running the promoted Pallas fused kernels
  python -m viddet_tpu.cli.export_model --network yolo3_darknet53 \
      --dataset coco --weights weights.npz --platforms tpu \
      --nms-backend pallas --batch 128 --out yolo3_coco_tpu.shlo
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export a predictor artifact.")
    p.add_argument("--network", default="yolo3_darknet53")
    p.add_argument("--dataset", default="coco",
                   help="class set / registered-model suffix (voc|coco|vid|...)")
    p.add_argument("--weights", default="",
                   help=".npz weights (train CLI exports / convert_weights); "
                        "empty = random init (smoke tests)")
    p.add_argument("--image-size", type=int, default=416)
    p.add_argument("--batch", type=int, default=0,
                   help="static batch size; 0 = symbolic (artifact accepts "
                        "any batch — XLA recompiles per distinct size at load "
                        "site, same as the jit shape buckets)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma list of lowering targets for the artifact")
    p.add_argument("--input", default="uint8", choices=("uint8", "float32"),
                   help="artifact input dtype; uint8 normalizes in-graph "
                        "(the serving default — 4x smaller transfers)")
    p.add_argument("--nms-backend", default="xla",
                   choices=("xla", "pallas"),
                   help="xla = portable across --platforms; pallas = the "
                        "promoted TPU fused kernels (requires --platforms tpu)")
    p.add_argument("--iou-thresh", type=float, default=None)
    p.add_argument("--valid-thresh", type=float, default=None)
    p.add_argument("--topk", type=int, default=None)
    p.add_argument("--post-nms", type=int, default=None)
    p.add_argument("--out", default="model.shlo")
    p.add_argument("--savedmodel", default="",
                   help="also write a TF SavedModel to this directory")
    from viddet_tpu.cli.common import parse_with_config

    return parse_with_config(p, argv)


def main(argv=None):
    args = parse_args(argv)
    from viddet_tpu.cli.common import build_model, load_weights, setup_logging
    from viddet_tpu.infer.export import (
        ExportSpec,
        export_predictor,
        export_savedmodel,
        save_artifact,
    )

    logger = setup_logging()
    module, classes = build_model(args.network, args.dataset)
    variables = load_weights(module, args.weights, args.image_size)
    spec = ExportSpec(
        image_size=args.image_size,
        batch=args.batch or None,
        input_dtype=args.input,
        platforms=tuple(args.platforms.split(",")),
        nms_backend=args.nms_backend,
        iou_thresh=args.iou_thresh,
        valid_thresh=args.valid_thresh,
        topk=args.topk,
        post_nms=args.post_nms,
    )
    exported = export_predictor(module, variables, spec)
    meta = {
        "model": f"{args.network}_{args.dataset}",
        "classes": list(classes),
        "weights": args.weights or "(random init)",
        "nms_backend": args.nms_backend,
    }
    save_artifact(exported, args.out, meta)
    logger.info(
        "wrote %s (+.json sidecar): platforms=%s in=%s",
        args.out, ",".join(exported.platforms), exported.in_avals[0],
    )
    if args.savedmodel:
        export_savedmodel(module, variables, args.savedmodel, spec)
        logger.info("wrote TF SavedModel to %s", args.savedmodel)


if __name__ == "__main__":
    main()
