"""Detection CLI — images, image directories, videos, or webcams.

Rebuild of the reference's ``detect.py`` (SURVEY.md §4.3): decode ->
letterbox -> fused forward+NMS on device -> rescale to original coords ->
draw / write detections.  Single-image and directory paths run batched;
video input uses the streaming pipeline (infer/stream.py) so decode overlaps
device compute.

Example:
  python -m viddet_tpu.cli.detect --network yolo3_tiny_darknet --dataset voc \
      --weights model.npz --input image.jpg --output out/ --thresh 0.5
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import jax.numpy as jnp
import numpy as np

from viddet_tpu.cli.common import build_model, load_weights, setup_logging
from viddet_tpu.data.base import imread_rgb
from viddet_tpu.data.transforms import ValTransform, invert_affine_to_boxes
from viddet_tpu.utils.image import draw_detections, exif_orientation


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Run object detection.")
    p.add_argument("--network", default="yolo3_darknet53")
    p.add_argument("--dataset", default="voc", help="class set: voc|coco|vid")
    p.add_argument("--weights", default="", help=".npz weights (random if empty)")
    p.add_argument("--input", required=True,
                   help="image / dir / video file; comma-separate multiple "
                        "videos to stream them through one shared batch")
    p.add_argument("--output", default="results", help="output directory")
    p.add_argument("--data-shape", type=int, default=416)
    p.add_argument("--thresh", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--every", type=int, default=1, help="process every nth frame")
    p.add_argument("--flush-ms", type=float, default=None,
                   help="max wait from a batch's first frame before a "
                        "partial batch is submitted (default: 50 for live "
                        "webcam sources, 200 for video files)")
    p.add_argument("--save-detections", action="store_true", help="write det .txt")
    p.add_argument("--no-draw", action="store_true")
    p.add_argument("--temporal-k", type=int, default=1,
                   help="k-frame clip window for VID temporal models "
                        "(video input only; per-stream ring buffers "
                        "assemble clips from the live stream)")
    p.add_argument("--temporal-stride", type=int, default=1,
                   help="emit one clip per this many frames")
    p.add_argument("--temporal-agg", default="max",
                   choices=("stack", "max", "mean", "conv"))
    from viddet_tpu.cli.common import add_quant_flags, parse_with_config
    add_quant_flags(p)
    p.add_argument("--calib-images", default="",
                   help="image file/dir used to calibrate --quant int8 "
                        "activation ranges (required with --quant; detect "
                        "inputs may be a live stream, so calibration data "
                        "is explicit)")
    return parse_with_config(p, argv)


IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")
VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def collect_inputs(path: str):
    if path.isdigit():  # webcam index, as the reference's detect.py supports
        return "video", [int(path)]
    if "," in path:  # multiple videos -> one shared continuous batch
        parts = [p.strip() for p in path.split(",") if p.strip()]
        if all(p.lower().endswith(VIDEO_EXTS) for p in parts):
            return "video", parts
        raise ValueError(
            "comma-separated --input requires every entry to be a video file"
        )
    if os.path.isdir(path):
        files = sorted(
            f for f in glob.glob(os.path.join(path, "*"))
            if f.lower().endswith(IMAGE_EXTS)
        )
        return "images", files
    if path.lower().endswith(VIDEO_EXTS):
        return "video", [path]
    return "images", [path]


def _calibrate_for_detect(module, variables, args, transform, logger):
    """PTQ range calibration from --calib-images (detect inputs may be a
    live stream, so the calibration set is an explicit still-image source).
    Temporal models calibrate on static k-frame clips of the same images."""
    from viddet_tpu.cli.common import calibrate_variables

    if not args.calib_images:
        raise SystemExit("--quant int8 needs --calib-images (file or dir)")
    kind, files = collect_inputs(args.calib_images)
    if kind != "images" or not files:
        raise SystemExit(f"--calib-images {args.calib_images!r}: no images")
    limit = args.batch_size * max(1, args.calib_batches)
    batches = []
    for start in range(0, min(len(files), limit), args.batch_size):
        chunk = files[start : start + args.batch_size]
        frames = [transform(imread_rgb(f))[0] for f in chunk]
        batch = np.stack(frames)
        if batch.dtype == np.uint8:
            # calibration applies the module directly (not the uint8-input
            # predictor wrapper), so it must observe normalized activations
            from viddet_tpu.data.transforms import normalize as _norm

            batch = _norm(batch)
        k = getattr(args, "temporal_k", 1)  # serve.py reuses this helper
        if k > 1:  # static clip: same frame k times
            batch = np.repeat(batch[:, None], k, axis=1)
        batches.append(jnp.asarray(batch))
    return calibrate_variables(module, variables, batches, logger)


def main(argv=None):
    args = parse_args(argv)
    logger = setup_logging()
    os.makedirs(args.output, exist_ok=True)

    from viddet_tpu.cli.common import quant_policy_kw

    qkw = quant_policy_kw(args)
    temporal = args.temporal_k > 1
    if temporal:
        # k-frame clip model over the dataset's class set (same
        # construction as cli/evaluate.py); clips are assembled from the
        # live stream by per-stream ring buffers (infer/multistream.py).
        from viddet_tpu.models.zoo import temporal_yolo3_custom

        _, class_names = build_model(args.network, args.dataset)
        backbone = "tiny" if "tiny" in args.network else "darknet53"
        module, class_names = temporal_yolo3_custom(
            list(class_names), k=args.temporal_k,
            aggregation=args.temporal_agg, backbone=backbone, **qkw,
        )
    else:
        module, class_names = build_model(args.network, args.dataset, **qkw)
    variables = load_weights(module, args.weights, args.data_shape)

    from viddet_tpu.cli.common import make_predictor

    # uint8 frames host->device with in-graph normalization: 4x smaller
    # transfers and no per-frame host float pass (see make_predictor)
    infer = make_predictor(module)

    size = (args.data_shape, args.data_shape)
    transform = ValTransform(size=size, letterbox_resize=True, normalize=False)

    if getattr(args, "quant", ""):
        variables = _calibrate_for_detect(
            module, variables, args, transform, logger
        )

    kind, files = collect_inputs(args.input)
    if temporal and kind != "video":
        raise SystemExit("--temporal-k > 1 needs video input (clips are "
                         "assembled from the frame stream)")
    if kind == "video":
        live = isinstance(files[0], int)  # webcam index
        flush_ms = args.flush_ms if args.flush_ms is not None else (
            50.0 if live else 200.0
        )
        if temporal or len(files) > 1 or live:
            # N streams and/or k-frame clips through one shared batch; a
            # live webcam also goes here for the flush-deadline partial
            # batches (a full-batch wait would add ~batch/fps of latency)
            from viddet_tpu.infer.multistream import stream_detect_videos

            stream_detect_videos(
                files,
                infer,
                variables,
                transform,
                class_names,
                output_dir=args.output,
                thresh=args.thresh,
                batch_size=args.batch_size,
                every=args.every,
                k=args.temporal_k,
                stride=args.temporal_stride,
                flush_ms=flush_ms,
                draw=not args.no_draw,
                save_detections=args.save_detections,
                logger=logger,
            )
            return
        from viddet_tpu.infer.stream import stream_detect_video

        stream_detect_video(
            files[0],
            infer,
            variables,
            transform,
            class_names,
            output_dir=args.output,
            thresh=args.thresh,
            batch_size=args.batch_size,
            every=args.every,
            draw=not args.no_draw,
            save_detections=args.save_detections,
            logger=logger,
        )
        return

    logger.info("detecting on %d image(s)", len(files))
    # All-JPEG chunks go through the C++ threaded batch decoder (fused
    # decode -> DCT prescale -> letterbox, GIL released, uint8 out); other
    # formats and missing-native fall back to the per-file cv2 path.
    try:
        from viddet_tpu import native as _native

        use_native = _native.available()
    except Exception:
        use_native = False
    t0 = time.time()
    num_done = 0
    for start in range(0, len(files), args.batch_size):
        chunk = files[start : start + args.batch_size]
        if use_native and all(
            str(f).lower().endswith((".jpg", ".jpeg"))
            # EXIF-rotated files go through cv2, which auto-applies the
            # orientation; the C++ decoder reads the raw raster
            and exif_orientation(f) == 1
            for f in chunk
        ):
            batch, aff_np, orig_sizes = _native.decode_jpeg_batch(
                chunk, transform.size, letterbox=True, normalize=False
            )
            if (orig_sizes == 0).any():
                bad = [f for f, o in zip(chunk, orig_sizes) if o[0] == 0]
                raise SystemExit(f"undecodable image(s): {bad}")
            affines = list(aff_np)
        else:
            frames, affines = [], []
            for f in chunk:
                img = imread_rgb(f)
                x, _, affine = transform(img)
                frames.append(x)
                affines.append(affine)
            batch = np.stack(frames)
        # pad to full batch so only one XLA shape compiles
        if len(chunk) < args.batch_size:
            batch = np.concatenate(
                [batch, np.zeros((args.batch_size - len(chunk),) + batch.shape[1:], batch.dtype)]
            )
        ids, scores, boxes = (np.asarray(r) for r in infer(variables, jnp.asarray(batch)))
        for i, f in enumerate(chunk):
            orig = imread_rgb(f)
            restored = invert_affine_to_boxes(boxes[i], affines[i])
            stem = os.path.splitext(os.path.basename(f))[0]
            if args.save_detections:
                with open(os.path.join(args.output, f"{stem}.txt"), "w") as out:
                    for cid, s, bb in zip(ids[i], scores[i], restored):
                        if cid >= 0 and s >= args.thresh:
                            out.write(
                                f"{class_names[int(cid)]} {s:.4f} "
                                f"{bb[0]:.1f} {bb[1]:.1f} {bb[2]:.1f} {bb[3]:.1f}\n"
                            )
            if not args.no_draw:
                vis = draw_detections(
                    orig, restored, ids[i], scores[i], class_names, args.thresh
                )
                import cv2

                cv2.imwrite(
                    os.path.join(args.output, f"{stem}_det.jpg"),
                    cv2.cvtColor(vis, cv2.COLOR_RGB2BGR),
                )
            num_done += 1
    dt = time.time() - t0
    logger.info("done: %d images in %.2fs (%.1f img/s)", num_done, dt, num_done / dt)


if __name__ == "__main__":
    main()
