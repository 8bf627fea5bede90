"""Shared CLI plumbing: dataset factories, model/weight loading, logging.

The reference's scripts are flat-argparse ``main()``s (SURVEY.md §2 L5);
this module centralizes the repeated parts so the CLIs stay thin while
keeping the same flag surface.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional

import jax


def parse_with_config(parser: argparse.ArgumentParser, argv=None):
    """argparse + typed-config superset (SURVEY.md §5.6).

    Adds ``--config FILE`` (JSON defaults; explicit CLI flags still win) and
    ``--dump-config [FILE|-]`` (write the fully-resolved flag namespace as
    JSON and exit) to any script parser.
    """
    import json
    import sys as _sys

    parser.add_argument("--config", default="", help="JSON file of flag defaults")
    parser.add_argument(
        "--dump-config", nargs="?", const="-", default=None, metavar="FILE",
        help="write resolved config as JSON (default stdout) and exit",
    )
    parser.add_argument(
        "--platform", default="auto", choices=("auto", "cpu", "tpu"),
        help="pin the jax platform; 'cpu' works even where the environment "
             "forces a TPU plugin (unreachable chip would otherwise hang)",
    )
    parser.add_argument(
        "--jax-cache-dir", default=os.environ.get("VIDDET_JAX_CACHE", ""),
        help="persistent XLA compilation cache directory (also via "
             "VIDDET_JAX_CACHE); repeat CLI invocations skip the ~20-40s "
             "model compile — the on-disk analogue of the reference's "
             "in-process CachedOp reuse (SURVEY.md §3.2 N2)",
    )
    args = parser.parse_args(argv)
    if args.platform != "auto":
        # Must land before the first backend touch; the env alone is not
        # enough — the deployment sitecustomize re-forces JAX_PLATFORMS.
        jax.config.update("jax_platforms", args.platform)
        from viddet_tpu.core.platform import set_platform

        set_platform(args.platform)
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
        unknown = [k for k in overrides if not hasattr(args, k.replace("-", "_"))]
        if unknown:
            parser.error(f"--config contains unknown keys: {unknown}")
        parser.set_defaults(**{k.replace("-", "_"): v for k, v in overrides.items()})
        args = parser.parse_args(argv)  # CLI flags override config values
    if args.jax_cache_dir:
        enable_compilation_cache(args.jax_cache_dir)
    if args.dump_config is not None:
        resolved = {k: v for k, v in vars(args).items()
                    if k not in ("config", "dump_config")}
        text = json.dumps(resolved, indent=2, default=str)
        if args.dump_config == "-":
            print(text)
        else:
            with open(args.dump_config, "w") as f:
                f.write(text + "\n")
        _sys.exit(0)
    return args


def enable_compilation_cache(cache_dir: str) -> None:
    """Turn on JAX's persistent (on-disk) XLA compilation cache.

    The reference amortizes graph builds in-process (NNVM ``CachedOp``,
    SURVEY.md §3.2 N2); XLA's jit cache is also per-process, so every CLI
    invocation otherwise repays the full model compile (~20-40s for
    Darknet-53 at batch 128 on TPU).  Pointing every run at one directory
    makes repeat invocations — the serving/eval loop case — start in
    seconds.  Safe to share between concurrent processes (entries are
    content-addressed files written atomically by JAX).
    """
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that took meaningful compile time; tiny programs
    # stay uncached to bound directory growth.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def enable_cache_from_env() -> None:
    """Honor ``VIDDET_JAX_CACHE`` in non-argparse tools (the CLIs pick it
    up via ``parse_with_config``); no-op when unset."""
    cache = os.environ.get("VIDDET_JAX_CACHE")
    if cache:
        enable_compilation_cache(cache)


def setup_logging(save_prefix: Optional[str] = None) -> logging.Logger:
    """Console + ``<save_prefix>_train.log`` logging, reference format."""
    logger = logging.getLogger("viddet_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if save_prefix:
        os.makedirs(os.path.dirname(os.path.abspath(save_prefix)) or ".", exist_ok=True)
        fh = logging.FileHandler(f"{save_prefix}_train.log")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def get_dataset(name: str, root: str, split: str = "train", **dataset_kw):
    """Dataset factory keyed by the reference's ``--dataset`` values.

    Returns (dataset, metric_factory) where metric_factory(class_names)
    builds the dataset's eval metric.
    """
    name = name.lower()
    if "+" in name:
        # Cross-dataset combination (reference datasets/combined.py —
        # SURVEY.md §3.1 item 5): '--dataset det+vid' with a matching
        # comma-separated '--data-root rootA,rootB' (or one root for all).
        from viddet_tpu.data.combined import CombinedDetection
        from viddet_tpu.eval.voc_map import VOC07MApMetric

        members = name.split("+")
        roots = root.split(",")
        if len(roots) == 1:
            roots = roots * len(members)
        if len(roots) != len(members):
            raise ValueError(
                f"--data-root must give 1 or {len(members)} comma-separated "
                f"roots for dataset {name!r}, got {len(roots)}"
            )
        children = [
            # temporal kwargs (window/stride) only apply to VID members
            get_dataset(m, r, split=split,
                        **(dataset_kw if m == "vid" else {}))[0]
            for m, r in zip(members, roots)
        ]
        ds = CombinedDetection(children)
        return ds, lambda names: VOC07MApMetric(iou_thresh=0.5, class_names=names)
    if name == "packed":
        # Pre-packed .vdtp shards (the RecordIO-equivalent fast path,
        # SURVEY.md §3.2 N12): --data-root is the shard prefix written by
        # tools/pack_dataset.py — or 'trainprefix,valprefix' so train and
        # val resolve to their own packed sets (splits are baked in at
        # pack time; open_packed raises on a split mismatch).
        from viddet_tpu.data.packed import open_packed
        from viddet_tpu.eval.voc_map import VOC07MApMetric

        roots = root.split(",")
        if len(roots) == 2:
            root = roots[0] if split == "train" else roots[1]
        elif len(roots) != 1:
            raise ValueError(
                "--data-root for packed takes 1 prefix or "
                f"'trainprefix,valprefix', got {len(roots)}"
            )
        ds = open_packed(root, split=split)
        return ds, lambda names: VOC07MApMetric(iou_thresh=0.5, class_names=names)
    if name == "synthetic" or root == "synthetic":
        from viddet_tpu.data.synthetic import SyntheticDetection
        from viddet_tpu.eval.voc_map import VOCMApMetric

        ds = SyntheticDetection(
            num_images=64 if split == "train" else 16,
            size=256,
            num_classes=4,
            seed=0 if split == "train" else 1,
        )
        return ds, lambda names: VOCMApMetric(iou_thresh=0.5, class_names=names)
    if name == "voc":
        from viddet_tpu.data.voc import VOCDetection
        from viddet_tpu.eval.voc_map import VOC07MApMetric

        if split == "train":
            ds = VOCDetection(root, splits=(("2007", "trainval"), ("2012", "trainval")))
        else:
            ds = VOCDetection(root, splits=(("2007", "test"),))
        return ds, lambda names: VOC07MApMetric(iou_thresh=0.5, class_names=names)
    if name == "coco":
        from viddet_tpu.data.coco import COCODetection
        from viddet_tpu.eval.coco_eval import COCODetectionMetric

        if split == "train":
            ds = COCODetection(root, split="train2017")
        else:
            ds = COCODetection(root, split="val2017")
        return ds, lambda names: COCODetectionMetric(ds)
    if name == "det":
        from viddet_tpu.data.imgnetdet import ImageNetDetection
        from viddet_tpu.eval.voc_map import VOC07MApMetric

        ds = ImageNetDetection(root, split="train" if split == "train" else "val")
        return ds, lambda names: VOC07MApMetric(iou_thresh=0.5, class_names=names)
    if name == "vid":
        from viddet_tpu.data.imgnetvid import ImageNetVidDetection
        from viddet_tpu.eval.vid_motion_iou import VIDDetectionMetric

        ds = ImageNetVidDetection(
            root, split="train" if split == "train" else "val", **dataset_kw
        )
        return ds, lambda names: VIDDetectionMetric(ds, class_names=names)
    raise ValueError(
        f"unknown dataset {name!r} (voc|coco|det|vid|packed, or '+'-combined "
        "e.g. det+vid)"
    )


def build_model(network: str, dataset: str, classes=None, **kw):
    """Model factory from (--network, --dataset) as the reference composes
    names like ``yolo3_darknet53_voc``.  Unregistered combinations (custom /
    combined / synthetic class sets) fall back to a custom-classes build
    when ``classes`` is provided."""
    from viddet_tpu.models import get_model, list_models

    name = f"{network}_{dataset.lower()}"
    if name in list_models():
        return get_model(name, **kw)
    if classes is None:
        raise ValueError(
            f"unknown model {name!r}; pass classes= for a custom build"
        )
    if network.startswith("ssd"):
        from viddet_tpu.models.zoo import _ssd

        return _ssd(classes, **kw)
    if network.startswith("faster_rcnn"):
        from viddet_tpu.models.zoo import _frcnn

        return _frcnn(classes, **kw)
    from viddet_tpu.models.zoo import yolo3_custom

    kw.pop("image_size", None)
    backbone = "tiny" if "tiny" in network else "darknet53"
    return yolo3_custom(classes, backbone=backbone, **kw)


def make_predictor(module):
    """Jitted ``infer(variables, images) -> (ids, scores, boxes)`` for any
    registered model family (YOLOv3 / temporal YOLOv3 / SSD).

    Input handling is DTYPE-KEYED (train/loop._maybe_normalize): raw uint8
    RGB frames are ImageNet-normalized in-graph — host->device transfers
    shrink 4x and the host skips a full-image float pass per frame (pair
    with ``ValTransform(..., normalize=False)`` or the native decoder's
    ``normalize=False`` mode) — while float batches pass through untouched,
    so mispairing a host-normalizing transform can never double-normalize.
    Broadcasts over any leading dims, so temporal (B, k, H, W, 3) clips
    work unchanged."""
    import jax

    from viddet_tpu.models.faster_rcnn import (
        FasterRCNN,
        frcnn_forward_and_postprocess,
    )
    from viddet_tpu.models.ssd import SSD, ssd_forward_and_postprocess
    from viddet_tpu.models.yolo3 import forward_and_postprocess
    from viddet_tpu.train.loop import _maybe_normalize

    if isinstance(module, SSD):
        fn = ssd_forward_and_postprocess
    elif isinstance(module, FasterRCNN):
        fn = frcnn_forward_and_postprocess
    else:
        fn = forward_and_postprocess

    @jax.jit
    def infer(variables, images):
        return fn(module, variables, _maybe_normalize(images))

    return infer


def load_weights(module, weights_path: str, image_size: int = 416):
    """Init-then-restore: structure from module.init, values from .npz."""
    import jax.numpy as jnp

    from viddet_tpu.train.state import load_weights_npz

    k = getattr(module, "k", None)  # temporal models take [B, k, H, W, 3]
    shape = (1, image_size, image_size, 3) if k is None else (1, k, image_size, image_size, 3)
    x = jnp.zeros(shape, jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)
    if weights_path:
        params, batch_stats = load_weights_npz(weights_path)
        variables = {"params": params, "batch_stats": batch_stats}
    return variables


def add_quant_flags(p) -> None:
    """``--quant int8`` + ``--calib-batches``: post-training int8 inference
    (viddet_tpu/quant.py).  A TPU-native feature with no reference
    counterpart (SURVEY.md §5 — the reference runs f32 throughout): conv
    cells run as BN-folded int8 MXU convs (2x bf16 peak on v5e) after a
    short activation-range calibration pass.  NOT bit-for-bit with the
    float path; off by default."""
    p.add_argument(
        "--quant", default="", choices=["", "int8"],
        help="post-training quantization for inference (int8 MXU convs; "
             "needs --calib-batches of calibration data)",
    )
    p.add_argument(
        "--calib-batches", type=int, default=4,
        help="batches used to calibrate activation ranges for --quant",
    )


def quant_policy_kw(args) -> dict:
    """Model-factory kwargs for the --quant flag ({} when unset)."""
    if not getattr(args, "quant", ""):
        return {}
    from viddet_tpu.core.precision import INT8_POLICY

    return {"policy": INT8_POLICY}


def calibrate_variables(module, variables, batches, logger):
    """Run PTQ calibration over ``batches`` (arrays of images); returns the
    variables with the populated ``quant`` collection."""
    import jax

    from viddet_tpu import quant

    variables = quant.calibrate(module, variables, batches)
    logger.info(
        "int8 calibration: %d batches, %d conv cells ranged",
        len(batches), len(jax.tree_util.tree_leaves(variables["quant"])),
    )
    return variables
