"""Host data-pipeline throughput: decode + augment + collate samples/s.

The input pipeline is the host-side substrate (SURVEY.md §3.2 N11/N12
equivalents: threaded loader + packed shards) and is bench-able WITHOUT the
chip: this tool measures end-to-end samples/s through ``DetectionLoader``
with the full ``TrainTransform`` augmentation chain, for

  synthetic   generated-in-memory images (no decode) — isolates the
              augment+collate cost,
  packed      .vdtp shards of real JPEG bytes (written once to --tmp) —
              adds per-record JPEG decode, the production training path.

Prints one JSON line per mode (same convention as the other tools).
Numbers scale with host cores; record the core count alongside.

  python tools/loader_bench.py                 # both modes
  python tools/loader_bench.py --mode packed --num-workers 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench_loader(dataset, size, batch_size, num_workers, epochs=2):
    """samples/s through DetectionLoader+TrainTransform (best epoch)."""
    from viddet_tpu.data.loader import DetectionLoader
    from viddet_tpu.data.transforms import TrainTransform

    loader = DetectionLoader(
        dataset,
        # normalize=False matches the production train CLIs: uint8 batches,
        # normalization deferred to the device (train/loop._maybe_normalize)
        TrainTransform(size=(size, size), normalize=False),
        batch_size=batch_size,
        train=True,
        num_workers=num_workers,
        seed=0,
    )
    best = float("inf")
    n_samples = len(loader) * batch_size
    for _ in range(epochs):
        t0 = time.perf_counter()
        for batch in loader:
            np.asarray(batch[0])  # touch the collated array
        best = min(best, time.perf_counter() - t0)
    return n_samples / best


def _make_packed(tmp, n, size, seed=0):
    """Write n JPEGs once, pack them into .vdtp shards, open packed."""
    import cv2

    from viddet_tpu.data.packed import PackedDetection, pack_dataset

    # size-stamped dirs: a --size change must not silently reuse JPEGs
    img_dir = os.path.join(tmp, f"imgs-{size}")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    class _Disk:
        classes = ("a", "b", "c", "d")
        wn_classes = ("n1", "n2", "n3", "n4")

        def __len__(self):
            return n

        def image_path(self, i):
            return os.path.join(img_dir, f"{i}.jpg")

        def label(self, i):
            lrng = np.random.default_rng((seed, i))
            x1, y1 = lrng.integers(0, size // 2, 2)
            w, h = lrng.integers(size // 8, size // 2, 2)
            return np.asarray(
                [[x1, y1, min(x1 + w, size - 1), min(y1 + h, size - 1),
                  int(lrng.integers(4)), 0]], np.float32
            )

    src = _Disk()
    for i in range(n):
        if not os.path.exists(src.image_path(i)):
            img = rng.integers(0, 255, (size, size, 3)).astype(np.uint8)
            cv2.imwrite(src.image_path(i), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 85])
    prefix = os.path.join(tmp, f"shards-{size}-{n}", "bench")
    os.makedirs(os.path.dirname(prefix), exist_ok=True)
    shards = pack_dataset(src, prefix, shard_size=max(n // 4, 1))
    return PackedDetection(shards, classes=src.classes,
                           wn_classes=src.wn_classes)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="all",
                   choices=("all", "synthetic", "packed"))
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--tmp", default="/tmp/viddet_loader_bench")
    args = p.parse_args(argv)

    cores = os.cpu_count() or 1
    if args.mode in ("all", "synthetic"):
        from viddet_tpu.data.synthetic import SyntheticDetection

        ds = SyntheticDetection(
            num_images=args.images, size=args.size, num_classes=4
        )
        sps = _bench_loader(ds, args.size, args.batch_size, args.num_workers)
        print(json.dumps({
            "metric": "loader_samples_per_sec_synthetic",
            "value": round(sps, 1),
            "unit": "samples/s",
            "batch": args.batch_size,
            "num_workers": args.num_workers,
            "host_cores": cores,
        }))

    if args.mode in ("all", "packed"):
        os.makedirs(args.tmp, exist_ok=True)
        ds = _make_packed(args.tmp, args.images, args.size)
        sps = _bench_loader(ds, args.size, args.batch_size, args.num_workers)
        print(json.dumps({
            "metric": "loader_samples_per_sec_packed_jpeg",
            "value": round(sps, 1),
            "unit": "samples/s",
            "batch": args.batch_size,
            "num_workers": args.num_workers,
            "host_cores": cores,
        }))


if __name__ == "__main__":
    main()
