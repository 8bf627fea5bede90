"""Pack a dataset into .vdtp shards (see viddet_tpu/data/packed.py).

Usage:
  python tools/pack_dataset.py --dataset voc --data-root /data/VOCdevkit \
      --split train --out /data/packed/voc-train --shard-size 1024
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--out", required=True, help="output shard prefix")
    p.add_argument("--shard-size", type=int, default=1024)
    args = p.parse_args(argv)

    from viddet_tpu.cli.common import get_dataset
    from viddet_tpu.data.packed import pack_dataset

    ds, _ = get_dataset(args.dataset, args.data_root, split=args.split)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    shards = pack_dataset(
        ds, args.out, shard_size=args.shard_size, split=args.split
    )
    print(f"packed {len(ds)} records into {len(shards)} shard(s)")
    for s in shards:
        print(" ", s)


if __name__ == "__main__":
    main()
