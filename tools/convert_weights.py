"""Convert foreign detector weights into viddet_tpu's .npz schema.

The fixed-weight parity contract (BASELINE.json) needs reference-trained
weights loaded into this framework.  MXNet/GluonCV is not installed here and
the reference mount is empty (SURVEY.md §0), so this tool implements the
conversion machinery against a neutral interchange format and defers the
one-line MXNet export to whenever the reference weights are reachable:

  interchange: an .npz whose entries are the source network's arrays in
  SOURCE layout (conv kernels OIHW, BN gamma/beta/mean/var as 1-D), listed
  in network construction order (np.savez preserves insertion order).
  From GluonCV this is:  np.savez(out, **{k: v.asnumpy() for k, v in
  net.collect_params().items()}) plus the BN running stats.

Conversion is ORDER/SHAPE-structural, not name-based: both networks
enumerate layers in the same architectural order (conv -> bn -> ... as
built), so each source array is matched to the next unfilled target leaf of
compatible kind+shape; conv kernels are transposed OIHW -> HWIO.  This
avoids depending on either side's naming scheme.

Usage:
  python tools/convert_weights.py --src gluoncv_dump.npz \
      --model yolo3_darknet53_voc --size 416 --out converted.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def target_leaves_in_order(params, batch_stats):
    """Flatten our param/batch-stat trees in module construction order.

    Flax dict trees iterate in insertion order == construction order.
    Yields (container, key, array, kind) where kind is one of
    'conv_kernel', 'bias', 'scale', 'bn_bias', 'mean', 'var', 'dense_kernel'.
    """
    leaves = []

    def walk(node, path, store):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,), store)
        else:
            leaves.append((path, node, store))

    walk(params, (), "params")
    walk(batch_stats, (), "batch_stats")

    def kind(path, arr):
        name = path[-1]
        if name == "kernel":
            return "conv_kernel" if arr.ndim == 4 else "dense_kernel"
        if name == "scale":
            return "scale"
        if name == "bias":
            return "bias"
        if name == "mean":
            return "mean"
        if name == "var":
            return "var"
        return name

    return [(path, arr, store, kind(path, arr)) for path, arr, store in leaves]


def classify_source(name: str, arr: np.ndarray) -> str:
    lname = name.lower()
    if arr.ndim == 4:
        return "conv_kernel"
    if arr.ndim == 2:
        return "dense_kernel"
    if "gamma" in lname or "scale" in lname:
        return "scale"
    if "beta" in lname:
        return "bn_bias"
    if "running_mean" in lname or "moving_mean" in lname or lname.endswith("mean"):
        return "mean"
    if "running_var" in lname or "moving_var" in lname or lname.endswith("var"):
        return "var"
    if "bias" in lname:
        return "bias"
    return "unknown"


def convert(src_items, params, batch_stats, strict: bool = True):
    """Match source arrays to target leaves in order. Returns filled trees."""
    import jax

    targets = target_leaves_in_order(params, batch_stats)
    used = [False] * len(targets)
    assignments = {}  # (store, path) -> np.ndarray

    for name, arr in src_items:
        skind = classify_source(name, arr)
        if skind == "unknown":
            if strict:
                raise ValueError(f"cannot classify source array {name!r}")
            continue
        converted = arr
        if skind == "conv_kernel":
            converted = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        if skind == "dense_kernel":
            converted = arr.T  # (out, in) -> (in, out)
        want_kind = "bias" if skind == "bn_bias" else skind
        placed = False
        for i, (path, tgt, store, tkind) in enumerate(targets):
            if used[i] or tkind != want_kind:
                continue
            if skind == "bn_bias" and path[-1] != "bias":
                continue
            if tuple(converted.shape) != tuple(np.shape(tgt)):
                continue
            # bn_bias must land in a BatchNorm module; plain bias after conv
            assignments[(store, path)] = converted.astype(np.asarray(tgt).dtype)
            used[i] = True
            placed = True
            break
        if not placed and strict:
            raise ValueError(
                f"no unfilled target of kind {want_kind} shape {converted.shape} "
                f"for source {name!r}"
            )

    def fill(tree, store):
        def go(node, path):
            if isinstance(node, dict):
                return {k: go(v, path + (k,)) for k, v in node.items()}
            key = (store, path)
            return assignments.get(key, np.asarray(node))

        return go(tree, ())

    filled_params = fill(params, "params")
    filled_stats = fill(batch_stats, "batch_stats")
    n_filled = len(assignments)
    n_targets = len(targets)
    return filled_params, filled_stats, n_filled, n_targets


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="source .npz (see docstring)")
    p.add_argument("--model", required=True, help="zoo model name")
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--out", required=True)
    p.add_argument("--allow-partial", action="store_true")
    args = p.parse_args(argv)

    import jax

    # weight conversion is pure host work: pin the CPU backend so the tool
    # never blocks on the (possibly unreachable) TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from viddet_tpu.models import get_model
    from viddet_tpu.train.state import save_weights_npz

    module, _ = get_model(args.model)
    x = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)

    with np.load(args.src) as data:
        src_items = [(k, data[k]) for k in data.files]

    params, stats, n_filled, n_targets = convert(
        src_items, variables["params"], variables["batch_stats"],
        strict=not args.allow_partial,
    )
    print(f"filled {n_filled}/{n_targets} target arrays from {len(src_items)} sources")
    save_weights_npz(args.out, params, stats)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
