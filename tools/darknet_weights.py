"""Import/export original darknet ``.weights`` files (pjreddie format).

The most common artifact a migrating YOLOv3 user holds is the official
darknet weight file (``yolov3.weights`` / ``yolov3-tiny.weights``), not an
MXNet param dump — the reference itself bootstraps from converted darknet
weights (SURVEY.md §3.1 item 8; mount empty, so the cfg-order claim below
is validated synthetically, not against a reference file).

Format (darknet ``parser.c:save_weights`` / ``load_weights``):

  header:  int32 major, int32 minor, int32 revision,
           int64 seen  (int32 when major*10+minor < 2)
  then, for each convolutional layer IN CFG ORDER:
      batch-normalized conv:  beta[n]  gamma[n]  mean[n]  var[n]
      plain conv:             bias[n]
      then conv weights, OIHW, flattened float32.

Layer order: this framework constructs YOLOv3 modules in exactly the
yolov3.cfg sequence (backbone convs sequentially; per scale the 5-conv
detection block, tip, output conv, then the lateral 1x1 + upsample of the
NEXT scale) — so the file's layer list equals our conv-kernel construction
order, and the per-layer specs (channels, kernel size, has_bn) are derived
FROM the target model tree rather than from a .cfg parser.  The mapping is
round-trip gated (export -> import == identity,
tests/unit/test_convert_weights.py); bit-for-bit validation against an
official file needs network access and is deferred with the other golden
gates (PARITY.md "Known gaps").

Usage:
  # darknet -> viddet_tpu .npz
  python tools/darknet_weights.py import --weights yolov3.weights \
      --model yolo3_darknet53_coco --out converted.npz
  # viddet_tpu .npz (or fresh init) -> darknet .weights
  python tools/darknet_weights.py export --npz trained.npz \
      --model yolo3_darknet53_coco --out exported.weights
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.convert_weights import convert  # noqa: E402


def conv_layer_specs(params) -> List[Tuple[Tuple[int, int, int, int], bool]]:
    """(OIHW shape, has_bias) for every conv, in construction order.

    Flax dict trees iterate in insertion order == construction order.  A
    conv whose module dict also holds a 1-D ``bias`` is a plain conv
    (the per-scale output convs); every other conv is BN-normalized.
    """
    specs = []

    def walk(node):
        if not isinstance(node, dict):
            return
        if "kernel" in node and np.ndim(node["kernel"]) == 4:
            h, w, i, o = np.shape(node["kernel"])
            specs.append(((o, i, h, w), "bias" in node))
        for v in node.values():
            walk(v)

    walk(params)
    return specs


def _read_exact(f, n: int, what: str) -> np.ndarray:
    """Read exactly ``n`` float32s or fail naming the tensor that was short.

    A file truncated inside a BN block must error on THAT tensor, not
    surface later as a misleading conv-weight message.
    """
    a = np.fromfile(f, np.float32, n)
    if a.size != n:
        raise ValueError(
            f"truncated file at {what}: wanted {n} floats, got {a.size} — "
            "layer order/shape mismatch between the file and this model"
        )
    return a


def read_darknet_weights(path: str, specs) -> List[Tuple[str, np.ndarray]]:
    """Parse a .weights file into (name, array) items in file order.

    Names follow the conventions ``tools/convert_weights.classify_source``
    recognizes (gamma/beta/running_mean/running_var/bias/weight).
    """
    items: List[Tuple[str, np.ndarray]] = []
    with open(path, "rb") as f:
        major, minor, _rev = np.fromfile(f, np.int32, 3)
        transposed = major * 10 + minor >= 2
        np.fromfile(f, np.int64 if transposed else np.int32, 1)  # seen
        for li, ((o, i, kh, kw), has_bias) in enumerate(specs):
            if has_bias:
                items.append(
                    (f"layer{li}.bias",
                     _read_exact(f, o, f"conv {li} bias"))
                )
            else:
                for tag, name in (("beta", "beta"), ("gamma", "gamma"),
                                  ("running_mean", "mean"),
                                  ("running_var", "var")):
                    items.append(
                        (f"layer{li}.{tag}",
                         _read_exact(f, o, f"conv {li} BN {name}"))
                    )
            n = o * i * kh * kw
            w = _read_exact(
                f, n, f"conv {li} weight (OIHW {(o, i, kh, kw)})"
            )
            items.append((f"layer{li}.weight", w.reshape(o, i, kh, kw)))
        leftover = np.fromfile(f, np.float32)
    if leftover.size:
        raise ValueError(
            f"{leftover.size} floats left after the last conv layer — the "
            "file does not match this model's layer list"
        )
    return items


def write_darknet_weights(path: str, params, batch_stats) -> int:
    """Serialize our param/stat trees into darknet format (cfg order).

    Returns the number of conv layers written.  Exists for the round-trip
    gate and for handing trained weights BACK to darknet/MXNet tooling.
    """
    convs = []  # (kernel HWIO, bias | None) in construction order
    bn_params = []  # (scale, bias) per BN, in construction order
    bn_stats = []  # (mean, var) per BN, in construction order

    def walk_params(node):
        if not isinstance(node, dict):
            return
        if "kernel" in node and np.ndim(node["kernel"]) == 4:
            convs.append((np.asarray(node["kernel"]),
                          np.asarray(node["bias"]) if "bias" in node else None))
        elif "scale" in node and "bias" in node:
            bn_params.append((np.asarray(node["scale"]), np.asarray(node["bias"])))
        for v in node.values():
            walk_params(v)

    def walk_stats(node):
        if not isinstance(node, dict):
            return
        if "mean" in node and "var" in node:
            bn_stats.append((np.asarray(node["mean"]), np.asarray(node["var"])))
        for v in node.values():
            walk_stats(v)

    walk_params(params)
    walk_stats(batch_stats)
    assert len(bn_params) == len(bn_stats), (len(bn_params), len(bn_stats))

    bn_i = 0
    with open(path, "wb") as f:
        np.asarray([0, 2, 0], np.int32).tofile(f)  # major 0, minor 2
        np.asarray([0], np.int64).tofile(f)  # seen
        for kernel, bias in convs:
            if bias is not None:
                bias.astype(np.float32).tofile(f)
            else:
                scale, beta = bn_params[bn_i]
                mean, var = bn_stats[bn_i]
                bn_i += 1
                beta.astype(np.float32).tofile(f)
                scale.astype(np.float32).tofile(f)
                mean.astype(np.float32).tofile(f)
                var.astype(np.float32).tofile(f)
            # HWIO -> OIHW
            np.transpose(kernel, (3, 2, 0, 1)).astype(np.float32).tofile(f)
    assert bn_i == len(bn_params), "BN/conv interleave mismatch"
    return len(convs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import", help="darknet .weights -> viddet .npz")
    imp.add_argument("--weights", required=True)
    imp.add_argument("--model", required=True, help="zoo model name")
    imp.add_argument("--size", type=int, default=416)
    imp.add_argument("--out", required=True)
    exp = sub.add_parser("export", help="viddet .npz -> darknet .weights")
    exp.add_argument("--npz", default="", help="default: fresh init")
    exp.add_argument("--model", required=True)
    exp.add_argument("--size", type=int, default=416)
    exp.add_argument("--out", required=True)
    args = p.parse_args(argv)

    import jax

    # weight conversion is pure host work: pin the CPU backend so the tool
    # never blocks on the (possibly unreachable) TPU tunnel
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from viddet_tpu.models import get_model
    from viddet_tpu.train.state import load_weights_npz, save_weights_npz

    module, _ = get_model(args.model)
    x = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    if args.cmd == "import":
        specs = conv_layer_specs(params)
        items = read_darknet_weights(args.weights, specs)
        filled_p, filled_s, n_filled, n_targets = convert(items, params, stats)
        print(f"filled {n_filled}/{n_targets} target arrays "
              f"({len(specs)} conv layers)")
        if n_filled != n_targets:
            raise SystemExit("incomplete fill — refusing to write")
        save_weights_npz(args.out, filled_p, filled_s)
        print(f"wrote {args.out}")
    else:
        if args.npz:
            params, stats = load_weights_npz(args.npz)
        n = write_darknet_weights(args.out, params, stats)
        print(f"wrote {args.out} ({n} conv layers)")


if __name__ == "__main__":
    main()
