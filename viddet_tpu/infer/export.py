"""Deployment export: predictors as self-contained serialized artifacts.

The reference framework "deploys" by shipping framework-native
symbol/params files that its own detect/eval scripts must reload
(SURVEY.md §3.1 items 17-19 — every consumer needs the full framework
plus the model code on its import path).  The TPU-native deployment
story ships the COMPILED PROGRAM instead: ``jax.export`` serializes the
jitted predictor — weights baked in as constants, in-graph decode and
NMS included — into one portable StableHLO artifact that ANY JAX
process can deserialize and call.  No viddet_tpu import, no model
definition, no checkpoint plumbing on the serving side; the artifact
carries JAX's forward/backward-compatibility guarantees for serialized
modules.  ``export_savedmodel`` additionally wraps the same function
for TF Serving via ``jax2tf``.

Artifact layout: ``<out>`` holds the serialized bytes and ``<out>.json``
a human/provenance sidecar (classes, input spec, platforms, NMS knobs).

Portability vs. the Pallas kernels: the Mosaic NMS/top-k kernels lower
only for the TPU platform, so multi-platform artifacts (the default,
``("cpu", "tpu")``) use the pure-XLA postprocess path — exact up to the
documented tie latitude (PARITY.md).  Pass ``nms_backend="pallas"``
with ``platforms=("tpu",)`` for a TPU-only artifact running the
promoted fused kernels.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ExportSpec:
    """Input/postprocess contract for one exported predictor."""

    image_size: int = 416
    batch: Optional[int] = None  # None = symbolic (any batch size)
    input_dtype: str = "uint8"  # "uint8" (in-graph normalize) or "float32"
    platforms: Sequence[str] = ("cpu", "tpu")
    nms_backend: str = "xla"
    # NMS knobs: None = keep the model family's own default (YOLO/SSD
    # 0.45/0.01/400/100, FRCNN 0.5/0.05/400/100 — models/*.py configs)
    iou_thresh: Optional[float] = None
    valid_thresh: Optional[float] = None
    topk: Optional[int] = None
    post_nms: Optional[int] = None

    def validate(self) -> None:
        if self.nms_backend.startswith("pallas") and tuple(self.platforms) != (
            "tpu",
        ):
            raise ValueError(
                "nms_backend='pallas' lowers only for TPU; use "
                "platforms=('tpu',) or the portable nms_backend='xla'"
            )
        if self.input_dtype not in ("uint8", "float32"):
            raise ValueError(f"unsupported input_dtype {self.input_dtype!r}")


def build_infer_fn(module, spec: ExportSpec):
    """``infer(variables, images) -> (ids, scores, boxes)`` with the NMS
    backend pinned (unlike ``cli.common.make_predictor``, which resolves
    it from the live process platform — wrong for cross-platform export).

    Input handling matches the serving paths: uint8 frames are
    ImageNet-normalized in-graph (dtype-keyed, ``train/loop._maybe_normalize``).
    """
    from viddet_tpu.models.faster_rcnn import (
        FasterRCNN,
        frcnn_forward_and_postprocess,
    )
    from viddet_tpu.models.ssd import SSD, SSDNMSConfig, ssd_forward_and_postprocess
    from viddet_tpu.models.yolo3 import NMSConfig, forward_and_postprocess
    from viddet_tpu.train.loop import _maybe_normalize

    kw = {
        k: v
        for k, v in (
            ("iou_thresh", spec.iou_thresh),
            ("valid_thresh", spec.valid_thresh),
            ("topk", spec.topk),
            ("post_nms", spec.post_nms),
        )
        if v is not None
    }
    if isinstance(module, SSD):
        nms = SSDNMSConfig(backend=spec.nms_backend, **kw)

        def infer(variables, images):
            return ssd_forward_and_postprocess(
                module, variables, _maybe_normalize(images), nms
            )

    elif isinstance(module, FasterRCNN):

        def infer(variables, images):
            return frcnn_forward_and_postprocess(
                module,
                variables,
                _maybe_normalize(images),
                backend=spec.nms_backend,
                **kw,
            )

    else:
        nms = NMSConfig(backend=spec.nms_backend, **kw)

        def infer(variables, images):
            return forward_and_postprocess(
                module, variables, _maybe_normalize(images), nms
            )

    return infer


def _input_struct(module, spec: ExportSpec):
    """ShapeDtypeStruct for the predictor input; temporal models take
    ``(B, k, H, W, 3)`` clips, everything else ``(B, H, W, 3)`` frames."""
    from jax import export as jexport

    if spec.batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = spec.batch
    k = getattr(module, "k", None)
    hw = (spec.image_size, spec.image_size, 3)
    shape = (b, k) + hw if k is not None else (b,) + hw
    return jax.ShapeDtypeStruct(shape, jnp.dtype(spec.input_dtype))


def export_predictor(module, variables, spec: ExportSpec = ExportSpec()):
    """Trace + lower the predictor for ``spec.platforms`` and return the
    ``jax.export.Exported`` (weights baked in as constants)."""
    from jax import export as jexport

    spec.validate()
    infer = build_infer_fn(module, spec)

    def closed(images):
        return infer(variables, images)

    return jexport.export(jax.jit(closed), platforms=tuple(spec.platforms))(
        _input_struct(module, spec)
    )


def save_artifact(exported, path: str, meta: Optional[dict] = None) -> None:
    """Write the serialized module + a JSON provenance sidecar."""
    import os

    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    sidecar = {
        "format": "jax.export serialized StableHLO module",
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "outputs": ["class_ids (-1 = empty slot)", "scores", "boxes xyxy"],
        **(meta or {}),
    }
    with open(path + ".json", "w") as f:
        json.dump(sidecar, f, indent=2)
        f.write("\n")


def load_artifact(path: str):
    """Deserialize an artifact; run it with ``.call(images)``.

    This needs only jax — deployment processes never import the
    framework (see the subprocess gate in tests/unit/test_export.py).
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_savedmodel(module, variables, out_dir: str, spec: ExportSpec = ExportSpec()):
    """Wrap the same closed predictor as a TF SavedModel for TF Serving.

    jax2tf's native serialization embeds the identical StableHLO module,
    so the SavedModel and the ``save_artifact`` file compute the same
    function; TF is imported lazily and only here.
    """
    import tensorflow as tf  # noqa: F401 — optional, serving-side only
    from jax.experimental import jax2tf

    spec.validate()
    infer = build_infer_fn(module, spec)
    struct = _input_struct(module, spec)
    poly = None
    if spec.batch is None:
        poly = ["(b, ...)"]
    tf_fn = tf.function(
        jax2tf.convert(
            lambda images: infer(variables, images),
            polymorphic_shapes=poly,
            native_serialization_platforms=tuple(spec.platforms),
        ),
        autograph=False,
        input_signature=[
            tf.TensorSpec(
                [None if spec.batch is None else spec.batch, *struct.shape[1:]],
                struct.dtype,
                name="images",
            )
        ],
    )
    m = tf.Module()
    m.serve = tf_fn
    tf.saved_model.save(
        m, out_dir, signatures={"serving_default": m.serve}
    )
    return out_dir
