"""Model factory — the ``get_model(name)`` surface of the reference stack.

The reference resolves model names via ``gluoncv.model_zoo.get_model`` or
local constructors (``yolo3_darknet53(classes)`` — SURVEY.md §2 L4→L3).
Pretrained-weight download is impossible here (no network); weights load
from local ``.npz`` checkpoints instead (train/state.py schema).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

from viddet_tpu.core.precision import DEFAULT_POLICY
from viddet_tpu.data.names import COCO_CLASSES, VID_CLASSES, VOC_CLASSES
from viddet_tpu.models.yolo3 import YOLOv3

_REGISTRY: Dict[str, Callable[..., Tuple[object, Sequence[str]]]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_models() -> Sequence[str]:
    return sorted(_REGISTRY)


def get_model(name: str, **kwargs):
    """Returns (flax module, class-name tuple)."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; available: {list_models()}")
    return _REGISTRY[name](**kwargs)


def _yolo(backbone: str, classes, **kwargs):
    policy = kwargs.pop("policy", DEFAULT_POLICY)
    bn_axis_name = kwargs.pop("bn_axis_name", None)
    module = YOLOv3(
        num_classes=len(classes),
        backbone=backbone,
        policy=policy,
        bn_axis_name=bn_axis_name,
        **kwargs,
    )
    return module, tuple(classes)


@register("yolo3_darknet53_voc")
def yolo3_darknet53_voc(**kw):
    return _yolo("darknet53", VOC_CLASSES, **kw)


@register("yolo3_darknet53_coco")
def yolo3_darknet53_coco(**kw):
    return _yolo("darknet53", COCO_CLASSES, **kw)


@register("yolo3_darknet53_vid")
def yolo3_darknet53_vid(**kw):
    return _yolo("darknet53", VID_CLASSES, **kw)


@register("yolo3_tiny_darknet_voc")
def yolo3_tiny_darknet_voc(**kw):
    return _yolo("tiny", VOC_CLASSES, **kw)


@register("yolo3_tiny_darknet_coco")
def yolo3_tiny_darknet_coco(**kw):
    return _yolo("tiny", COCO_CLASSES, **kw)


@register("yolo3_tiny_darknet_vid")
def yolo3_tiny_darknet_vid(**kw):
    return _yolo("tiny", VID_CLASSES, **kw)


def yolo3_custom(classes: Sequence[str], backbone: str = "darknet53", **kw):
    """Arbitrary class list (combined datasets)."""
    return _yolo(backbone, classes, **kw)


def _temporal_yolo(backbone: str, classes, k: int = 3, aggregation: str = "max", **kw):
    from viddet_tpu.models.temporal import TemporalYOLOv3

    policy = kw.pop("policy", DEFAULT_POLICY)
    module = TemporalYOLOv3(
        num_classes=len(classes),
        k=k,
        backbone=backbone,
        aggregation=aggregation,
        policy=policy,
        **kw,
    )
    return module, tuple(classes)


@register("yolo3_darknet53_k3_vid")
def yolo3_darknet53_k3_vid(**kw):
    return _temporal_yolo("darknet53", VID_CLASSES, **kw)


@register("yolo3_tiny_darknet_k3_vid")
def yolo3_tiny_darknet_k3_vid(**kw):
    return _temporal_yolo("tiny", VID_CLASSES, **kw)


def _ssd(classes, image_size: int = 512, **kw):
    from viddet_tpu.models.ssd import SSD

    policy = kw.pop("policy", DEFAULT_POLICY)
    module = SSD(
        num_classes=len(classes), image_size=image_size, policy=policy, **kw
    )
    return module, tuple(classes)


@register("ssd_512_resnet50_voc")
def ssd_512_resnet50_voc(**kw):
    return _ssd(VOC_CLASSES, **kw)


@register("ssd_512_resnet50_coco")
def ssd_512_resnet50_coco(**kw):
    return _ssd(COCO_CLASSES, **kw)


@register("ssd_512_resnet50_vid")
def ssd_512_resnet50_vid(**kw):
    return _ssd(VID_CLASSES, **kw)


def _frcnn(classes, **kw):
    from viddet_tpu.models.faster_rcnn import FasterRCNN

    policy = kw.pop("policy", DEFAULT_POLICY)
    kw.pop("image_size", None)
    module = FasterRCNN(num_classes=len(classes), policy=policy, **kw)
    return module, tuple(classes)


@register("faster_rcnn_resnet50_fpn_voc")
def faster_rcnn_resnet50_fpn_voc(**kw):
    return _frcnn(VOC_CLASSES, **kw)


@register("faster_rcnn_resnet50_fpn_coco")
def faster_rcnn_resnet50_fpn_coco(**kw):
    return _frcnn(COCO_CLASSES, **kw)


def temporal_yolo3_custom(
    classes: Sequence[str], k: int, aggregation: str = "max",
    backbone: str = "darknet53", **kw,
):
    return _temporal_yolo(backbone, classes, k=k, aggregation=aggregation, **kw)
