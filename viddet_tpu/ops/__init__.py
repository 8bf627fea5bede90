from viddet_tpu.ops.boxes import (
    box_area,
    box_iou,
    clip_boxes,
    corner_to_center,
    center_to_corner,
)
from viddet_tpu.ops.nms import nms_keep_mask, multiclass_nms

__all__ = [
    "box_area",
    "box_iou",
    "clip_boxes",
    "corner_to_center",
    "center_to_corner",
    "nms_keep_mask",
    "multiclass_nms",
]
