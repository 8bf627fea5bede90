"""Dataset base API.

Contract (mirrors the reference's Gluon Dataset surface — SURVEY.md §2
L4→L2): ``__getitem__ -> (image uint8 HWC RGB, label float32 (M, 6))`` with
label columns ``[x1, y1, x2, y2, class_id, difficult]`` and NO padding (the
loader pads to a static max with -1).  Every dataset also exposes
``classes`` (display names) and ``wn_classes`` (WordNet ids, for
cross-dataset combination).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import cv2
import numpy as np


class DetectionDataset:
    classes: Sequence[str] = ()
    wn_classes: Sequence[str] = ()

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def statistics(self) -> dict:
        """Images/boxes per class — the reference's dataset statistics
        printout (SURVEY.md §3.1 item 6)."""
        per_class_boxes = np.zeros(self.num_classes, np.int64)
        per_class_images = np.zeros(self.num_classes, np.int64)
        total_boxes = 0
        for i in range(len(self)):
            label = self.label(i)
            ids = label[:, 4].astype(int)
            ids = ids[ids >= 0]
            total_boxes += len(ids)
            for c in np.unique(ids):
                per_class_images[c] += 1
            np.add.at(per_class_boxes, ids, 1)
        return {
            "images": len(self),
            "boxes": int(total_boxes),
            "boxes_per_class": {
                self.classes[c]: int(per_class_boxes[c]) for c in range(self.num_classes)
            },
            "images_per_class": {
                self.classes[c]: int(per_class_images[c]) for c in range(self.num_classes)
            },
        }

    # Subclasses should override `label(idx)` if labels are cheaper than
    # decoding the image; default decodes both.
    def label(self, idx: int) -> np.ndarray:
        return self[idx][1]


def imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"failed to decode image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
