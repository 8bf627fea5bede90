"""Clip (multi-frame) transforms: identical geometry across the k frames.

The reference applies the same augmentation geometry to every frame of a
VID clip window (SURVEY.md §4.5).  Here that consistency falls out of the
explicit-RNG design of the single-frame transforms: every frame is pushed
through the SAME transform seeded identically, so all random draws (crop,
expand, flip, color) coincide exactly; the label is transformed once.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from viddet_tpu.data.transforms import TrainTransform, ValTransform


def _as_clip(clip: np.ndarray, k: int) -> np.ndarray:
    """Normalize input to a k-frame clip.

    A still image (H, W, 3) becomes a STATIC clip — the frame repeated k
    times — which is how the reference trains k-frame models on combined
    still+video datasets (DET images inside a DET+VID combination,
    SURVEY.md §3.1 item 5 / §4.5).  True clips must already match k.
    """
    if clip.ndim == 3:
        if k < 1:
            raise ValueError(
                "got a still image but the clip transform has no k set; "
                "pass k= so stills can be tiled into static clips"
            )
        return np.repeat(clip[None], k, axis=0)
    if k >= 1 and clip.shape[0] != k:
        raise ValueError(
            f"clip has {clip.shape[0]} frames but the model expects k={k}"
        )
    return clip


@dataclasses.dataclass
class ClipTrainTransform:
    size: Tuple[int, int]
    letterbox_resize: bool = False
    k: int = 0  # 0 = require true clips; >=1 also tiles stills to k frames
    normalize: bool = True  # False: uint8 clips, normalize in-step

    def __post_init__(self):
        self._frame_tf = TrainTransform(
            size=self.size, letterbox_resize=self.letterbox_resize,
            normalize=self.normalize,
        )

    def __call__(self, clip: np.ndarray, label: np.ndarray, rng: np.random.Generator):
        """clip (k, H, W, 3) uint8 -> (k, h, w, 3) f32 (or uint8), label transformed."""
        clip = _as_clip(clip, self.k)
        self._frame_tf.size = self.size
        seed = int(rng.integers(0, 2**63 - 1))
        frames = []
        out_label = None
        for f in clip:
            img, out_label = self._frame_tf(
                f, label.copy(), np.random.default_rng(seed)
            )
            frames.append(img)
        return np.stack(frames), out_label


@dataclasses.dataclass
class ClipValTransform:
    size: Tuple[int, int]
    letterbox_resize: bool = False
    k: int = 0  # 0 = require true clips; >=1 also tiles stills to k frames
    normalize: bool = True  # False: uint8 clips, normalize in-graph

    def __post_init__(self):
        self._frame_tf = ValTransform(
            size=self.size, letterbox_resize=self.letterbox_resize,
            normalize=self.normalize,
        )

    def __call__(self, clip: np.ndarray, label: Optional[np.ndarray] = None):
        clip = _as_clip(clip, self.k)
        frames = []
        out_label, affine = label, None
        for f in clip:
            img, out_label, affine = self._frame_tf(f, label)
            frames.append(img)
        return np.stack(frames), out_label, affine
