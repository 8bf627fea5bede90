"""ROIAlign — bilinear region-of-interest pooling (jnp, vectorized).

TPU-native equivalent of the reference stack's native ROIAlign op
(MXNet/GluonCV C++/CUDA — SURVEY.md §3.2 N5).  Instead of a scalar kernel
over sampling points, the whole operation is expressed as dense gathers +
bilinear weights so XLA vectorizes it; the FPN level-assignment variant
computes the align on every level and masks, keeping shapes static.

Semantics follow the standard ROIAlign definition (Mask R-CNN paper):
``sampling_ratio`` regular sample points per bin side, bilinear
interpolation at each point, average within the bin, half-pixel alignment
(no rounding, no offset).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (H, W, C) at float coords ys/xs (...,) -> (..., C).

    Out-of-bounds samples contribute 0 (matching the standard op).
    """
    h, w, _ = feat.shape
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y = jnp.clip(ys, 0.0, h - 1.0)
    x = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (
        v00 * ((1 - ly) * (1 - lx))[..., None]
        + v01 * ((1 - ly) * lx)[..., None]
        + v10 * (ly * (1 - lx))[..., None]
        + v11 * (ly * lx)[..., None]
    )
    return out * valid[..., None]


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign on a single feature map.

    Args:
      features: (H, W, C).
      rois: (R, 4) corner boxes in IMAGE coordinates.
      spatial_scale: feature_stride^-1 (e.g. 1/16).
      output_size: pooled bins per side (P).
      sampling_ratio: sample points per bin side (S).

    Returns (R, P, P, C) float32.
    """
    p, s = output_size, sampling_ratio
    boxes = rois * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    rw = jnp.maximum(x2 - x1, 1e-3)
    rh = jnp.maximum(y2 - y1, 1e-3)
    bin_w = rw / p
    bin_h = rh / p

    # sample grid: (R, P*S) per axis — bin index * bin_size + in-bin offset
    grid = (jnp.arange(p * s) + 0.5) / s  # in bin units over the P*S lattice
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]  # (R, P*S)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], p * s, p * s))
    xx = jnp.broadcast_to(xs[:, None, :], (rois.shape[0], p * s, p * s))

    sampled = jax.vmap(lambda y, x: _bilinear_sample(features, y, x))(yy, xx)
    r, _, _, c = sampled.shape
    # average the S x S samples inside each bin
    return sampled.reshape(r, p, s, p, s, c).mean(axis=(2, 4))


def fpn_roi_level(rois: jnp.ndarray, k0: int = 4, canonical: float = 224.0,
                  k_min: int = 2, k_max: int = 5) -> jnp.ndarray:
    """FPN level assignment (FPN paper eq. 1): k = k0 + log2(sqrt(wh)/224)."""
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1e-6)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1e-6)
    k = jnp.floor(k0 + jnp.log2(jnp.sqrt(w * h) / canonical))
    return jnp.clip(k, k_min, k_max).astype(jnp.int32)


def multilevel_roi_align_packed(
    pyramid: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    k_min: int = 2,
) -> jnp.ndarray:
    """ROIAlign over an FPN pyramid — packed single-gather formulation.

    Equivalent to ``multilevel_roi_align`` but ~len(pyramid)x cheaper: the
    levels are flattened into one (sum HW, C) buffer and each roi's bilinear
    samples index its assigned level via a per-roi row offset, so every roi
    is aligned exactly once (one gather pass) instead of on every level with
    masking.
    """
    p, s = output_size, sampling_ratio
    r = rois.shape[0]
    c = pyramid[0].shape[-1]
    flat = jnp.concatenate([f.reshape(-1, c) for f in pyramid], axis=0)
    hs = jnp.asarray([f.shape[0] for f in pyramid])
    ws = jnp.asarray([f.shape[1] for f in pyramid])
    offsets = jnp.asarray(
        [sum(int(f.shape[0] * f.shape[1]) for f in pyramid[:i])
         for i in range(len(pyramid))]
    )
    stride_arr = jnp.asarray(strides, jnp.float32)

    lvl = fpn_roi_level(rois, k_min=k_min, k_max=k_min + len(pyramid) - 1) - k_min
    scale = 1.0 / stride_arr[lvl]  # (R,)
    lh = hs[lvl]
    lw = ws[lvl]
    base = offsets[lvl]

    boxes = rois * scale[:, None]
    x1, y1 = boxes[:, 0], boxes[:, 1]
    bin_w = jnp.maximum(boxes[:, 2] - x1, 1e-3) / p
    bin_h = jnp.maximum(boxes[:, 3] - y1, 1e-3) / p
    grid = (jnp.arange(p * s) + 0.5) / s
    ys = y1[:, None] + grid[None, :] * bin_h[:, None]  # (R, P*S)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (r, p * s, p * s))
    xx = jnp.broadcast_to(xs[:, None, :], (r, p * s, p * s))

    lhf = lh.astype(jnp.float32)[:, None, None]
    lwf = lw.astype(jnp.float32)[:, None, None]
    valid = (yy > -1.0) & (yy < lhf) & (xx > -1.0) & (xx < lwf)
    y = jnp.clip(yy, 0.0, lhf - 1.0)
    x = jnp.clip(xx, 0.0, lwf - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, lh[:, None, None] - 1)
    x1i = jnp.minimum(x0 + 1, lw[:, None, None] - 1)
    ly = y - y0
    lx = x - x0

    def fetch(yi, xi):
        idx = base[:, None, None] + yi * lw[:, None, None] + xi
        return flat[idx]  # (R, P*S, P*S, C)

    out = (
        fetch(y0, x0) * ((1 - ly) * (1 - lx))[..., None]
        + fetch(y0, x1i) * ((1 - ly) * lx)[..., None]
        + fetch(y1i, x0) * (ly * (1 - lx))[..., None]
        + fetch(y1i, x1i) * (ly * lx)[..., None]
    ) * valid[..., None]
    return out.reshape(r, p, s, p, s, c).mean(axis=(2, 4))


def multilevel_roi_align(
    pyramid: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    k_min: int = 2,
) -> jnp.ndarray:
    """ROIAlign over an FPN pyramid with per-roi level assignment.

    pyramid: list of (H_l, W_l, C) maps, levels k_min..k_min+len-1.
    rois: (R, 4) image-coordinate corner boxes.
    Static-shape strategy: align every roi on EVERY level, then select by
    the assigned level — no dynamic partitioning, XLA-friendly.
    """
    levels = fpn_roi_level(
        rois, k_min=k_min, k_max=k_min + len(pyramid) - 1
    )
    out = None
    for i, (feat, stride) in enumerate(zip(pyramid, strides)):
        aligned = roi_align(
            feat, rois, 1.0 / stride, output_size, sampling_ratio
        )
        mask = (levels == (k_min + i)).astype(aligned.dtype)[:, None, None, None]
        out = aligned * mask if out is None else out + aligned * mask
    return out
