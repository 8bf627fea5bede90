"""Pallas TPU kernel for the greedy NMS suppression loop.

The dense math (pairwise IoU -> boolean suppression matrix) is left to XLA,
which fuses it well; what XLA does badly is the *sequential* greedy scan
(an HLO while-loop pays ~100µs/iteration of loop machinery).  This kernel
runs the scan entirely in VMEM: per batch element, 1 dynamic row-slice +
2 vector ops per candidate, ~K iterations of on-core work.

Exactly matches ``ops.nms.nms_keep_mask`` (the jnp oracle) — tested in
interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viddet_tpu.ops.boxes import box_iou


def _greedy_scan_kernel(sup_ref, valid_ref, keep_ref):
    """sup_ref (1,K,K) f32 upper-tri suppress matrix; valid/keep (1,1,K) f32.

    The (B,1,K) layout (instead of (B,K)) keeps the block's trailing two
    dims equal to the array dims, as Mosaic requires.
    """
    k = valid_ref.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep):
        keep_i = jnp.sum(jnp.where(col == i, keep, 0.0))
        row = sup_ref[0, pl.ds(i, 1), :]  # (1, K)
        return keep * (1.0 - keep_i * row)

    keep_ref[0] = jax.lax.fori_loop(0, k, body, valid_ref[0])


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def nms_keep_mask_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched greedy NMS keep mask.

    Args:
      boxes: (B, K, 4) corner boxes sorted by descending score (class-offset
        them beforehand for class-aware behavior).
      valid: (B, K) bool/float eligibility mask.
      iou_thresh: suppression threshold.

    Returns (B, K) float32 keep mask (1.0 = kept).
    """
    b, k, _ = boxes.shape
    iou = box_iou(boxes, boxes)  # (B, K, K) — dense, XLA-fused
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    sup = ((iou > iou_thresh) & (col > row)[None]).astype(jnp.float32)

    keep = pl.pallas_call(
        _greedy_scan_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(sup, valid.astype(jnp.float32).reshape(b, 1, k))
    return keep.reshape(b, k)
