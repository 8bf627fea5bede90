"""Pallas TPU kernel for the greedy NMS suppression loop.

The dense math (pairwise IoU -> boolean suppression matrix) is left to XLA,
which fuses it well; what XLA does badly is the *sequential* greedy scan.
The kernel inverts the loop: the grid iterates over candidate RANK i, and
each step applies row i's suppression to ALL batch elements at once —

  * the (K, B, K) suppression matrix streams through VMEM one (1, B, K)
    slice per step (bf16, exact for a 0/1 mask), double-buffered by the
    Pallas pipeline;
  * the running keep mask lives in a persistent VMEM scratch (TPU grids are
    sequential, scratch survives across steps);
  * the per-step cross-lane extraction of keep[:, i] amortizes over the
    whole batch instead of costing one reduce per image.

This makes the scan ~O(K) vector steps for the entire batch rather than
O(B*K).  Exactly matches ``ops.nms.nms_keep_mask`` (the jnp oracle) —
tested in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _greedy_rows_kernel(r, sup_ref, valid_ref, keep_ref, keep_scratch):
    """Grid step s: suppress later candidates of every image by ranks
    s*r .. s*r+r-1, in rank order.

    The serial dependency is through the keep bits only, so the r ranks of
    one step unroll serially in-register — same ALU work as r separate
    steps but one grid step's worth of fixed sequencer/DMA overhead
    (~2.2 us/step measured at r=1, which dominated the ~0.3 us of vector
    work; see docs/perf_notes.md).

    sup_ref: (r, B, K) bf16 block — rows s*r.. of each image's suppress
    matrix.  valid_ref / keep_ref: (B, K) f32 full arrays.
    keep_scratch: persistent (B, K) f32 VMEM accumulator.
    """
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        keep_scratch[:] = valid_ref[:]

    keep = keep_scratch[:]
    col = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1)
    for rr in range(r):
        i = s * r + rr
        keep_i = jnp.sum(
            jnp.where(col == i, keep, 0.0), axis=1, keepdims=True
        )  # (B, 1)
        row = sup_ref[rr].astype(jnp.float32)  # (B, K)
        keep = keep * (1.0 - keep_i * row)
    keep_scratch[:] = keep

    @pl.when(s == pl.num_programs(0) - 1)
    def _():
        keep_ref[:] = keep

def largest_divisor(n: int, cap: int = 8) -> int:
    """Largest divisor of ``n`` up to ``cap``.

    The shared grid-grouping rule: grid steps must tile the axis exactly
    (a floored ``n // r`` grid would silently skip the remainder), and
    grouping amortizes the ~2.2 us/step fixed sequencer/DMA overhead
    (docs/perf_notes.md).  Used for ranks-per-step in the greedy scan,
    images-per-step in the compact kernel, and the finalize kernel's
    group size (``nms_gather_pallas._group_size``)."""
    return next(r for r in range(cap, 0, -1) if n % r == 0)


def _ranks_per_step(k: int, cap: int = 8) -> int:
    """Largest divisor of ``k`` up to ``cap`` (grid steps must tile K)."""
    return largest_divisor(k, cap)


def _compact_kernel(g, k, post):
    """Compact kept candidates to the front (score order), pad with -1.

    Exact equivalent of ``ops.nms._compact_and_pad`` (the jnp oracle) as
    one grid step per group of ``g`` images:

    * the inclusive cumsum over keep bits is a (g, K) x (K, K)
      upper-triangular-ones matmul on the MXU (exact: 0/1 sums <= K);
    * the s-th output slot's gather is a one-hot (post, K) contraction
      against the [cls | score | box] payload;
    * scores/classes arrive lane-major (1, K) rows and are transposed to
      columns with ONE exact MXU contraction against the identity (the
      finalize-kernel layout lesson: Mosaic serializes lane->sublane
      relayouts, the MXU does them for free).
    """

    def kernel(keep_ref, sc_ref, cls_ref, bx_ref, ids_ref, osc_ref, obx_ref):
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        ).astype(jnp.float32)  # U[i, j] = i <= j  -> inclusive cumsum
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        ).astype(jnp.float32)
        pos = jax.lax.dot_general(
            keep_ref[...],
            tri,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (g, K) inclusive counts
        # Mosaic rejects float iota ('tpu.iota' must produce integers —
        # found by the first on-chip compile, round 5); int iota + convert
        # lowers fine and the f32 values are exact for post <= 2^24.
        iota_post = jax.lax.broadcasted_iota(jnp.int32, (post, k), 0).astype(
            jnp.float32
        )
        for gi in range(g):
            keep_row = keep_ref[gi : gi + 1, :]  # (1, K) 0/1 f32
            slot_row = pos[gi : gi + 1, :] - 1.0  # (1, K)
            oh = (
                (iota_post == slot_row) & (keep_row > 0.5)
            ).astype(jnp.float32)  # (post, K): slot s <- (s+1)-th kept cand
            lanes = jnp.concatenate(
                [cls_ref[gi : gi + 1, :], sc_ref[gi : gi + 1, :]], axis=0
            )  # (2, K) lane-major
            cols = jax.lax.dot_general(
                eye,
                lanes,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (K, 2) columns [cls | score]
            payload = jnp.concatenate([cols, bx_ref[gi]], axis=-1)  # (K, 6)
            gath = jax.lax.dot_general(
                oh,
                payload,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (post, 6) — exact 1.0 * f32 products
            filled = jnp.sum(oh, axis=1, keepdims=True) > 0.5  # (post, 1)
            gath = jnp.where(filled, gath, -1.0)
            ids_ref[gi] = gath[:, 0:1]
            osc_ref[gi] = gath[:, 1:2]
            obx_ref[gi] = gath[:, 2:6]

    return kernel


@functools.partial(jax.jit, static_argnames=("post_nms", "interpret"))
def compact_and_pad_pallas(
    keep: jnp.ndarray,
    scores: jnp.ndarray,
    cls_idx: jnp.ndarray,
    boxes: jnp.ndarray,
    post_nms: int,
    interpret: bool = False,
):
    """Batched kept-candidate compaction (see ``_compact_kernel``).

    Args:
      keep: (B, K) 0/1 float keep mask (the greedy-scan output).
      scores / cls_idx: (B, K) float32, score-sorted candidate order.
      boxes: (B, K, 4) float32 corner boxes.

    Returns (ids, scores, boxes): (B, post_nms) / (B, post_nms) /
    (B, post_nms, 4), kept candidates front-compacted, -1 padded —
    exactly ``ops.nms._compact_and_pad``.
    """
    b, k = keep.shape
    g = largest_divisor(b)
    ids, osc, obx = pl.pallas_call(
        _compact_kernel(g, k, post_nms),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, post_nms, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, post_nms, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, post_nms, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, post_nms, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, post_nms, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, post_nms, 4), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        keep.astype(jnp.float32),
        scores.astype(jnp.float32),
        cls_idx.astype(jnp.float32),
        boxes,
    )
    return ids[:, :, 0], osc[:, :, 0], obx


@functools.partial(
    jax.jit, static_argnames=("iou_thresh", "interpret", "ranks_per_step")
)
def nms_keep_mask_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    interpret: bool = False,
    ranks_per_step: int | None = None,
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
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    upper = (col > row)[:, None, :]  # (K, 1, K)
    # IoU in rank-major layout: sup[i, b, j] = suppress(j by i) for image b —
    # built directly in (K, B, K) so no big-transpose materializes.
    a = jnp.swapaxes(boxes, 0, 1)[:, :, None, :]  # (K, B, 1, 4)
    c = boxes[None]  # (1, B, K, 4)
    lt = jnp.maximum(a[..., :2], c[..., :2])
    rb = jnp.minimum(a[..., 2:], c[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # (K, B, K)
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0.0) * jnp.maximum(
        a[..., 3] - a[..., 1], 0.0
    )
    area_c = jnp.maximum(c[..., 2] - c[..., 0], 0.0) * jnp.maximum(
        c[..., 3] - c[..., 1], 0.0
    )
    iou = inter / jnp.maximum(area_a + area_c - inter, 1e-12)
    sup = ((iou > iou_thresh) & upper).astype(jnp.bfloat16)  # (K, B, K)

    r = ranks_per_step or _ranks_per_step(k)
    if k % r:
        # A floored k // r grid would skip the last k % r suppression ranks
        # entirely — a silently wrong keep mask (same guard as
        # conv_pallas.conv_down2_bn_leaky's rows_per_chunk).
        raise ValueError(
            f"ranks_per_step={r} must divide the candidate count K={k}"
        )
    keep = pl.pallas_call(
        functools.partial(_greedy_rows_kernel, r),
        grid=(k // r,),
        in_specs=[
            pl.BlockSpec((r, b, k), lambda s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, k), jnp.float32)],
        interpret=interpret,
    )(sup, valid.astype(jnp.float32))
    return keep
