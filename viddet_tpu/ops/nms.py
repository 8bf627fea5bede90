"""Class-aware non-maximum suppression — pure-jnp reference implementation.

The reference runs NMS *inside* the model's forward graph (MXNet
``contrib.box_nms``, a native C++/CUDA op — SURVEY.md §3.2 N4) so the host
only ever sees fixed-size, already-suppressed detections.  We keep that
contract: everything here is fixed-shape, jit-safe, and returns padded
results plus validity, so the whole decode→NMS path stays on the TPU.

Semantics mirror ``contrib.box_nms(overlap_thresh, valid_thresh, topk,
id_index=0, score_index=1, coord_start=2, force_suppress=False)`` as used by
the GluonCV YOLOv3/SSD heads:

* candidates are sorted by score (descending); only the top-``topk`` survive
  to the suppression stage, the rest are dropped outright;
* suppression is greedy in score order; a candidate is suppressed when its
  IoU with an already-kept candidate exceeds ``iou_thresh``;
* with ``force_suppress=False`` suppression only applies between candidates
  of the same class id (class-aware NMS);
* candidates with score < ``valid_thresh`` are invalid;
* output is the surviving candidates in score order, padded with ``-1``.

A Pallas TPU kernel with identical semantics lives in ``nms_pallas.py`` and
is validated against this implementation; this file is the oracle.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from viddet_tpu.ops.boxes import box_iou


def nms_keep_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
) -> jnp.ndarray:
    """Greedy NMS keep mask over score-sorted candidates.

    Args:
      boxes:  (K, 4) corner boxes, already sorted by descending score.
      scores: (K,) descending scores (used only for validity ordering).
      valid:  (K,) bool — candidates eligible for keeping.
      iou_thresh: suppression overlap threshold.

    Returns:
      (K,) bool keep mask.  Greedy: iterate in score order; keep a candidate
      iff it is valid and not suppressed by any previously KEPT candidate.
    """
    del scores  # ordering is positional; scores only define `valid` upstream
    k = boxes.shape[0]
    iou = box_iou(boxes, boxes)  # (K, K)
    suppress = iou > iou_thresh
    idx = jnp.arange(k)

    def body(i, keep):
        # If candidate i is kept, suppress every later candidate overlapping it.
        row = suppress[i] & (idx > i)
        return jnp.where(keep[i], keep & ~row, keep)

    return jax.lax.fori_loop(0, k, body, valid)


def _compact_and_pad(cand_boxes, top_scores, cls_idx, keep, post_nms):
    """Move kept candidates to the front (score order), pad with -1.

    Stable compaction via cumsum + scatter (cheaper than an argsort on TPU):
    the s-th kept candidate's source index is scattered into slot s.
    """
    k = keep.shape[0]
    pos = jnp.cumsum(keep) - 1  # output slot for each kept candidate
    slot = jnp.where(keep & (pos < post_nms), pos, post_nms)  # dropped if >=
    take = jnp.full((post_nms + 1,), k, jnp.int32).at[slot].set(
        jnp.arange(k, dtype=jnp.int32), mode="drop"
    )[:post_nms]
    kept = take < k
    take = jnp.minimum(take, k - 1)
    out_ids = jnp.where(kept, cls_idx[take], -1.0)
    out_scores = jnp.where(kept, top_scores[take], -1.0)
    out_boxes = jnp.where(kept[:, None], cand_boxes[take], -1.0)
    return out_ids, out_scores, out_boxes


def _class_offset(cand_boxes, cls_idx):
    """Shift each class into a disjoint coordinate region so cross-class IoU
    is exactly 0 (class-aware NMS via a single class-agnostic pass)."""
    span = jnp.maximum(jnp.max(jnp.abs(cand_boxes)), 1.0) + 1.0
    return cand_boxes + (cls_idx * 2.0 * span)[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "valid_thresh", "topk", "post_nms"),
)
def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    iou_thresh: float = 0.45,
    valid_thresh: float = 0.01,
    topk: int = 400,
    post_nms: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched class-aware NMS over dense per-class scores.

    Each anchor contributes one candidate per class (the reference flattens
    (N, C) scores to N*C candidates before ``box_nms`` — SURVEY.md §4.4).

    Args:
      boxes:  (B, N, 4) decoded corner boxes (shared across classes).
      scores: (B, N, C) per-class scores (objectness * class prob).

    Returns:
      (ids, out_scores, out_boxes):
        ids        (B, post_nms)    float class ids, -1 for padding
        out_scores (B, post_nms)    scores, -1 for padding
        out_boxes  (B, post_nms, 4) corner boxes, -1 for padding
    """
    b, n, c = scores.shape

    def single(boxes_i, scores_i):
        flat = scores_i.reshape(-1)  # (N*C,) candidate per (anchor, class)
        k = min(topk, flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(flat, k)
        anchor_idx = top_idx // c
        cls_idx = (top_idx % c).astype(jnp.float32)
        cand_boxes = boxes_i[anchor_idx]  # (k, 4)
        valid = top_scores > valid_thresh

        keep = nms_keep_mask(
            _class_offset(cand_boxes, cls_idx), top_scores, valid, iou_thresh
        )
        return _compact_and_pad(cand_boxes, top_scores, cls_idx, keep, post_nms)

    return jax.vmap(single)(boxes, scores)


def _pair_top_k(pair_scores: jnp.ndarray, k: int, backend: str):
    """Exact top-k for the stage-2 (anchor, class) pair ranking.

    On TPU (``backend`` = "pallas") this uses ``lax.approx_max_k`` with
    ``recall_target=1.0``, which lowers to the TPU PartialReduce unit and is
    ~30% faster than the variadic-sort lowering of ``lax.top_k`` at this
    width (measured 3.18 vs 3.86 ms on (128, 32000) f32, v5e).  With
    recall_target=1.0 the returned VALUES are exact (verified against
    ``lax.top_k`` on random, ascending, descending, and heavily-tied
    inputs); only the order WITHIN exact score ties may differ from
    ``lax.top_k``'s stable lowest-index-first order.  Real pair scores are
    products of distinct sigmoids, where exact f32 ties are measure-zero,
    so the XLA lowering stays the oracle everywhere else.

    ``VIDDET_PAIR_TOPK=det`` (trace-time knob, staged until `make
    chipcheck` proves it on-chip) removes even that tie latitude: see
    ``_pair_top_k_det``.  It is also a throughput candidate — the
    threshold-select kernel measured 0.21 ms at (128, 10647)->400 on v5e
    where the sort lowerings cost 1.2+ ms.
    """
    if backend in ("pallas", "pallas_interpret"):
        if os.environ.get("VIDDET_PAIR_TOPK", "approx") == "det":
            return _pair_top_k_det(
                pair_scores, k, interpret=(backend == "pallas_interpret")
            )
    if backend == "pallas":
        return jax.lax.approx_max_k(pair_scores, k, recall_target=1.0)
    return jax.lax.top_k(pair_scores, k)


def _pair_top_k_det(pair_scores: jnp.ndarray, k: int, interpret: bool = False):
    """Deterministic pair top-k: bit-identical to ``lax.top_k`` INCLUDING
    the stable lowest-index-first order within exact score ties.

    Construction: ``topk_indices_pallas`` (sort-free threshold select)
    returns exactly ``lax.top_k``'s winner SET — score > T plus the
    lowest-index ties at the k-th score T — in ascending-index order.
    Gathering those k scores and re-ranking them with a small
    ``lax.top_k`` (stable: equal values keep their relative input order,
    which here IS ascending original index) reproduces the full-width
    ``lax.top_k`` output order exactly, at the cost of a (B, k) sort
    instead of a (B, N) one.

    Precondition (inherited from the kernel): scores >= 0 except for
    -1.0 padding/sentinel slots, with at least k non-negative entries
    per row.  Every stage-2 caller satisfies this: pair scores are
    sigmoid products / softmax probabilities, and the hierarchical
    merged set's only negatives are the -1.0 dedup sentinels.
    """
    from viddet_tpu.ops.topk_pallas import topk_indices_pallas

    idx = topk_indices_pallas(pair_scores, k, interpret=interpret)  # (B, k)
    vals = jnp.take_along_axis(pair_scores, idx, axis=1)
    v_sorted, pos = jax.lax.top_k(vals, k)
    return v_sorted, jnp.take_along_axis(idx, pos, axis=1)


def _nms_on_candidates(cand_boxes, top_scores, cls_idx, valid, iou_thresh, post_nms, backend):
    """Shared tail: class-offset -> greedy keep -> compact (batched)."""
    offset_boxes = jax.vmap(_class_offset)(cand_boxes, cls_idx)
    if backend == "xla":
        keep = jax.vmap(lambda bb, vv: nms_keep_mask(bb, None, vv, iou_thresh))(
            offset_boxes, valid
        )
    else:
        from viddet_tpu.ops.nms_pallas import (
            compact_and_pad_pallas,
            nms_keep_mask_pallas,
        )

        interp = backend == "pallas_interpret"
        keep = nms_keep_mask_pallas(
            offset_boxes, valid, iou_thresh, interpret=interp
        )
        # Keep the whole tail on-chip: compaction as exact MXU matmuls
        # (bit-identical to _compact_and_pad — see nms_pallas._compact_kernel).
        # Default ON since the round-5 chip session: parity passes on
        # hardware and it wins both the variant trace (0.299 vs 0.531 ms)
        # and the headline bench (2042.3 vs 2039.3 fps) — see
        # docs/perf_notes.md.  VIDDET_COMPACT_KERNEL=0 restores the XLA
        # tail (chip-down debugging / A-B timing).
        if interp or os.environ.get("VIDDET_COMPACT_KERNEL", "1") == "1":
            return compact_and_pad_pallas(
                keep, top_scores, cls_idx, cand_boxes, post_nms, interpret=interp
            )
        keep = keep > 0.5
    return jax.vmap(_compact_and_pad, in_axes=(0, 0, 0, 0, None))(
        cand_boxes, top_scores, cls_idx, keep, post_nms
    )


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "valid_thresh", "topk", "post_nms", "backend"),
)
def multiclass_nms_dense_two_stage(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    iou_thresh: float = 0.45,
    valid_thresh: float = 0.01,
    topk: int = 400,
    post_nms: int = 100,
    backend: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-stage top-k + NMS over a dense (B, N, C) score tensor.

    Same exact-up-to-ties argument as ``multiclass_nms_from_logits`` (an
    anchor outside the top-k by max-class score cannot own a top-k pair).
    Used by SSD/Faster R-CNN heads whose scores are softmax probabilities
    rather than sigmoid-logit products.
    """
    b, n, c = scores.shape
    k = min(topk, n)
    anchor_max = jnp.max(scores, axis=-1).astype(jnp.float32)
    _, a_idx = jax.lax.top_k(anchor_max, k)
    boxes_k = jnp.take_along_axis(boxes, a_idx[..., None], axis=1)
    scores_k = jnp.take_along_axis(scores, a_idx[..., None], axis=1).astype(jnp.float32)
    top_scores, p_idx = _pair_top_k(scores_k.reshape(b, k * c), min(topk, k * c), backend)
    if top_scores.shape[1] < topk:
        pad = topk - top_scores.shape[1]
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=-1.0)
        p_idx = jnp.pad(p_idx, ((0, 0), (0, pad)))
    anchor2 = p_idx // c
    cls_idx = (p_idx % c).astype(jnp.float32)
    cand_boxes = jnp.take_along_axis(boxes_k, anchor2[..., None], axis=1)
    valid = top_scores > valid_thresh
    return _nms_on_candidates(
        cand_boxes, top_scores, cls_idx, valid, iou_thresh, post_nms, backend
    )


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "valid_thresh", "topk", "post_nms", "backend"),
)
def multiclass_nms_late_decode(
    raw_xy: jnp.ndarray,
    raw_wh: jnp.ndarray,
    obj_logits: jnp.ndarray,
    cls_logits: jnp.ndarray,
    cls_max_logits: jnp.ndarray,
    grid_xy: jnp.ndarray,
    anchor_wh: jnp.ndarray,
    stride_n: jnp.ndarray,
    *,
    iou_thresh: float = 0.45,
    valid_thresh: float = 0.01,
    topk: int = 400,
    post_nms: int = 100,
    backend: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k first, box decode second — the YOLO inference hot path.

    Identical results to ``multiclass_nms_from_logits`` on pre-decoded boxes
    (verified bit-for-bit in tests): the sigmoid/exp/affine decode is applied
    per-anchor, so decoding AFTER the stage-1 anchor top-k performs exactly
    the same float ops on the k surviving anchors while skipping the other
    N - k — on the 416 flagship that removes a (B, 10647, 4) float32
    materialization plus its sigmoid/exp traffic from every frame
    (profiled ~1.5 ms/batch-128 on v5e).

    Args:
      raw_xy / raw_wh: (B, N, 2) center / log-size head outputs (any float
        dtype; bf16 stays bf16 until after the gather).
      obj_logits: (B, N, 1); cls_logits: (B, N, C); cls_max_logits: (B, N).
      grid_xy / anchor_wh / stride_n: (N, 2)/(N, 2)/(N, 1) decode constants.
    """
    b, n, c = cls_logits.shape
    k = min(topk, n)

    obj = jax.nn.sigmoid(obj_logits[..., 0].astype(jnp.float32))  # (B, N)
    anchor_score = obj * jax.nn.sigmoid(cls_max_logits.astype(jnp.float32))

    _, a_idx = jax.lax.top_k(anchor_score, k)  # (B, k)
    # Gather the raw head outputs for the k winners, then decode just those.
    xy_k = jnp.take_along_axis(raw_xy, a_idx[..., None], axis=1).astype(jnp.float32)
    wh_k = jnp.take_along_axis(raw_wh, a_idx[..., None], axis=1).astype(jnp.float32)
    center = (jax.nn.sigmoid(xy_k) + grid_xy[a_idx]) * stride_n[a_idx]
    # Same association order as the head's full decode (0.5 * (exp * anchor))
    # so results are bit-identical to decode-then-gather.
    half = 0.5 * (jnp.exp(wh_k) * anchor_wh[a_idx])
    boxes_k = jnp.concatenate([center - half, center + half], axis=-1)

    cls_k = jnp.take_along_axis(cls_logits, a_idx[..., None], axis=1).astype(
        jnp.float32
    )  # (B, k, C)
    obj_k = jnp.take_along_axis(obj, a_idx, axis=1)  # (B, k)

    pair_scores = obj_k[..., None] * jax.nn.sigmoid(cls_k)  # (B, k, C)
    return _stage2_and_nms(
        boxes_k, pair_scores, iou_thresh, valid_thresh, topk, post_nms, backend
    )


def _stage2_and_nms(
    boxes_k, pair_scores, iou_thresh, valid_thresh, topk, post_nms, backend
):
    """Shared stage-2 (anchor, class) top-k -> candidate gather -> NMS."""
    b, k, c = pair_scores.shape
    top_scores, p_idx = _pair_top_k(
        pair_scores.reshape(b, k * c), min(topk, k * c), backend
    )
    if top_scores.shape[1] < topk:  # k*c < topk: pad (tiny class counts)
        pad = topk - top_scores.shape[1]
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=-1.0)
        p_idx = jnp.pad(p_idx, ((0, 0), (0, pad)))
    anchor2 = p_idx // c  # (B, topk) index into boxes_k
    cls_idx = (p_idx % c).astype(jnp.float32)
    cand_boxes = jnp.take_along_axis(boxes_k, anchor2[..., None], axis=1)
    valid = top_scores > valid_thresh
    return _nms_on_candidates(
        cand_boxes, top_scores, cls_idx, valid, iou_thresh, post_nms, backend
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "meta",
        "iou_thresh",
        "valid_thresh",
        "topk",
        "post_nms",
        "backend",
    ),
)
def multiclass_nms_late_decode_fused(
    raws_cells: Tuple[jnp.ndarray, ...],
    anchor_score: jnp.ndarray | None,
    meta,
    *,
    iou_thresh: float = 0.45,
    valid_thresh: float = 0.01,
    topk: int = 400,
    post_nms: int = 100,
    backend: str = "pallas",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Late-decode NMS consuming PER-SCALE cell-layout head tensors directly.

    Bit-identical to ``multiclass_nms_late_decode`` (pinned by tests): the
    stage-1 gather, box decode, and pair-score chain run as one Pallas
    kernel (``ops/nms_gather_pallas.py`` — gather as an exact one-hot MXU
    matmul over grid cells, decode constants recomputed arithmetically),
    which removes the concatenated (B, N, 5+C) head tensor, the per-scale
    anchor-split reshapes, and five XLA gathers from the program
    (~3 ms/batch-128 on v5e).

    Args:
      raws_cells: per-scale raw head outputs, deepest scale first — either
        cell layout (B, h*w, na*(5+C)) or, under VIDDET_TAIL_INPUT=conv,
        the output convs' untouched 4-D (B, h, w, na*(5+C)) (bit-identical
        detections; the kernels take a padded cell view in-kernel so the
        relayout copy never materializes — ops/nms_gather_pallas.py).
        The stage-1 k is capped at the REAL anchor count either way, which
        keeps score-0 pad rows unselectable (every real anchor score is a
        sigmoid product > 0).
      anchor_score: optional precomputed (B, N) stage-1 scores; None builds
        them with the Pallas ``anchor_scores`` kernel (one read of the head
        tensors instead of the XLA reduce/concat chain).
      meta: static per-scale ``(cells, width, stride, anchors)`` tuples.
    """
    from viddet_tpu.ops.nms_gather_pallas import gather_decode_pairs

    # Trace-time knob (set before process start, like every VIDDET_* flag):
    # deterministic ranking — see the use_hier comment below.
    pair_det = os.environ.get("VIDDET_PAIR_TOPK", "approx") == "det"

    na0 = len(meta[0][3])
    n = sum(mm[0] for mm in meta) * na0
    k = min(topk, n)

    interp = backend == "pallas_interpret"
    if anchor_score is None:
        from viddet_tpu.ops.nms_gather_pallas import anchor_scores

        # "masked" is the candidate faster formulation, exact by
        # construction; stays opt-in until trace_tail proves it on-chip
        # (docs/perf_notes.md "pending on-chip items").  NOTE: read at
        # trace time — set before process start (like the other VIDDET_*
        # kernel knobs); an in-process change after the first call hits
        # the jit cache and is ignored.
        anchor_score = anchor_scores(
            tuple(raws_cells), meta, interpret=interp,
            variant=os.environ.get("VIDDET_SCORE_KERNEL", "slice"),
        )
    # Stage-1 winners via the sort-free threshold-select kernel: exact same
    # index SET as lax.top_k (ties included) in ascending-index order; the
    # candidate order is immaterial because stage-2 re-ranks every
    # (anchor, class) pair by score.  ~2x faster than the XLA sort and
    # safe here because anchor scores are sigmoid products (>= 0).
    from viddet_tpu.ops.topk_pallas import topk_indices_pallas

    a_idx = topk_indices_pallas(anchor_score, k, interpret=interp)  # (B, k)
    if pair_det:
        # Deterministic mode: reorder the winners into lax.top_k's exact
        # order (score desc, ties lowest-index-first — the stable re-rank
        # over ascending-index winners reproduces it bitwise).  The boxes_k
        # layout then matches the XLA oracle's element-for-element, so
        # even cross-anchor pair-score ties rank identically downstream.
        # Without det the ascending order is fine: stage-2 re-ranks by
        # score, and the approx path's tie latitude is documented.
        a_sc = jnp.take_along_axis(anchor_score, a_idx, axis=1)
        _, pos = jax.lax.top_k(a_sc, k)
        a_idx = jnp.take_along_axis(a_idx, pos, axis=1)

    na = len(meta[0][3])
    c = raws_cells[0].shape[-1] // na - 5
    m = 9
    j = min((topk - 1) // m + 1, k)
    # Under the deterministic ranking (VIDDET_PAIR_TOPK=det) skip the
    # hierarchical reduced-width ranking and rank the FULL k*C pair
    # width: the hier merged layout orders exact score ties differently
    # from the flat pair-index order (cand section before hot section),
    # so even a deterministic rank of the merged array can tie-swap vs
    # the oracle.  Full-width det ranking removes the deviation class
    # entirely — threshold-select == lax.top_k's set AND order — making
    # the fused path bit-identical to the XLA chain under ARBITRARY ties
    # (bf16 included).  Cost trade on v5e (docs/perf_notes.md): gather
    # drops to the m=0 floor (0.59 vs 1.2 ms) while the select widens
    # (k*C=32000 vs 6800) — adjudicated on-chip by trace_tail --group
    # pairtopk before this flag can become the default.
    use_hier = c > m + 1 and k * (m - 1) >= topk and not pair_det
    outs = gather_decode_pairs(
        tuple(raws_cells),
        a_idx,
        meta,
        extract_m=m if use_hier else 0,
        hot_j=j if use_hier else 0,
        interpret=interp,
        # "rank" is the parallel all-pairs top-m formulation, bit-identical
        # by construction; stays opt-in until trace_tail --group topm proves
        # it on-chip.  Trace-time knob like the other VIDDET_* flags.
        topm_variant=os.environ.get("VIDDET_TOPM_KERNEL", "extract"),
    )
    if use_hier:
        boxes_k, v_m, i_m, hot_flat, hot_idx = outs
        return _stage2_hier_and_nms(
            boxes_k, v_m, i_m, hot_flat, hot_idx,
            iou_thresh, valid_thresh, topk, post_nms, backend,
        )
    boxes_k, pair_scores = outs
    return _stage2_and_nms(
        boxes_k, pair_scores, iou_thresh, valid_thresh, topk, post_nms, backend
    )


def _stage2_hier_and_nms(
    boxes_k, v_m, i_m, hot_flat, hot_idx, iou_thresh, valid_thresh, topk, post_nms, backend
):
    """Hierarchical EXACT stage-2 ranking — branchless pigeonhole repair.

    The kernel already extracted each candidate box's top-m pair scores
    (``v_m``/``i_m``), so the bulk of the ranking runs on the K*(m-1)-wide
    per-box-top-(m-1) candidate set instead of the full K*C pairs (400*8 =
    3200 vs 32000 at the flagship config; the full-width ranking costs
    ~2.4 ms at batch 128 on v5e, this path ~1.3 ms).

    Exactness (pigeonhole): let T be the true topk-th pair score.  A pair
    missed by the per-box top-(m-1) set and strictly above T implies its
    box has >= m pairs strictly above T, and there are at most
    J = floor((topk-1)/m) + 1 such boxes; every one of them ranks in the
    top-J boxes by m-th-ranked score.  Appending the FULL class rows of those
    top-J boxes (minus their already-included top-(m-1) classes) therefore
    makes the candidate set complete for every pair > T, for EVERY input —
    no data-dependent fallback (a ``lax.cond`` here costs ~3.4 ms of
    pipeline serialization on v5e).  Pairs exactly EQUAL to T can tie-swap
    with in-set candidates of the same score — the same tie-resolution
    latitude as ``_pair_top_k`` already documents.
    """
    b, k, m = v_m.shape
    c = hot_flat.shape[-1]
    j = hot_flat.shape[1]
    width = k * (m - 1)
    cand = v_m[..., : m - 1].reshape(b, width)
    cid = i_m[..., : m - 1].reshape(b, width)

    merged = jnp.concatenate([cand, hot_flat.reshape(b, j * c)], axis=1)
    top_scores, q = _pair_top_k(merged, topk, backend)

    if backend in ("pallas", "pallas_interpret"):
        # Map winners back with exact one-hot contractions on the MXU —
        # the XLA take_along_axis chain below costs ~1.2 ms/batch-128.
        from viddet_tpu.ops.nms_gather_pallas import finalize_candidates

        cls_idx, cand_boxes = finalize_candidates(
            i_m, hot_idx, q, boxes_k, num_classes=c,
            interpret=(backend == "pallas_interpret"),
        )
    else:
        from_cand = q < width
        box1 = q // (m - 1)
        cls1 = jnp.take_along_axis(cid, jnp.minimum(q, width - 1), axis=1)
        e = jnp.maximum(q - width, 0)
        box2 = jnp.take_along_axis(hot_idx[:, 0], e // c, axis=1)
        cls2 = e % c
        box_sel = jnp.where(from_cand, box1, box2)
        cls_idx = jnp.where(from_cand, cls1, cls2).astype(jnp.float32)
        cand_boxes = jnp.take_along_axis(boxes_k, box_sel[..., None], axis=1)
    valid = top_scores > valid_thresh
    return _nms_on_candidates(
        cand_boxes, top_scores, cls_idx, valid, iou_thresh, post_nms, backend
    )


@functools.partial(
    jax.jit,
    static_argnames=("iou_thresh", "valid_thresh", "topk", "post_nms", "backend"),
)
def multiclass_nms_from_logits(
    boxes: jnp.ndarray,
    obj_logits: jnp.ndarray,
    cls_logits: jnp.ndarray,
    cls_max_logits: jnp.ndarray | None = None,
    *,
    iou_thresh: float = 0.45,
    valid_thresh: float = 0.01,
    topk: int = 400,
    post_nms: int = 100,
    backend: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-stage exact top-k + class-aware NMS, straight from head logits.

    TPU hot path.  Equivalent to ``multiclass_nms(boxes, sigmoid(obj)*
    sigmoid(cls))`` (up to score ties) but never materializes the dense
    (B, N, C) float32 score tensor, and the top-k over N*C candidates is
    replaced by two small top-ks:

      1. rank anchors by their best class score — exact because
         ``max_c sigmoid(obj)·sigmoid(cls_c) = sigmoid(obj)·sigmoid(max_c
         cls_c)`` (sigmoid is monotone), so an anchor outside the top-k by
         max-class score cannot contribute any top-k (anchor, class) pair;
      2. expand only those k anchors' class scores and rank the k·C pairs.

    Args:
      boxes: (B, N, 4) float32 decoded boxes.
      obj_logits: (B, N, 1) objectness logits (any float dtype).
      cls_logits: (B, N, C) class logits (any float dtype; bf16 stays bf16
        until the k·C slice is gathered).
      backend: "xla" (jnp greedy loop), "pallas" (TPU kernel),
        "pallas_interpret" (kernel in interpreter mode, for CPU tests).

    Returns (ids, scores, boxes) fixed-shape, -1 padded (see multiclass_nms).
    """
    b, n, c = cls_logits.shape
    k = min(topk, n)

    obj = jax.nn.sigmoid(obj_logits[..., 0].astype(jnp.float32))  # (B, N)
    if cls_max_logits is None:
        cls_max_logits = jnp.max(cls_logits, axis=-1)  # (B, N)
    anchor_score = obj * jax.nn.sigmoid(cls_max_logits.astype(jnp.float32))

    _, a_idx = jax.lax.top_k(anchor_score, k)  # (B, k)
    boxes_k = jnp.take_along_axis(boxes, a_idx[..., None], axis=1)  # (B, k, 4)
    cls_k = jnp.take_along_axis(cls_logits, a_idx[..., None], axis=1).astype(
        jnp.float32
    )  # (B, k, C)
    obj_k = jnp.take_along_axis(obj, a_idx, axis=1)  # (B, k)

    pair_scores = obj_k[..., None] * jax.nn.sigmoid(cls_k)  # (B, k, C)
    top_scores, p_idx = _pair_top_k(pair_scores.reshape(b, k * c), min(topk, k * c), backend)
    if top_scores.shape[1] < topk:  # k*c < topk: pad (tiny class counts)
        pad = topk - top_scores.shape[1]
        top_scores = jnp.pad(top_scores, ((0, 0), (0, pad)), constant_values=-1.0)
        p_idx = jnp.pad(p_idx, ((0, 0), (0, pad)))
    anchor2 = p_idx // c  # (B, topk) index into boxes_k
    cls_idx = (p_idx % c).astype(jnp.float32)
    cand_boxes = jnp.take_along_axis(boxes_k, anchor2[..., None], axis=1)
    valid = top_scores > valid_thresh
    return _nms_on_candidates(
        cand_boxes, top_scores, cls_idx, valid, iou_thresh, post_nms, backend
    )
