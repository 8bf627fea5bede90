"""Fused stage-1 gather + late box decode + pair scores as one Pallas kernel.

The YOLO inference tail between the stage-1 anchor top-k and the stage-2
(anchor, class) top-k is, in XLA, a chain of five ``take_along_axis``
gathers plus the head-tensor concat/reshape/slices feeding them — ~4.5 ms
of pure data movement at batch 128 on v5e (profiled; docs/perf_notes.md).
This kernel replaces all of it with one pass per image:

* **Gather as a one-hot matmul.**  Mosaic has no general gather, but the
  MXU is idle here: ``onehot(cell_idx) @ head`` IS the gather, runs on the
  systolic array, and is exact — each output row is ``1.0 * value``.  One
  dot per FPN scale also merges the scales, so neither the (B, N, 5+C)
  concat nor the per-scale (B, h*w*na, 5+C) anchor-split reshapes are ever
  materialized: the kernel consumes the head's natural (B, h*w, na*(5+C))
  cell layout and selects the winning anchor's lane group with static
  slices + masks.
* **Decode constants are recomputed, not gathered.**  grid x/y, stride,
  and the anchor priors are pure functions of the flat index and the
  static config — a handful of exact f32 VPU ops per candidate (integer
  div/mod via a provably-exact float trick), bit-identical to the
  reference constants.
* The sigmoid/exp late decode and the ``obj * sigmoid(cls)`` pair scores
  run in the epilogue, so the kernel emits exactly the two tensors the
  stage-2 top-k needs.

Outputs are bit-identical to the XLA ``multiclass_nms_late_decode`` chain
(pinned by tests/unit/test_nms_gather_pallas.py and on-chip by
tools/tpu_parity_check.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def scale_constants_np(h: int, w: int, anchors, stride: int):
    """(N, 5) float32 [grid_x, grid_y, anchor_w, anchor_h, stride] in the
    head's (row, col, anchor) flattening order — numpy twin of
    ``models.yolo3._scale_constants`` (test oracle helper)."""
    import numpy as np

    na = len(anchors)
    gx = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :, None], (h, w, na))
    gy = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None, None], (h, w, na))
    aw = np.broadcast_to(
        np.asarray(anchors, np.float32)[None, None, :, 0], (h, w, na)
    )
    ah = np.broadcast_to(
        np.asarray(anchors, np.float32)[None, None, :, 1], (h, w, na)
    )
    st = np.full((h, w, na), float(stride), np.float32)
    return np.stack([gx, gy, aw, ah, st], axis=-1).reshape(-1, 5)


# Sublane pad value for the conv-layout (4-D) input path.  Mosaic only
# lowers the in-kernel (H, W, lanes) -> (H*W, lanes) merge when W is a
# multiple of the 8-row sublane tile (probed on v5e: the unpadded W=13
# merge is rejected — "tpu.reshape" vector<1x13x13x255> -> vector<169x255>
# — while the padded merge compiles in bf16 AND f32), so W is padded up
# and the kernels run on a PADDED cell space.  -1e9 makes pad rows inert
# everywhere downstream, exactly:
#   * anchor scores: sigmoid(-1e9) == 0.0 in f32 (exp(-1e9) == 0), so pad
#     rows score exactly 0.0 < every real score (sigmoid products > 0) and
#     the stage-1 threshold-select never picks them while k <= N_real;
#   * the one-hot gather: 0 * -1e9 == -0.0 (finite — an inf pad would put
#     NaNs in every dot), and +0.0 + -0.0 == +0.0, so gathered rows are
#     bit-identical to the cells-layout path;
#   * the 0.0-score-tie corner (a real row underflowing to exactly 0.0,
#     tying with pads at the k-th slot): a selected pad row decodes to a
#     zero-area box with pair scores exactly 0.0, which valid_thresh
#     (> 0) filters just like the real 0.0-score row it displaced.
# (-inf itself is rejected by Mosaic as a full() fill value — probed.)
_CONV_PAD = -1e9


def _conv_dims(shapes, meta):
    """Per-scale (H, W, Wp) for 4-D conv-layout inputs, plus the PADDED
    meta the kernels index with (cells -> H*Wp, width -> Wp)."""
    dims, meta_pad = [], []
    for shp, (cells, width, stride, anchors) in zip(shapes, meta):
        h, w = shp[-3], shp[-2]
        assert h * w == cells and w == width, (shp, cells, width)
        wp = -(-w // 8) * 8
        dims.append((h, w, wp))
        meta_pad.append((h * wp, wp, stride, anchors))
    return tuple(dims), tuple(meta_pad)


def _cells_view(x, dims):
    """(H, W, lanes) block value -> (H*Wp, lanes) padded cell view."""
    h, w, wp = dims
    if wp > w:
        x = jnp.concatenate(
            [x, jnp.full((h, wp - w, x.shape[-1]), _CONV_PAD, x.dtype)],
            axis=1,
        )
    return x.reshape(h * wp, x.shape[-1])


def _group_size(b: int, cap: int = 8) -> int:
    """Images per grid step: each step pays ~9 us of fixed sequencer/DMA
    overhead (measured on v5e) regardless of block size, which dominates
    these small per-image kernels at batch 128 — amortize it over the
    largest divisor of ``b`` up to ``cap``."""
    from viddet_tpu.ops.nms_pallas import largest_divisor

    return largest_divisor(b, cap)


def _exact_divmod(n_f: jnp.ndarray, d: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """floor(n/d), n%d for small non-negative integer-valued f32 vectors.

    ``floor((n + 0.5) / d)`` is exact: (n+0.5)/d lies strictly inside
    (q, q+1) and f32 rounding (|rel err| <= 2^-24) cannot cross either
    integer boundary for n < 2^22.
    """
    q = jnp.floor((n_f + 0.5) / float(d))
    return q, n_f - q * float(d)


def _extract_top_m(pairs, m):
    """Per-row top-m values + col indices via m argmax-extract steps.

    Runs on data already in registers/VMEM (the XLA equivalent costs ~1 ms
    of HBM re-reads at batch 128).  Exact: each step removes exactly one
    (lowest-index) occurrence of the current max (masked to -inf so finite
    inputs of any sign are never out-ranked by an extracted slot), so tied
    values survive into later steps and the extracted multiset equals
    lax.top_k's.  Steps beyond the row width (m > C) emit (-inf, 0).
    """
    k, c = pairs.shape
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (k, c), 1)
    cur = pairs
    vals, idxs = [], []
    for _ in range(m):
        mx = jnp.max(cur, axis=-1)
        im = jnp.min(
            jnp.where(cur == mx[:, None], iota_c, c), axis=-1
        )  # first-match col
        vals.append(mx)
        idxs.append(im)
        cur = jnp.where(iota_c == im[:, None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)  # (k, m) each


def _extract_top_m_rank(pairs, m, rows_chunk=64):
    """Per-row top-m via an all-pairs rank — no serial dependency chain.

    ``_extract_top_m``'s m argmax-extract steps form a serial VPU
    dependency chain (~35 us/step at batch 128, docs/perf_notes.md
    variant table: ~0.5 ms total at m=9).  Here each row's elements are
    ranked in ONE parallel pass: rank[j] = #{l : p[l] > p[j] or
    (p[l] == p[j] and l < j)} — the exact stable descending order
    ``_extract_top_m`` produces (ties go lowest-index-first), so the
    (vals, idxs) outputs are bit-identical for any FINITE input
    (incl. m > C, where both emit (-inf, 0) for the missing steps).  The (rows, C, C) compare
    intermediate (~10 MiB/image at k=400, C=80 in f32) is chunked over
    rows to bound scoped VMEM; chunks are independent and pipeline.

    Whether Mosaic's rank-3 codegen actually beats the serial chain is an
    on-chip question — staged behind VIDDET_TOPM_KERNEL=rank, measured by
    tools/trace_tail.py --group topm.
    """
    k, c = pairs.shape
    vals = []
    idxs = []
    for r0 in range(0, k, rows_chunk):
        r1 = min(r0 + rows_chunk, k)
        r = r1 - r0
        p = pairs[r0:r1]  # (r, c)
        pj = p[:, :, None]  # value being ranked, broadcast over lanes
        pl_ = p[:, None, :]  # competitors, broadcast over sublanes
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (r, c, c), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (r, c, c), 2)
        beats = (pl_ > pj) | ((pl_ == pj) & (iota_l < iota_j))
        rank = jnp.sum(
            beats.astype(jnp.float32), axis=2
        )  # (r, c) exact small-int counts
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
        v_rows = []
        i_rows = []
        for t in range(m):
            oh = (rank == float(t)).astype(jnp.float32)  # one-hot (or zero
            # rows when t >= c — then emit (-inf, 0) exactly like the
            # extraction loop's masked-out steps)
            hit = jnp.sum(oh, axis=-1)
            v_rows.append(
                jnp.where(hit > 0.0, jnp.sum(p * oh, axis=-1), -jnp.inf)
            )
            i_rows.append(jnp.sum(iota_c.astype(jnp.float32) * oh, axis=-1))
        vals.append(jnp.stack(v_rows, axis=-1))
        idxs.append(jnp.stack(i_rows, axis=-1).astype(jnp.int32))
    return jnp.concatenate(vals, axis=0), jnp.concatenate(idxs, axis=0)


def _make_kernel(
    g, meta, k, c, extract_m, hot_j, topm_variant="extract", conv_dims=None
):
    """Kernel over a group of ``g`` images (see ``_group_size``).

    meta: static per-scale tuples (cells, width, stride, anchors) with
    anchors = ((w, h), ...) python floats; deepest scale first.
    extract_m: if > 0, emit per-box top-m pair values/class indices plus
    the hot_j-box pigeonhole repair set instead of the dense pair tensor
    (fuel for the hierarchical exact stage-2 top-k).
    topm_variant: "extract" (serial argmax-extract steps, production) or
    "rank" (parallel all-pairs rank, staged — see ``_extract_top_m_rank``);
    both produce bit-identical outputs.
    conv_dims: if set, blocks arrive in the output conv's native 4-D
    layout (H, W, na*(5+C)); ``meta`` must then be the PADDED meta and
    the padded (H*Wp, lanes) cell view is taken in-kernel (see
    ``_cells_view``/``_CONV_PAD`` — gathered rows stay bit-identical to
    the cells-layout path because pad cells are never selected and the
    one-hot's 0 * pad products are exact -0.0 terms).
    """
    na = len(meta[0][3])
    d = 5 + c
    lanes = na * d

    def kernel(*refs):
        raw_refs = refs[: len(meta)]
        idx_ref = refs[len(meta)]
        for gi in range(g):
            _one_image(gi, raw_refs, idx_ref, refs[len(meta) + 1 :])

    def _one_image(gi, raw_refs, idx_ref, out_refs):
        if extract_m:
            ob_ref, vm_ref, im_ref, hf_ref, hi_ref = out_refs
        else:
            ob_ref, op_ref = out_refs
        idx = idx_ref[gi, 0]  # (K,) i32 — flat (scale, cell, anchor) index

        # Per-candidate metadata, piecewise over scales (exact f32 int math),
        # and one one-hot cell dot per scale.
        off = 0
        g255 = jnp.zeros((k, lanes), jnp.float32)
        a_f = jnp.zeros((k,), jnp.float32)
        gx = jnp.zeros((k,), jnp.float32)
        gy = jnp.zeros((k,), jnp.float32)
        stride_v = jnp.zeros((k,), jnp.float32)
        aw = jnp.zeros((k,), jnp.float32)
        ah = jnp.zeros((k,), jnp.float32)
        for sidx, (cells, width, stride, anchors) in enumerate(meta):
            n_s = cells * na
            local_i = idx - off
            in_s = (local_i >= 0) & (local_i < n_s)
            local = jnp.where(in_s, local_i, 0).astype(jnp.float32)
            cell_f, a_s = _exact_divmod(local, na)
            gy_s, gx_s = _exact_divmod(cell_f, width)
            a_f = jnp.where(in_s, a_s, a_f)
            gx = jnp.where(in_s, gx_s, gx)
            gy = jnp.where(in_s, gy_s, gy)
            stride_v = jnp.where(in_s, float(stride), stride_v)
            aw_s = jnp.zeros((k,), jnp.float32)
            ah_s = jnp.zeros((k,), jnp.float32)
            for ai, (w_a, h_a) in enumerate(anchors):
                hit = a_s == float(ai)
                aw_s = jnp.where(hit, float(w_a), aw_s)
                ah_s = jnp.where(hit, float(h_a), ah_s)
            aw = jnp.where(in_s, aw_s, aw)
            ah = jnp.where(in_s, ah_s, ah)
            # One-hot over CELLS of this scale (zero rows when off-scale).
            # Match the raw dtype: a bf16 one-hot against an f32 operand
            # makes compiled Mosaic demote the f32 side to bf16 (interpret
            # mode promotes instead) — f32 inputs must use an f32 one-hot.
            cell_i = jnp.where(in_s, cell_f.astype(jnp.int32), -1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (k, cells), 1)
            onehot = (iota == cell_i[:, None]).astype(raw_refs[sidx].dtype)
            # bf16 inputs: 1.0*x is exact at default precision (and Mosaic
            # rejects an fp32-precision matmul with bf16 operands).  f32
            # inputs NEED Precision.HIGHEST or the TPU default truncates
            # them to one bf16 pass.
            prec = (
                jax.lax.Precision.HIGHEST
                if raw_refs[sidx].dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
            x_s = raw_refs[sidx][gi]
            if conv_dims is not None:
                x_s = _cells_view(x_s, conv_dims[sidx])
            g255 = g255 + jnp.dot(
                onehot,
                x_s,
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            off += n_s

        # Select the winning anchor's (5+C) lane group with static slices.
        # Disjoint 0/1 f32 masks (exact: 1*x == x, sums have one nonzero
        # term); boolean minor-dim inserts are unsupported in Mosaic.
        g = jnp.zeros((k, d), jnp.float32)
        for ai in range(na):
            hit = (a_f == float(ai)).astype(jnp.float32)[:, None]
            g = g + hit * g255[:, ai * d : (ai + 1) * d]

        # Identical float ops, in identical order, to the XLA late decode.
        xy = jax.nn.sigmoid(g[:, 0:2])
        wh = jnp.exp(g[:, 2:4])
        grid = jnp.stack([gx, gy], axis=-1)
        anch = jnp.stack([aw, ah], axis=-1)
        center = (xy + grid) * stride_v[:, None]
        half = 0.5 * (wh * anch)
        ob_ref[gi] = jnp.concatenate([center - half, center + half], axis=-1)
        obj = jax.nn.sigmoid(g[:, 4:5])
        pairs = obj * jax.nn.sigmoid(g[:, 5:d])
        if not extract_m:
            op_ref[gi] = pairs
            return
        m = extract_m
        if topm_variant == "rank":
            v_m, i_m = _extract_top_m_rank(pairs, m)
        else:
            v_m, i_m = _extract_top_m(pairs, m)
        vm_ref[gi] = v_m
        im_ref[gi] = i_m

        # Pigeonhole repair set, selected in-kernel (the XLA equivalents —
        # a 400-wide top-k plus three small gathers — cost ~1.3 ms/batch128
        # on the serial critical path).  The hot boxes are the top-hot_j
        # m-th-ranked values; selection is RANK-based, not an extraction
        # loop: hot_j sequential argmax-extract steps measured 0.73 ms of
        # pure serial latency at batch 128, while the all-pairs rank — one
        # MXU transpose + a (k, k) compare + a lane reduction — is exactly
        # order-identical (descending value, lowest index first on ties)
        # and fully parallel.
        ninth = v_m[:, m - 1 : m]  # (k, 1)
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        # MXU transpose: (k,1) contracted with I_k over sublanes -> (1,k).
        # HIGHEST keeps v bit-exact (1.0 * x products, one term per sum).
        ninth_t = jax.lax.dot_general(
            ninth,
            (iota_a == iota_b).astype(jnp.float32),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (1, k)
        beats = (ninth_t > ninth) | (
            (ninth_t == ninth) & (iota_b < iota_a)
        )  # [i, j]: box j outranks box i
        rank = jnp.sum(
            beats.astype(jnp.float32), axis=1, keepdims=True
        )  # (k, 1) exact small-int counts
        iota_j_l = jax.lax.broadcasted_iota(jnp.int32, (k, hot_j), 1)
        oh_t = (iota_j_l.astype(jnp.float32) == rank).astype(
            jnp.float32
        )  # (k, hot_j) one-hot columns in rank order
        contract0 = (((0,), (0,)), ((), ()))
        hot_idx_l = jax.lax.dot_general(
            jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0).astype(jnp.float32),
            oh_t,
            contract0,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (1, hot_j) selected box ids (exact ints < k)
        hot_vals = jax.lax.dot_general(
            oh_t,
            pairs,
            contract0,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (hot_j, C) — exact 1.0 * f32 products
        hot_cls = jax.lax.dot_general(
            oh_t,
            i_m[:, : m - 1].astype(jnp.float32),
            contract0,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (hot_j, m-1) — exact small ints
        iota_c2 = jax.lax.broadcasted_iota(jnp.int32, (hot_j, c), 1)
        dup = iota_c2 < 0
        for t in range(m - 1):
            dup = dup | (iota_c2 == hot_cls[:, t : t + 1].astype(jnp.int32))
        hf_ref[gi] = jnp.where(dup, -1.0, hot_vals)
        hi_ref[gi] = hot_idx_l.astype(jnp.int32)  # (1, hot_j)

    return kernel


def _finalize_kernel(g, k, m, c, j, topk):
    """Map merged-ranking winners back to (class id, candidate box).

    The XLA equivalents — three small ``take_along_axis`` gathers on the
    serial tail — cost ~1.2 ms/batch-128 on v5e; here each gather is an
    exact one-hot contraction on the otherwise-idle MXU.  Each grid step
    processes a GROUP of ``g`` images: the per-step fixed cost (DMA
    latency on six tiny buffers + pipeline overhead) dominated the
    per-image grid (~9 us/image measured, vs ~100k flops of real work).

    Layout rule (measured, docs/perf_notes.md): every per-candidate
    intermediate lives as a (topk, 1) COLUMN.  ``q`` arrives lane-major
    (1, topk); 1-D math on it makes each later ``[:, None]`` a
    lane->sublane relayout, which Mosaic serializes.  One exact MXU
    transpose at entry (contract identity over the lane dim) puts q in
    column form; everything downstream is 2-D column/lane-broadcast math
    and the one-hot matmuls consume the columns directly.
    """
    width = k * (m - 1)

    def kernel(im_ref, hi_ref, q_ref, bk_ref, cls_ref, cb_ref):
        eye_t = (
            jax.lax.broadcasted_iota(jnp.int32, (topk, topk), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (topk, topk), 1)
        ).astype(jnp.float32)
        for gi in range(g):
            # (1, topk) lane-major -> (topk, 1) column via one MXU
            # transpose (exact: 1.0 * int-valued f32 products).
            q_f = jax.lax.dot_general(
                eye_t,
                q_ref[gi].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (topk, 1)
            in_cand = (q_f < float(width)).astype(jnp.float32)  # (topk, 1)

            # Candidate entries: box = q // (m-1), class = i_m[box, q % (m-1)].
            box1_f, r_f = _exact_divmod(
                jnp.minimum(q_f, float(width - 1)), m - 1
            )
            # Repair entries: e = q - width; box = hot_idx[e // C], cls = e % C.
            e_f = jnp.maximum(q_f - float(width), 0.0)
            hrow_f, cls2 = _exact_divmod(e_f, c)
            iota_j = jax.lax.broadcasted_iota(jnp.int32, (topk, j), 1)
            oh_hot = (iota_j == hrow_f.astype(jnp.int32)).astype(jnp.float32)
            # Box ids reach k-1 >= 256 (not bf16-exact): gather the low and
            # high halves separately — both < 256, each bf16-exact.
            hi_f = hi_ref[gi].astype(jnp.float32)  # (1, j)
            hi_hi, hi_lo = _exact_divmod(hi_f, 128)
            box2 = jax.lax.dot_general(
                oh_hot,
                jnp.concatenate([hi_lo, hi_hi], axis=0).astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (topk, 2): [low, high]
            box2 = box2[:, 0:1] + 128.0 * box2[:, 1:2]  # (topk, 1)

            # ONE one-hot + ONE matmul for classes AND boxes: candidate
            # entries have box_sel == box1, so their class rows gather
            # correctly by box_sel; repair entries take the arithmetic
            # cls2 and ignore the gathered class columns.  (Materializing
            # a (topk, k) one-hot costs more than every matmul here, so
            # build exactly one.)
            box_sel = in_cand * box1_f + (1.0 - in_cand) * box2  # (topk, 1)
            iota_k = jax.lax.broadcasted_iota(jnp.int32, (topk, k), 1)
            oh_sel = (iota_k == box_sel.astype(jnp.int32)).astype(jnp.float32)
            payload = jnp.concatenate(
                [im_ref[gi, :, : m - 1].astype(jnp.float32), bk_ref[gi]],
                axis=-1,
            )  # (k, m-1+4): class-id columns | box coords
            gath = jax.lax.dot_general(
                oh_sel,
                payload,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (topk, m-1+4) — exact 1.0 * f32 products
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (topk, m - 1), 1)
            cls1 = jnp.sum(
                jnp.where(
                    iota_r == r_f.astype(jnp.int32), gath[:, : m - 1], 0.0
                ),
                axis=1,
                keepdims=True,
            )  # exact: exactly one nonzero term per row
            cls_ref[gi] = in_cand * cls1 + (1.0 - in_cand) * cls2  # (topk, 1)
            cb_ref[gi] = gath[:, m - 1 :]

    return kernel


@functools.partial(jax.jit, static_argnames=("num_classes", "interpret"))
def finalize_candidates(
    i_m: jnp.ndarray,
    hot_idx: jnp.ndarray,
    q: jnp.ndarray,
    boxes_k: jnp.ndarray,
    num_classes: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cls_idx (B, topk) f32, cand_boxes (B, topk, 4) f32) for the merged
    ranking's winners ``q`` — see ``_finalize_kernel``."""
    b, k, m = i_m.shape
    j = hot_idx.shape[-1]
    topk = q.shape[-1]
    g = _group_size(b)
    cls_idx, cand_boxes = pl.pallas_call(
        _finalize_kernel(g, k, m, num_classes, j, topk),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, k, m), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, j), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, topk), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, 4), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((g, topk, 1), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, topk, 4), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, topk, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, topk, 4), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(i_m, hot_idx, q.reshape(b, 1, topk), boxes_k)
    return cls_idx[:, :, 0], cand_boxes


def _score_kernel(g, meta, num_pred, conv_dims=None):
    """Anchor scores straight from the cell-layout head tensors.

    score[cell, a] = sigmoid(obj_a) * sigmoid(max_c cls_a) — one read of
    the head output instead of the XLA reduce/slice/concat chain that
    re-reads it several times (~2 ms/batch-128 on v5e).  Each grid step
    processes a group of ``g`` images (see ``_group_size``) but loops
    over them one at a time: full-block f32 intermediates at g=4 cost
    ~60 MiB of scoped VMEM, per-image ones stay under 1 MiB.

    conv_dims: if set, blocks arrive as (H, W, na*num_pred) (the output
    conv's native layout); ``meta`` must then be the PADDED meta and the
    padded (H*Wp, lanes) cell view is taken in-kernel (``_cells_view``).
    Pad rows are whole lanes of ``_CONV_PAD`` so their score is exactly
    0.0 (sigmoid underflow) — strictly below every real row's score.
    """

    def kernel(*refs):
        raw_refs = refs[: len(meta)]
        out_refs = refs[len(meta) :]
        for gi in range(g):
            for sidx, (rref, oref, (cells, _, _, anchors)) in enumerate(
                zip(raw_refs, out_refs, meta)
            ):
                x = rref[gi]
                if conv_dims is not None:
                    x = _cells_view(x, conv_dims[sidx])
                cols = []
                for a in range(len(anchors)):
                    o = a * num_pred
                    obj = x[:, o + 4 : o + 5].astype(jnp.float32)
                    clsm = jnp.max(
                        x[:, o + 5 : o + num_pred],
                        axis=-1,
                        keepdims=True,
                    ).astype(jnp.float32)
                    cols.append(jax.nn.sigmoid(obj) * jax.nn.sigmoid(clsm))
                oref[gi] = jnp.concatenate(cols, axis=-1)  # (cells, na)

    return kernel


def _score_kernel_masked(g, meta, num_pred, conv_dims=None):
    """Lane-masked formulation of ``_score_kernel``.

    The slice variant reads per-anchor groups at lane offsets
    0/85/170 — misaligned to the 128-lane vreg boundary, which Mosaic
    lowers to lane-rotate/mask sequences (profiled at ~1.09 ms/batch-128
    vs a ~0.3 ms bandwidth floor — docs/perf_notes.md).  Here every
    reduction runs FULL-WIDTH over the (cells, na*num_pred) block with a
    compile-time iota lane mask selecting each anchor's cls (or obj)
    lanes; masked-out lanes carry -inf so the max is bit-identical to the
    sliced max in the same dtype.  Whether Mosaic codegen actually beats
    the slicing is an on-chip question — tools/trace_tail.py --group
    scores measures both; flip with VIDDET_SCORE_KERNEL=masked once
    proven.
    """

    def kernel(*refs):
        raw_refs = refs[: len(meta)]
        out_refs = refs[len(meta) :]
        for gi in range(g):
            for sidx, (rref, oref, (cells, _, _, anchors)) in enumerate(
                zip(raw_refs, out_refs, meta)
            ):
                x = rref[gi]  # (cells, na*num_pred), raw dtype
                if conv_dims is not None:
                    x = _cells_view(x, conv_dims[sidx])
                neg = jnp.asarray(-jnp.inf, x.dtype)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, x.shape, dimension=1
                )
                cols = []
                for a in range(len(anchors)):
                    o = a * num_pred
                    obj = jnp.max(
                        jnp.where(lane == o + 4, x, neg),
                        axis=-1, keepdims=True,
                    ).astype(jnp.float32)
                    clsm = jnp.max(
                        jnp.where(
                            (lane >= o + 5) & (lane < o + num_pred), x, neg
                        ),
                        axis=-1, keepdims=True,
                    ).astype(jnp.float32)
                    cols.append(jax.nn.sigmoid(obj) * jax.nn.sigmoid(clsm))
                oref[gi] = jnp.concatenate(cols, axis=-1)  # (cells, na)

    return kernel


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "variant"))
def anchor_scores(
    raws: Sequence[jnp.ndarray],
    meta,
    interpret: bool = False,
    variant: str = "slice",
) -> jnp.ndarray:
    """(B, N) float32 stage-1 anchor scores from cell-layout head tensors.

    Bit-identical to ``sigmoid(obj) * sigmoid(max cls)`` computed via the
    XLA reduce/concat chain (same ops on the same upcast values).

    ``variant``: "slice" (production) or "masked" (full-width lane-masked
    reductions — see ``_score_kernel_masked``); both are exact.
    """
    if variant not in ("slice", "masked"):
        # a typo'd VIDDET_SCORE_KERNEL silently measuring the wrong kernel
        # would corrupt the flip decision — fail loudly
        raise ValueError(
            f"anchor_scores variant {variant!r} is not 'slice' or 'masked'"
        )
    b = raws[0].shape[0]
    na = len(meta[0][3])
    num_pred = raws[0].shape[-1] // na
    # 4-D inputs = the output convs' native (B, H, W, na*num_pred) layout
    # (VIDDET_TAIL_INPUT=conv): block per image, padded cell view taken
    # in-kernel (``_cells_view``), which lets XLA drop the (B, h*w, lanes)
    # relayout copy of the head tensors (~0.46 GB/batch-128 of HBM
    # traffic) from the program.  Scores then come back in the PADDED
    # (scale, gy, gx<Wp, anchor) index space — gather_decode_pairs on
    # conv inputs derives the same padded meta, and pad rows score
    # exactly 0.0, so downstream selection is unchanged (see _CONV_PAD).
    conv_input = raws[0].ndim == 4
    if conv_input:
        conv_dims, meta_k = _conv_dims([r.shape for r in raws], meta)
        in_specs = [
            pl.BlockSpec(
                (1, h, w, na * num_pred),
                lambda ii: (ii, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for h, w, _wp in conv_dims
        ]
    else:
        conv_dims, meta_k = None, meta
        in_specs = [
            pl.BlockSpec(
                (1, m[0], na * num_pred),
                lambda ii: (ii, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for m in meta
        ]
    # g=1 (measured): 4-wide grouping left this kernel's time unchanged
    # (1.09 -> 1.11 ms/batch-128) while the (g, cells, na) f32 output
    # windows pad na -> 128 lanes (43x useful bytes) — not worth it.
    g = 1
    make_kernel = (
        _score_kernel_masked if variant == "masked" else _score_kernel
    )
    outs = pl.pallas_call(
        make_kernel(g, meta_k, num_pred, conv_dims),
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((g, m[0], na), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM)
            for m in meta_k
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, m[0], na), jnp.float32) for m in meta_k
        ),
        cost_estimate=pl.CostEstimate(
            flops=sum(r.size for r in raws),
            bytes_accessed=sum(r.size * r.dtype.itemsize for r in raws),
            transcendentals=2 * b * na * sum(m[0] for m in meta),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*raws)
    return jnp.concatenate([o.reshape(b, -1) for o in outs], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("meta", "extract_m", "hot_j", "interpret", "topm_variant"),
)
def gather_decode_pairs(
    raws: Sequence[jnp.ndarray],
    a_idx: jnp.ndarray,
    meta: Tuple[Tuple[int, int, int, Tuple[Tuple[float, float], ...]], ...],
    extract_m: int = 0,
    hot_j: int = 0,
    interpret: bool = False,
    topm_variant: str = "extract",
):
    """Fused per-scale gather -> late decode -> (boxes, pair scores).

    Args:
      raws: per-scale raw head tensors, each either CELL layout
        (B, h*w, na*(5+C)) — exactly ``conv_out.reshape(B, h*w, -1)`` — or
        the output conv's native 4-D layout (B, h, w, na*(5+C))
        (VIDDET_TAIL_INPUT=conv; bit-identical outputs, saves the relayout
        copy).  Any float dtype (bf16 on the hot path), deepest scale
        first.
      a_idx: (B, K) int32 stage-1 winner indices into the concatenated
        (scale, row, col, anchor) ordering, deepest scale first.
      meta: static per-scale config ``(cells, width, stride, anchors)``
        where ``anchors`` is a tuple of (w, h) floats.

    Returns:
      With ``extract_m`` == 0: (boxes (B,K,4) f32, pairs (B,K,C) f32).
      With ``extract_m``  > 0: (boxes, v_m (B,K,m) f32, i_m (B,K,m) i32,
      hot_flat (B,J,C) f32, hot_idx (B,1,J) i32) where J = hot_j — the
      hierarchical stage-2 inputs (see ``_stage2_hier_and_nms``).
    """
    if topm_variant not in ("extract", "rank"):
        # a typo'd VIDDET_TOPM_KERNEL silently measuring the wrong kernel
        # would corrupt the flip decision — fail loudly
        raise ValueError(
            f"gather_decode_pairs topm_variant {topm_variant!r} is not"
            " 'extract' or 'rank'"
        )
    b = raws[0].shape[0]
    na = len(meta[0][3])
    c = raws[0].shape[-1] // na - 5
    k = a_idx.shape[-1]
    # 4-D inputs: native conv layout, padded cell view in-kernel;
    # ``a_idx`` must then be indices into the PADDED flattening — i.e.
    # produced by the stage-1 top-k over ``anchor_scores`` of the same
    # conv-layout tensors (see ``anchor_scores`` — VIDDET_TAIL_INPUT=conv).
    conv_input = raws[0].ndim == 4
    # g=1 (measured): grouping grid steps 4-wide REGRESSED this kernel
    # 1.95 -> 2.30 ms/batch-128 — whole-image blocks already pipeline
    # their big DMAs, and wider blocks only add VMEM pressure.  Grouping
    # pays off only for tiny-buffer kernels (see finalize_candidates).
    g = 1
    if conv_input:
        conv_dims, meta_k = _conv_dims([r.shape for r in raws], meta)
        in_specs = [
            pl.BlockSpec(
                (g, h, w, na * (5 + c)),
                lambda ii: (ii, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for h, w, _wp in conv_dims
        ]
    else:
        conv_dims, meta_k = None, meta
        in_specs = [
            pl.BlockSpec(
                (g, m[0], na * (5 + c)), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM
            )
            for m in meta
        ]
    kernel = _make_kernel(
        g, meta_k, k, c, extract_m, hot_j, topm_variant, conv_dims
    )
    in_specs += [
        pl.BlockSpec((g, 1, k), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM)
    ]
    out_specs = [
        pl.BlockSpec((g, k, 4), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, k, 4), jnp.float32),
    ]
    if extract_m:
        out_specs += [
            pl.BlockSpec((g, k, extract_m), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, extract_m), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, hot_j, c), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, hot_j), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b, k, extract_m), jnp.float32),
            jax.ShapeDtypeStruct((b, k, extract_m), jnp.int32),
            jax.ShapeDtypeStruct((b, hot_j, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, hot_j), jnp.int32),
        ]
    else:
        out_specs += [
            pl.BlockSpec((g, k, c), lambda ii: (ii, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((b, k, c), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * sum(m[0] for m in meta) * na * (5 + c),
            bytes_accessed=sum(r.size * r.dtype.itemsize for r in raws)
            + b * k * (4 + c) * 4,
            transcendentals=b * k * (c + 3),
        ),
        # Explicit VMEM budget: hosts running with the default 16 MiB
        # scoped-vmem limit (no LIBTPU_INIT_ARGS tuning) must still compile.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*raws, a_idx.reshape(b, 1, k))
    return outs
