"""Two-stage logits NMS and the Pallas greedy kernel vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.ops.nms import (
    multiclass_nms,
    multiclass_nms_from_logits,
    multiclass_nms_late_decode,
    nms_keep_mask,
)
from viddet_tpu.ops.nms_pallas import nms_keep_mask_pallas


def random_candidates(rng, b, n, c):
    pts = rng.uniform(0, 300, size=(b, n, 2, 2)).astype(np.float32)
    boxes = np.concatenate([pts.min(2), pts.max(2)], axis=-1)
    obj_logits = rng.normal(size=(b, n, 1)).astype(np.float32)
    cls_logits = rng.normal(size=(b, n, c)).astype(np.float32) * 2.0
    return jnp.asarray(boxes), jnp.asarray(obj_logits), jnp.asarray(cls_logits)


def test_two_stage_matches_dense_oracle():
    rng = np.random.default_rng(0)
    boxes, obj_logits, cls_logits = random_candidates(rng, 2, 300, 7)
    scores = jax.nn.sigmoid(obj_logits) * jax.nn.sigmoid(cls_logits)
    kw = dict(iou_thresh=0.5, valid_thresh=0.01, topk=64, post_nms=32)
    want = multiclass_nms(boxes, scores, **kw)
    got = multiclass_nms_from_logits(boxes, obj_logits, cls_logits, backend="xla", **kw)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_pallas_kernel_matches_jnp_greedy_interpret():
    rng = np.random.default_rng(1)
    b, k = 3, 64
    pts = rng.uniform(0, 100, size=(b, k, 2, 2)).astype(np.float32)
    boxes = np.concatenate([pts.min(2), pts.max(2)], axis=-1)
    valid = rng.uniform(size=(b, k)) > 0.2
    got = np.asarray(
        nms_keep_mask_pallas(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True
        )
    )
    for i in range(b):
        want = np.asarray(
            nms_keep_mask(jnp.asarray(boxes[i]), None, jnp.asarray(valid[i]), 0.5)
        )
        np.testing.assert_array_equal(got[i] > 0.5, want)


def test_two_stage_pallas_interpret_matches_xla():
    rng = np.random.default_rng(2)
    boxes, obj_logits, cls_logits = random_candidates(rng, 2, 200, 5)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=48, post_nms=24)
    a = multiclass_nms_from_logits(boxes, obj_logits, cls_logits, backend="xla", **kw)
    b_ = multiclass_nms_from_logits(
        boxes, obj_logits, cls_logits, backend="pallas_interpret", **kw
    )
    for x, y in zip(a, b_):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_late_decode_bitwise_matches_decode_then_nms():
    """Top-k-then-decode must equal decode-then-top-k EXACTLY (not approximately):
    the inference hot path relies on the two orderings performing identical
    per-anchor float ops, so golden fixtures stay valid."""
    rng = np.random.default_rng(7)
    b, n, c = 3, 500, 11
    raw_xy = jnp.asarray(rng.normal(size=(b, n, 2)).astype(np.float32))
    raw_wh = jnp.asarray(rng.normal(size=(b, n, 2)).astype(np.float32) * 0.5)
    obj_logits = jnp.asarray(rng.normal(size=(b, n, 1)).astype(np.float32))
    cls_logits = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32) * 2.0)
    grid_xy = jnp.asarray(rng.integers(0, 13, size=(n, 2)).astype(np.float32))
    anchor_wh = jnp.asarray(rng.uniform(10, 100, size=(n, 2)).astype(np.float32))
    stride_n = jnp.full((n, 1), 32.0, jnp.float32)

    # Reference: decode every anchor exactly as the head does, then NMS.
    center = (jax.nn.sigmoid(raw_xy) + grid_xy) * stride_n
    wh = jnp.exp(raw_wh) * anchor_wh
    half = 0.5 * wh
    boxes = jnp.concatenate([center - half, center + half], axis=-1)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=64, post_nms=32)
    want = multiclass_nms_from_logits(boxes, obj_logits, cls_logits, backend="xla", **kw)

    cls_max = jnp.max(cls_logits, axis=-1)
    got = multiclass_nms_late_decode(
        raw_xy, raw_wh, obj_logits, cls_logits, cls_max,
        grid_xy, anchor_wh, stride_n, backend="xla", **kw
    )
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_two_stage_bf16_logits():
    rng = np.random.default_rng(3)
    boxes, obj_logits, cls_logits = random_candidates(rng, 1, 100, 4)
    got = multiclass_nms_from_logits(
        boxes,
        obj_logits.astype(jnp.bfloat16),
        cls_logits.astype(jnp.bfloat16),
        topk=32,
        post_nms=16,
        backend="xla",
    )
    ids, scores, out_boxes = (np.asarray(g) for g in got)
    assert ids.shape == (1, 16) and out_boxes.shape == (1, 16, 4)
    kept = scores[0] >= 0
    assert kept.any()
    assert np.all(np.diff(scores[0][kept]) <= 1e-6)


def test_pallas_kernel_rank_grouping_matches_oracle():
    """ranks_per_step grouping must not change the greedy scan: sweep
    explicit r values and odd K (prime, non-multiple-of-8)."""
    rng = np.random.default_rng(7)
    for k, rs in ((64, (1, 4, 8, 16)), (37, (1,)), (50, (2, 5)), (40, (8,))):
        pts = rng.uniform(0, 60, size=(2, k, 2, 2)).astype(np.float32)
        boxes = np.concatenate([pts.min(2), pts.max(2)], axis=-1)
        valid = rng.uniform(size=(2, k)) > 0.2
        want = np.stack(
            [
                np.asarray(
                    nms_keep_mask(
                        jnp.asarray(boxes[i]), None, jnp.asarray(valid[i]), 0.5
                    )
                )
                for i in range(2)
            ]
        )
        for r in rs:
            got = np.asarray(
                nms_keep_mask_pallas(
                    jnp.asarray(boxes),
                    jnp.asarray(valid),
                    0.5,
                    interpret=True,
                    ranks_per_step=r,
                )
            )
            np.testing.assert_array_equal(got > 0.5, want, err_msg=f"k={k} r={r}")


def test_compact_kernel_matches_oracle_edge_cases():
    """compact_and_pad_pallas == _compact_and_pad bit-for-bit.

    Covers: more kept than post_nms (overflow dropped), zero kept,
    all kept, and a batch size whose only group divisor is g=1.
    """
    from viddet_tpu.ops.nms import _compact_and_pad
    from viddet_tpu.ops.nms_pallas import compact_and_pad_pallas

    rng = np.random.default_rng(7)
    for b, k, post in [(5, 96, 24), (8, 128, 100), (7, 64, 8)]:
        pts = rng.uniform(0, 200, size=(b, k, 2, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([pts.min(2), pts.max(2)], axis=-1))
        scores = jnp.asarray(
            -np.sort(-rng.uniform(size=(b, k)).astype(np.float32), axis=1)
        )
        cls_idx = jnp.asarray(
            rng.integers(0, 20, size=(b, k)).astype(np.float32)
        )
        keep = rng.uniform(size=(b, k)) > 0.4
        keep[0] = True   # all kept: overflow past post_nms dropped
        keep[1] = False  # none kept: all padding
        keep = jnp.asarray(keep)

        want = jax.vmap(_compact_and_pad, in_axes=(0, 0, 0, 0, None))(
            boxes, scores, cls_idx, keep, post
        )
        got = compact_and_pad_pallas(
            keep.astype(jnp.float32), scores, cls_idx, boxes, post,
            interpret=True,
        )
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_scan_kernel_rejects_non_divisor_ranks_per_step():
    """A floored grid would silently skip the last K % r suppression ranks."""
    boxes = jnp.zeros((2, 10, 4), jnp.float32)
    valid = jnp.ones((2, 10), bool)
    with pytest.raises(ValueError, match="must divide"):
        nms_keep_mask_pallas(boxes, valid, 0.45, interpret=True, ranks_per_step=4)


def test_pair_top_k_det_matches_lax_top_k():
    """_pair_top_k_det == lax.top_k bitwise, INCLUDING tie order.

    Inputs cover the real stage-2 score shapes: random sigmoid-like
    values, heavy exact ties (4 quantization levels — the bf16-collision
    regime the deterministic variant exists for), and rows carrying the
    hierarchical path's -1.0 dedup sentinels.
    """
    from viddet_tpu.ops.nms import _pair_top_k_det

    rng = np.random.default_rng(11)
    n = 1000
    random_s = rng.uniform(0, 1, size=(3, n)).astype(np.float32)
    tied = (rng.integers(0, 4, size=(3, n)) / 4.0).astype(np.float32)
    with_sentinels = random_s.copy()
    with_sentinels[:, ::7] = -1.0
    for arr in (random_s, tied, with_sentinels):
        for k in (1, 17, 400):
            want_v, want_i = jax.lax.top_k(jnp.asarray(arr), k)
            got_v, got_i = _pair_top_k_det(jnp.asarray(arr), k, interpret=True)
            np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
            np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_two_stage_det_variant_matches_xla(monkeypatch):
    """End-to-end from-logits path under VIDDET_PAIR_TOPK=det: the
    deterministic ranking (threshold-select kernel + stable re-rank) must
    keep the pallas_interpret backend bit-identical to the XLA oracle.

    Static args differ from every other test's so the jit retraces and
    actually reads the monkeypatched env (trace-time knob)."""
    monkeypatch.setenv("VIDDET_PAIR_TOPK", "det")
    rng = np.random.default_rng(13)
    boxes, obj_logits, cls_logits = random_candidates(rng, 2, 200, 5)
    kw = dict(iou_thresh=0.45, valid_thresh=0.01, topk=52, post_nms=26)
    a = multiclass_nms_from_logits(boxes, obj_logits, cls_logits, backend="xla", **kw)
    b_ = multiclass_nms_from_logits(
        boxes, obj_logits, cls_logits, backend="pallas_interpret", **kw
    )
    for x, y in zip(a, b_):
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
