import jax.numpy as jnp
import numpy as np

from viddet_tpu.ops.nms import multiclass_nms, nms_keep_mask


def greedy_nms_oracle(boxes, scores, valid, thresh):
    """Pure-python greedy NMS oracle (boxes pre-sorted by descending score)."""
    keep = []
    out = np.zeros(len(boxes), dtype=bool)
    for i in range(len(boxes)):
        if not valid[i]:
            continue
        suppressed = False
        for j in keep:
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            area_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (area_i + area_j - inter)
            if iou > thresh:
                suppressed = True
                break
        if not suppressed:
            keep.append(i)
            out[i] = True
    return out


def random_sorted_candidates(rng, n):
    pts = rng.uniform(0, 100, size=(n, 2, 2))
    boxes = np.concatenate([pts.min(1), pts.max(1)], axis=-1)
    scores = np.sort(rng.uniform(0, 1, size=n))[::-1].copy()
    return boxes, scores


def test_keep_mask_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        boxes, scores = random_sorted_candidates(rng, 64)
        valid = scores > 0.05
        got = np.asarray(
            nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
        )
        want = greedy_nms_oracle(boxes, scores, valid, 0.5)
        np.testing.assert_array_equal(got, want)


def test_keep_mask_against_cv2():
    cv2 = __import__("cv2")
    rng = np.random.default_rng(7)
    boxes, scores = random_sorted_candidates(rng, 80)
    valid = np.ones(80, dtype=bool)
    got = np.asarray(
        nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
    )
    xywh = boxes.copy()
    xywh[:, 2:] -= xywh[:, :2]
    kept = cv2.dnn.NMSBoxes(
        xywh.tolist(), scores.tolist(), score_threshold=0.0, nms_threshold=0.5
    )
    want = np.zeros(80, dtype=bool)
    want[np.asarray(kept).ravel()] = True
    np.testing.assert_array_equal(got, want)


def test_multiclass_nms_basic():
    # Two overlapping boxes of the same class -> keep higher score only;
    # same geometry in a different class -> kept (class-aware).
    boxes = jnp.array(
        [[[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]]]
    )
    scores = jnp.array([[[0.9, 0.0], [0.8, 0.7], [0.0, 0.6]]])  # (1, 3, 2)
    ids, out_scores, out_boxes = multiclass_nms(
        boxes, scores, iou_thresh=0.45, valid_thresh=0.01, topk=6, post_nms=6
    )
    ids, out_scores, out_boxes = map(np.asarray, (ids, out_scores, out_boxes))
    kept = [
        (int(i), float(s), b.tolist())
        for i, s, b in zip(ids[0], out_scores[0], out_boxes[0])
        if s >= 0
    ]
    # box0/cls0 (0.9) kept; box1/cls0 (0.8) suppressed by box0 (IoU≈0.73);
    # box1/cls1 (0.7) kept (different class); box2/cls1 (0.6) kept (disjoint).
    assert len(kept) == 3
    assert kept[0][0] == 0 and abs(kept[0][1] - 0.9) < 1e-6
    assert kept[1][0] == 1 and abs(kept[1][1] - 0.7) < 1e-6
    assert kept[2][0] == 1 and abs(kept[2][1] - 0.6) < 1e-6
    assert kept[1][2] == [1.0, 1.0, 10.0, 10.0]


def test_multiclass_nms_padding_and_shapes():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 100, size=(2, 50, 2, 2))
    boxes = jnp.asarray(np.concatenate([pts.min(2), pts.max(2)], axis=-1))
    scores = jnp.asarray(rng.uniform(0, 0.005, size=(2, 50, 4)))  # all < valid_thresh
    ids, s, bx = multiclass_nms(boxes, scores, topk=32, post_nms=10)
    assert ids.shape == (2, 10) and s.shape == (2, 10) and bx.shape == (2, 10, 4)
    assert np.all(np.asarray(ids) == -1)
    assert np.all(np.asarray(bx) == -1)


def test_multiclass_nms_score_ordering():
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 400, size=(1, 100, 2, 2))
    boxes = jnp.asarray(np.concatenate([pts.min(2), pts.max(2)], axis=-1))
    scores = jnp.asarray(rng.uniform(0, 1, size=(1, 100, 3)))
    ids, s, _ = multiclass_nms(boxes, scores, topk=100, post_nms=40)
    s = np.asarray(s[0])
    valid = s[s >= 0]
    assert np.all(np.diff(valid) <= 1e-7)  # descending
    # padding is contiguous at the tail
    first_pad = len(valid)
    assert np.all(s[first_pad:] == -1)
