import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.ops import boxes as B


def np_iou(a, b):
    """Numpy oracle for pairwise IoU."""
    n, m = a.shape[0], b.shape[0]
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            x1 = max(a[i, 0], b[j, 0])
            y1 = max(a[i, 1], b[j, 1])
            x2 = min(a[i, 2], b[j, 2])
            y2 = min(a[i, 3], b[j, 3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            area_a = max(a[i, 2] - a[i, 0], 0) * max(a[i, 3] - a[i, 1], 0)
            area_b = max(b[j, 2] - b[j, 0], 0) * max(b[j, 3] - b[j, 1], 0)
            union = area_a + area_b - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_iou_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, size=(20, 2, 2))
    a = np.concatenate([pts.min(1), pts.max(1)], axis=-1)
    pts = rng.uniform(0, 100, size=(15, 2, 2))
    b = np.concatenate([pts.min(1), pts.max(1)], axis=-1)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), atol=1e-5)


def test_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    got = np.asarray(B.box_iou(a, b))
    np.testing.assert_allclose(got, [[1.0, 0.0]], atol=1e-6)


def test_iou_degenerate_boxes_zero():
    a = jnp.array([[-1.0, -1.0, -1.0, -1.0]])  # padding box
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert float(B.box_iou(a, b)[0, 0]) == 0.0


def test_iou_batched_broadcast():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 50, size=(4, 6, 2, 2))
    a = np.concatenate([pts.min(2), pts.max(2)], axis=-1)  # (4, 6, 4)
    pts = rng.uniform(0, 50, size=(4, 3, 2, 2))
    b = np.concatenate([pts.min(2), pts.max(2)], axis=-1)  # (4, 3, 4)
    got = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    assert got.shape == (4, 6, 3)
    for i in range(4):
        np.testing.assert_allclose(got[i], np_iou(a[i], b[i]), atol=1e-5)


def test_corner_center_roundtrip():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 100, size=(10, 2, 2))
    corner = jnp.asarray(np.concatenate([pts.min(1), pts.max(1)], axis=-1))
    back = B.center_to_corner(B.corner_to_center(corner))
    np.testing.assert_allclose(np.asarray(back), np.asarray(corner), atol=1e-5)


def test_clip_boxes():
    boxes = jnp.array([[-5.0, -5.0, 120.0, 50.0]])
    got = np.asarray(B.clip_boxes(boxes, 100.0, 110.0))
    np.testing.assert_allclose(got, [[0.0, 0.0, 110.0, 50.0]])
