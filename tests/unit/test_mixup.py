import numpy as np

from viddet_tpu.cli.train_yolov3 import mixup_batch


def test_mixup_blends_and_concats():
    rng = np.random.default_rng(0)
    b, m = 4, 3
    images = rng.uniform(0, 1, (b, 16, 16, 3)).astype(np.float32)
    boxes = rng.uniform(0, 16, (b, m, 4)).astype(np.float32)
    ids = rng.integers(0, 3, (b, m)).astype(np.int32)
    ids[:, -1] = -1  # padding row

    mixed, boxes2, ids2, w = mixup_batch(images, boxes, ids, rng)
    assert mixed.shape == images.shape
    assert boxes2.shape == (b, 2 * m, 4)
    assert ids2.shape == (b, 2 * m)
    assert w.shape == (b, 2 * m)
    # weights: lambda for the first half, 1-lambda for the second; padding 0
    assert np.all(w[ids2 < 0] == 0.0)
    valid_w = w[ids2 >= 0]
    assert np.all((valid_w > 0.0) & (valid_w <= 1.0))
    # per-image: lam + (1-lam) == 1 where both halves have valid boxes
    for i in range(b):
        first = w[i, :m][ids2[i, :m] >= 0]
        second = w[i, m:][ids2[i, m:] >= 0]
        if len(first) and len(second):
            np.testing.assert_allclose(first[0] + second[0], 1.0, atol=1e-6)
    # blended pixels stay within the convex hull of inputs
    assert mixed.min() >= images.min() - 1e-6
    assert mixed.max() <= images.max() + 1e-6
