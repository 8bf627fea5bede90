"""Loader behavior: padding, ordering, determinism, multi-scale buckets."""

import numpy as np

from viddet_tpu.data.loader import DetectionLoader, pad_label
from viddet_tpu.data.synthetic import SyntheticDetection
from viddet_tpu.data.transforms import TrainTransform, ValTransform


def test_pad_label():
    lab = np.array([[1, 2, 3, 4, 0, 0]], np.float32)
    out = pad_label(lab, 5)
    assert out.shape == (5, 6)
    assert (out[1:] == -1).all()
    empty = pad_label(np.zeros((0, 6), np.float32), 3)
    assert (empty == -1).all()


def test_eval_loader_covers_all_in_order():
    ds = SyntheticDetection(num_images=10, size=64, num_classes=2)
    loader = DetectionLoader(
        ds, ValTransform(size=(32, 32)), batch_size=4, train=False, num_workers=3
    )
    seen = []
    for images, boxes, ids, diff, affines, idxs in loader:
        assert images.shape[1:] == (32, 32, 3)
        seen.extend(idxs.tolist())
    assert seen == list(range(10))  # ordered, last partial batch included


def test_train_loader_deterministic_per_seed():
    ds = SyntheticDetection(num_images=8, size=64, num_classes=2)

    def collect(seed):
        loader = DetectionLoader(
            ds, TrainTransform(size=(32, 32)), batch_size=4, train=True,
            num_workers=2, seed=seed,
        )
        return [b[0].copy() for b in loader]

    a = collect(5)
    b = collect(5)
    c = collect(6)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_worker_exception_propagates():
    """A corrupt sample must raise in the consumer, not hang the loop."""
    import pytest

    class _BrokenDataset(SyntheticDetection):
        def __getitem__(self, idx):
            if idx == 5:
                raise OSError("corrupt image")
            return super().__getitem__(idx)

    ds = _BrokenDataset(num_images=10, size=64, num_classes=2)
    loader = DetectionLoader(
        ds, ValTransform(size=(32, 32)), batch_size=4, train=False, num_workers=3
    )
    with pytest.raises(RuntimeError, match="loader worker failed"):
        for _ in loader:
            pass


def test_early_close_stops_workers():
    """Breaking out of the loop must not leave workers blocked forever."""
    import threading

    ds = SyntheticDetection(num_images=64, size=64, num_classes=2)
    loader = DetectionLoader(
        ds, ValTransform(size=(32, 32)), batch_size=2, train=False, num_workers=4
    )
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()
    # stop event lets every worker exit its put loop promptly
    import time

    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_dropped_boxes_counted():
    """150-object label vs max_boxes=100: overflow is counted, not silent."""

    class _CrowdedDataset(SyntheticDetection):
        def __getitem__(self, idx):
            image, _ = super().__getitem__(idx)
            label = np.tile(
                np.array([[1, 1, 9, 9, 0, 0]], np.float32), (150, 1)
            )
            return image, label

    ds = _CrowdedDataset(num_images=4, size=64, num_classes=2)
    loader = DetectionLoader(
        ds, TrainTransform(size=(32, 32)), batch_size=2, train=True,
        num_workers=0, max_boxes=100, seed=0,
    )
    for _, boxes, *_ in loader:
        assert boxes.shape[1] == 100
    assert loader.dropped_boxes == 4 * 50


def test_multiscale_buckets_consistent_within_batch():
    ds = SyntheticDetection(num_images=24, size=64, num_classes=2)
    sizes = [(32, 32), (48, 48), (64, 64)]
    loader = DetectionLoader(
        ds, TrainTransform(size=(32, 32)), batch_size=4, train=True,
        sizes=sizes, size_interval=1, num_workers=3, seed=0,
    )
    shapes = set()
    for images, *_ in loader:
        assert images.shape[0] == 4
        assert (images.shape[1], images.shape[2]) in [tuple(s) for s in sizes]
        shapes.add(images.shape[1:3])
    assert len(shapes) >= 2  # multiple buckets actually used


def test_sharded_loaders_partition_the_epoch():
    """Two shards of one loader must draw the SAME global shuffle, cover
    disjoint sample sets, and step the same number of train batches (a
    divergent count would deadlock multi-host collectives)."""
    from viddet_tpu.data.loader import DetectionLoader
    from viddet_tpu.data.synthetic import SyntheticDetection
    from viddet_tpu.data.transforms import TrainTransform

    ds = SyntheticDetection(num_images=21, size=64, num_classes=4)
    tf = TrainTransform(size=(32, 32))

    def seen(shard):
        loader = DetectionLoader(
            ds, tf, batch_size=2, train=True, num_workers=0, seed=5,
            shard=shard,
        )
        idxs = []
        for batch in loader:
            idxs.extend(int(i) for i in batch[5])
        return len(loader), idxs

    n0, idx0 = seen((0, 2))
    n1, idx1 = seen((1, 2))
    assert n0 == n1 == (21 // 2) // 2
    assert not (set(idx0) & set(idx1))  # disjoint
    # same epoch seed on an unsharded loader covers a superset
    n_all, idx_all = seen(None)
    assert set(idx0) | set(idx1) <= set(idx_all)

    # eval shards: strided split covers every sample exactly once
    def eval_seen(shard):
        loader = DetectionLoader(
            ds, _EvalTF(), batch_size=4, train=False, num_workers=0,
            shard=shard,
        )
        return [int(i) for b in loader for i in b[5]]

    class _EvalTF:
        size = (32, 32)

        def __call__(self, image, label):
            import numpy as _np

            return _np.zeros((32, 32, 3), _np.float32), label, _np.array(
                [1.0, 1.0, 0.0, 0.0], _np.float32
            )

    e0, e1 = eval_seen((0, 2)), eval_seen((1, 2))
    assert sorted(e0 + e1) == list(range(21))
