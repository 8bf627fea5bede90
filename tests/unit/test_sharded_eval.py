"""Sharded evaluation == unsharded evaluation (multi-host eval merge).

VERDICT r4 item 4: every process evaluates a disjoint strided shard and
metric states are merged afterwards (viddet_tpu/eval/distributed.py).
These tests pin the invariant offline, without a multi-process backend:
splitting any image stream into strided shards, accumulating per-shard
metrics, and merging their ``state_dict()``s must reproduce the
unsharded numbers exactly — including non-divisible tails.
"""

import numpy as np
import pytest

from viddet_tpu.eval.distributed import merge_metric_states
from viddet_tpu.eval.voc_map import VOCMApMetric


def random_scene(rng, classes=3):
    """One image: separated GTs + jittered/far detections (see
    test_metric_properties.py for why separation makes properties exact;
    here we only need determinism, not separation)."""
    g = int(rng.integers(1, 5))
    gt = rng.uniform(0, 400, (g, 2))
    wh = rng.uniform(20, 80, (g, 2))
    gt_boxes = np.concatenate([gt, gt + wh], axis=1).astype(np.float32)
    gt_ids = rng.integers(0, classes, g).astype(np.float32)
    diff = (rng.random(g) < 0.2).astype(np.float32)
    d = int(rng.integers(1, 7))
    src = rng.integers(0, g, d)
    db = gt_boxes[src] + rng.uniform(-15, 15, (d, 4)).astype(np.float32)
    ds_ = rng.integers(0, classes, d).astype(np.float32)
    sc = rng.random(d).astype(np.float32)
    return gt_boxes, gt_ids, diff, db, ds_, sc


def shard_indices(n, count):
    return [list(range(i, n, count)) for i in range(count)]


@pytest.mark.parametrize("count", [2, 3])
def test_voc_metric_shard_merge_exact(count):
    rng = np.random.default_rng(7)
    scenes = [random_scene(rng) for _ in range(11)]  # 11 % count != 0

    def update(metric, s):
        gb, gi, gd, db, di, sc = s
        metric.update(db[None], di[None], sc[None], gb[None], gi[None], gd[None])

    full = VOCMApMetric(class_names=["a", "b", "c"])
    for s in scenes:
        update(full, s)

    shards = []
    for idxs in shard_indices(len(scenes), count):
        m = VOCMApMetric(class_names=["a", "b", "c"])
        for i in idxs:
            update(m, scenes[i])
        shards.append(m.state_dict())

    merged = merge_metric_states(
        VOCMApMetric(class_names=["a", "b", "c"]), shards
    )
    names_f, vals_f = full.get()
    names_m, vals_m = merged.get()
    assert names_f == names_m
    np.testing.assert_array_equal(np.asarray(vals_f), np.asarray(vals_m))


class _BoxDataset:
    """Minimal dataset surface for COCODetectionMetric."""

    def __init__(self, labels):
        self.classes = ("a", "b", "c")
        self._labels = labels

    def label(self, idx):
        return self._labels[idx]

    def image_id(self, idx):
        return 1000 + idx


def test_coco_metric_shard_merge_exact():
    from viddet_tpu.eval.coco_eval import COCODetectionMetric

    rng = np.random.default_rng(3)
    scenes = [random_scene(rng) for _ in range(10)]
    labels = [
        np.concatenate(
            [s[0], s[1][:, None], s[2][:, None]], axis=1
        ).astype(np.float32)
        for s in scenes
    ]
    ds = _BoxDataset(labels)

    def update(metric, i):
        _, _, _, db, di, sc = scenes[i]
        metric.update_with_indices(db[None], di[None], sc[None], [i])

    full = COCODetectionMetric(ds)
    for i in range(len(scenes)):
        update(full, i)

    shards = []
    for idxs in shard_indices(len(scenes), 3):  # 10 -> 4,3,3
        m = COCODetectionMetric(ds)
        for i in idxs:
            update(m, i)
        shards.append(m.state_dict())
    merged = merge_metric_states(COCODetectionMetric(ds), shards)

    names_f, vals_f = full.get()
    names_m, vals_m = merged.get()
    assert names_f == names_m
    np.testing.assert_array_equal(np.asarray(vals_f), np.asarray(vals_m))


def test_coco_merge_rejects_duplicate_images():
    from viddet_tpu.eval.coco_eval import COCODetectionMetric

    rng = np.random.default_rng(5)
    s = random_scene(rng)
    label = np.concatenate(
        [s[0], s[1][:, None], s[2][:, None]], axis=1
    ).astype(np.float32)
    ds = _BoxDataset([label])
    a = COCODetectionMetric(ds)
    a.update_with_indices(s[3][None], s[4][None], s[5][None], [0])
    b = COCODetectionMetric(ds)
    b.update_with_indices(s[3][None], s[4][None], s[5][None], [0])
    with pytest.raises(ValueError, match="duplicate image ids"):
        a.merge_state(b.state_dict())


class _VidDataset:
    """Minimal VID dataset surface: 1 snippet of n frames, 1 slow track."""

    def __init__(self, n=6):
        self.classes = ("car",)
        self._labels = [
            np.asarray([[5.0 + t, 10, 35 + t, 40, 0, 0, 0]], np.float32)
            for t in range(n)
        ]

    def __len__(self):
        return len(self._labels)

    def label(self, idx):
        return self._labels[idx][:, :6]

    def snippet_and_position(self, idx):
        return 0, idx

    def snippet_labels(self, _snippet):
        return self._labels


def test_vid_metric_shard_merge_exact():
    from viddet_tpu.eval.vid_motion_iou import VIDDetectionMetric

    ds = _VidDataset(n=7)  # 7 % 2 != 0
    rng = np.random.default_rng(11)
    # rng draws must match between the full and sharded passes
    draws = {i: rng.uniform(-3, 3, (1, 4)).astype(np.float32) for i in range(7)}

    def update_fixed(metric, i):
        gt = ds.label(i)
        db = gt[:, :4] + draws[i]
        metric.update_with_indices(
            db[None], np.zeros((1, 1), np.float32),
            np.asarray([[0.9]], np.float32), [i],
        )

    full = VIDDetectionMetric(ds)
    for i in range(7):
        update_fixed(full, i)

    shards = []
    for idxs in shard_indices(7, 2):
        m = VIDDetectionMetric(ds)
        for i in idxs:
            update_fixed(m, i)
        shards.append(m.state_dict())
    merged = merge_metric_states(VIDDetectionMetric(ds), shards)

    names_f, vals_f = full.get()
    names_m, vals_m = merged.get()
    assert names_f == names_m
    np.testing.assert_array_equal(np.asarray(vals_f), np.asarray(vals_m))


def test_gather_states_single_process_identity():
    from viddet_tpu.eval.distributed import gather_states

    state = {"records": {0: [(0.5, 1, 0)]}, "npos": {0: 1}}
    assert gather_states(state) == [state]
