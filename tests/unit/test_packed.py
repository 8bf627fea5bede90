import os

import cv2
import numpy as np

from viddet_tpu.data.packed import PackedDetection, pack_dataset, write_shard


class _TinyDiskDataset:
    classes = ("a", "b")
    wn_classes = ("n1", "n2")

    def __init__(self, root):
        self._root = root
        self._labels = [
            np.array([[1, 2, 30, 40, 0, 0]], np.float32),
            np.array([[5, 5, 20, 20, 1, 0], [0, 0, 10, 10, 0, 1]], np.float32),
            np.zeros((0, 6), np.float32),
        ]
        rng = np.random.default_rng(0)
        for i in range(3):
            img = rng.integers(0, 255, (40, 50, 3)).astype(np.uint8)
            cv2.imwrite(os.path.join(root, f"{i}.jpg"), img)

    def __len__(self):
        return 3

    def image_path(self, i):
        return os.path.join(self._root, f"{i}.jpg")

    def label(self, i):
        return self._labels[i]


def test_pack_and_read_roundtrip(tmp_path):
    src = _TinyDiskDataset(str(tmp_path))
    shards = pack_dataset(src, str(tmp_path / "packed"), shard_size=2)
    assert len(shards) == 2  # 3 records, shard size 2

    ds = PackedDetection(shards, classes=src.classes, wn_classes=src.wn_classes)
    assert len(ds) == 3
    for i in range(3):
        img, label = ds[i]
        np.testing.assert_array_equal(label, src.label(i))
        ref = cv2.cvtColor(cv2.imread(src.image_path(i)), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(img, ref)


def test_concurrent_reads_thread_safe(tmp_path):
    """Interleaved reads from many threads must never corrupt records
    (the loader's default is 4 worker threads over one shared dataset)."""
    import threading

    src = _TinyDiskDataset(str(tmp_path))
    shards = pack_dataset(src, str(tmp_path / "packed"), shard_size=2)
    ds = PackedDetection(shards, classes=src.classes, wn_classes=src.wn_classes)
    expected = [ds[i] for i in range(3)]

    errors = []

    def reader():
        try:
            for _ in range(50):
                for i in range(3):
                    img, label = ds[i]
                    np.testing.assert_array_equal(label, expected[i][1])
                    np.testing.assert_array_equal(img, expected[i][0])
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=reader) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:1]


def test_shard_index(tmp_path):
    path = str(tmp_path / "s.vdtp")
    n = write_shard(
        path,
        [(b"\x01\x02\x03", np.zeros((0, 6), np.float32), "x")],
    )
    assert n == 1
    assert os.path.exists(path + ".idx")
    with open(path + ".idx") as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 1


def test_open_packed_sidecar_roundtrip(tmp_path):
    """pack_dataset writes a .meta.json sidecar; open_packed reconstructs
    the dataset (classes included) from the shard prefix alone — the CLI
    '--dataset packed' path (cli/common.get_dataset)."""
    import pytest

    from viddet_tpu.data.packed import open_packed

    src = _TinyDiskDataset(str(tmp_path))
    pack_dataset(src, str(tmp_path / "packed"), shard_size=2)

    ds = open_packed(str(tmp_path / "packed"))
    assert ds.classes == src.classes
    assert ds.wn_classes == src.wn_classes
    assert len(ds) == 3
    img, label = ds[1]
    np.testing.assert_array_equal(label, src.label(1))

    # a directory holding exactly one packed set also resolves
    ds2 = open_packed(str(tmp_path))
    assert len(ds2) == 3

    with pytest.raises(FileNotFoundError):
        open_packed(str(tmp_path / "nonexistent"))


def test_open_packed_split_guard_and_two_root_routing(tmp_path):
    """A packed set records its split; opening it as the wrong split is a
    loud error (a train CLI must never silently validate on its training
    shards), and the CLI's 'trainprefix,valprefix' form routes by split."""
    import pytest

    from viddet_tpu.cli.common import get_dataset
    from viddet_tpu.data.packed import open_packed

    src = _TinyDiskDataset(str(tmp_path))
    pack_dataset(src, str(tmp_path / "pk-train"), shard_size=2, split="train")
    pack_dataset(src, str(tmp_path / "pk-val"), shard_size=2, split="val")

    assert len(open_packed(str(tmp_path / "pk-train"), split="train")) == 3
    with pytest.raises(ValueError, match="split"):
        open_packed(str(tmp_path / "pk-train"), split="val")

    root = f"{tmp_path}/pk-train,{tmp_path}/pk-val"
    ds_t, _ = get_dataset("packed", root, split="train")
    ds_v, _ = get_dataset("packed", root, split="val")
    assert len(ds_t) == 3 and len(ds_v) == 3


def test_open_packed_does_not_merge_sibling_prefixes(tmp_path):
    """'pk' must not swallow 'pk-aug' shards: the sidecar's exact shard
    list is authoritative, never a prefix glob."""
    from viddet_tpu.data.packed import open_packed

    src = _TinyDiskDataset(str(tmp_path))
    pack_dataset(src, str(tmp_path / "pk"), shard_size=2)
    pack_dataset(src, str(tmp_path / "pk-aug"), shard_size=2)
    assert len(open_packed(str(tmp_path / "pk"))) == 3


def test_packed_default_wnids_unique_for_combination(tmp_path):
    """Fallback wnids must be unique per class so CombinedDetection's
    wnid-keyed union cannot collapse classes."""
    from viddet_tpu.data.combined import CombinedDetection

    src = _TinyDiskDataset(str(tmp_path))
    shards = pack_dataset(src, str(tmp_path / "pk"), shard_size=2)
    ds = PackedDetection(shards, classes=src.classes)  # no wn_classes given
    assert len(set(ds.wn_classes)) == len(ds.classes)
    combo = CombinedDetection([ds, ds])
    assert combo.classes == src.classes
