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
