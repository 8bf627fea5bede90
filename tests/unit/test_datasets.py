"""Dataset parsers over generated on-disk fixtures (VOC / COCO / VID /
combined) — the reference relied on real data + manual inspection
(SURVEY.md §6); we generate miniature datasets instead."""

import json
import os
import xml.etree.ElementTree as ET

import cv2
import numpy as np
import pytest

from viddet_tpu.data.combined import CombinedDetection
from viddet_tpu.data.synthetic import SyntheticDetection


def write_jpg(path, h=60, w=80):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.random.default_rng(0).integers(0, 255, (h, w, 3)).astype(np.uint8)
    cv2.imwrite(path, img)


def voc_xml(objects):
    root = ET.Element("annotation")
    for name, box, difficult in objects:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = name
        ET.SubElement(obj, "difficult").text = str(difficult)
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
            ET.SubElement(bb, tag).text = str(v)
    return ET.tostring(root).decode()


@pytest.fixture
def voc_root(tmp_path):
    root = tmp_path / "VOCdevkit"
    year = root / "VOC2007"
    (year / "ImageSets" / "Main").mkdir(parents=True)
    (year / "Annotations").mkdir(parents=True)
    (year / "JPEGImages").mkdir(parents=True)
    items = {
        "000001": [("dog", (10, 20, 40, 50), 0), ("person", (5, 5, 20, 30), 1)],
        "000002": [("car", (1, 2, 30, 40), 0)],
    }
    for stem, objs in items.items():
        (year / "Annotations" / f"{stem}.xml").write_text(voc_xml(objs))
        write_jpg(str(year / "JPEGImages" / f"{stem}.jpg"))
    (year / "ImageSets" / "Main" / "trainval.txt").write_text("000001\n000002\n")
    return str(root)


def test_voc_parsing(voc_root):
    from viddet_tpu.data.voc import VOCDetection

    ds = VOCDetection(voc_root, splits=(("2007", "trainval"),))
    assert len(ds) == 2
    img, label = ds[0]
    assert img.shape == (60, 80, 3)
    assert label.shape == (2, 6)
    dog = label[label[:, 4] == ds.classes.index("dog")][0]
    np.testing.assert_allclose(dog[:4], [9, 19, 39, 49])  # 1-based -> 0-based
    assert dog[5] == 0
    person = label[label[:, 4] == ds.classes.index("person")][0]
    assert person[5] == 1  # difficult
    stats = ds.statistics()
    assert stats["images"] == 2 and stats["boxes"] == 3


@pytest.fixture
def coco_root(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir(parents=True)
    data = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "width": 80, "height": 60},
            {"id": 9, "file_name": "b.jpg", "width": 80, "height": 60},
        ],
        "annotations": [
            {"image_id": 7, "category_id": 3, "bbox": [10, 10, 20, 15],
             "iscrowd": 0, "area": 123.5},
            {"image_id": 7, "category_id": 18, "bbox": [0, 0, 30, 30], "iscrowd": 1},
            {"image_id": 9, "category_id": 3, "bbox": [5, 5, 10, 10],
             "iscrowd": 0, "area": 64.0},
        ],
        "categories": [
            {"id": 3, "name": "car"},
            {"id": 18, "name": "dog"},
        ],
    }
    (root / "annotations" / "instances_val2017.json").write_text(json.dumps(data))
    write_jpg(str(root / "val2017" / "a.jpg"))
    write_jpg(str(root / "val2017" / "b.jpg"))
    return str(root)


def test_coco_parsing(coco_root):
    from viddet_tpu.data.coco import COCODetection

    ds = COCODetection(coco_root, split="val2017")
    assert len(ds) == 2
    assert ds.classes == ("car", "dog")
    img, label = ds[0]
    assert label.shape == (2, 6)
    np.testing.assert_allclose(label[0, :4], [10, 10, 30, 25])  # xywh -> xyxy
    assert label[0, 4] == 0 and label[0, 5] == 0
    assert label[1, 4] == 1 and label[1, 5] == 1  # crowd flag
    assert ds.image_id(0) == 7
    assert ds.contiguous_to_category_id(0) == 3
    # segmentation-area sidecar: explicit area kept, bbox-area fallback for
    # the crowd ann that lacks one (30*30)
    np.testing.assert_allclose(ds.gt_areas(0), [123.5, 900.0])
    np.testing.assert_allclose(ds.gt_areas(1), [64.0])


def vid_xml(objects):
    root = ET.Element("annotation")
    for wnid, box, trackid in objects:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = wnid
        ET.SubElement(obj, "trackid").text = str(trackid)
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
            ET.SubElement(bb, tag).text = str(v)
    return ET.tostring(root).decode()


@pytest.fixture
def vid_root(tmp_path):
    root = tmp_path / "ILSVRC2015"
    snip = "ILSVRC2015_val_00000001"
    ann = root / "Annotations" / "VID" / "val" / snip
    data = root / "Data" / "VID" / "val" / snip
    ann.mkdir(parents=True)
    data.mkdir(parents=True)
    # 8 frames; a car (n02958343) moving right; frame 5 empty
    for t in range(8):
        objs = [] if t == 5 else [("n02958343", (10 + 4 * t, 10, 40 + 4 * t, 40), 0)]
        (ann / f"{t:06d}.xml").write_text(vid_xml(objs))
        write_jpg(str(data / f"{t:06d}.JPEG"))
    return str(root)


def test_vid_single_frame_indexing(vid_root):
    from viddet_tpu.data.imgnetvid import ImageNetVidDetection

    ds = ImageNetVidDetection(vid_root, split="val", allow_empty=False)
    assert len(ds) == 7  # empty frame skipped
    img, label = ds[0]
    assert img.shape == (60, 80, 3)
    assert label.shape == (1, 7)
    assert label[0, 4] == ds.classes.index("car")
    assert label[0, 6] == 0  # trackid

    ds_all = ImageNetVidDetection(vid_root, split="val", allow_empty=True)
    assert len(ds_all) == 8


def test_vid_every_n_and_fraction(vid_root):
    from viddet_tpu.data.imgnetvid import ImageNetVidDetection

    ds = ImageNetVidDetection(vid_root, split="val", every_n=2, allow_empty=True)
    assert len(ds) == 4  # frames 0,2,4,6
    ds_f = ImageNetVidDetection(
        vid_root, split="val", frames_fraction=0.5, allow_empty=True
    )
    assert len(ds_f) == 4


def test_vid_clip_window(vid_root):
    from viddet_tpu.data.imgnetvid import ImageNetVidDetection

    ds = ImageNetVidDetection(
        vid_root, split="val", window=3, stride=1, allow_empty=True
    )
    # key frames 1..6 (need one frame either side)
    assert len(ds) == 6
    clip, label = ds[0]
    assert clip.shape == (3, 60, 80, 3)
    rel, stem = ds.frame_key(0)
    assert stem == "000001"  # first valid key frame
    # label belongs to the key (center) frame: x1 = 10 + 4*1
    assert label[0, 0] == 14


def test_combined_remaps_classes(vid_root):
    a = SyntheticDetection(num_images=3, num_classes=2, seed=1)
    b = SyntheticDetection(num_images=2, num_classes=2, seed=2)
    # give b overlapping wn ids with a's second class
    b.wn_classes = (a.wn_classes[1], "n99999999")
    b.classes = (a.classes[1], "novel")
    combined = CombinedDetection([a, b])
    assert len(combined) == 5
    assert combined.classes == a.classes + ("novel",)
    # class 0 of dataset b must remap to union id 1
    _, label = combined[3]
    ids = set(label[:, 4].astype(int).tolist())
    assert ids <= {1, 2}


def det_xml(objects):
    root = ET.Element("annotation")
    for wnid, box in objects:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = wnid
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
            ET.SubElement(bb, tag).text = str(v)
    return ET.tostring(root).decode()


@pytest.fixture
def det_root(tmp_path):
    root = tmp_path / "ILSVRC2015"
    ann = root / "Annotations" / "DET" / "train" / "sub"
    data = root / "Data" / "DET" / "train" / "sub"
    ann.mkdir(parents=True)
    data.mkdir(parents=True)
    items = {
        "a": [("n02958343", (5, 5, 30, 30))],        # car (VID class)
        "b": [("n99999999", (1, 1, 20, 20))],        # non-VID class
        "c": [],                                      # empty
    }
    for stem, objs in items.items():
        (ann / f"{stem}.xml").write_text(det_xml(objs))
        write_jpg(str(data / f"{stem}.JPEG"))
    return str(root)


def test_imgnet_det_full_classes(det_root):
    from viddet_tpu.data.imgnetdet import ImageNetDetection

    ds = ImageNetDetection(det_root, split="train")
    # classes discovered from annotations, sorted wnids
    assert ds.wn_classes == ("n02958343", "n99999999")
    assert len(ds) == 2  # empty image dropped
    img, label = ds[0]
    assert label.shape == (1, 6)


def test_imgnet_det_vid_classes_only(det_root):
    from viddet_tpu.data.imgnetdet import ImageNetDetection

    ds = ImageNetDetection(det_root, split="train", vid_classes_only=True)
    assert len(ds.classes) == 30
    assert len(ds) == 1  # only the car image retains boxes
    _, label = ds[0]
    assert label[0, 4] == ds.wn_classes.index("n02958343")


def test_imgnet_det_allow_empty(det_root):
    from viddet_tpu.data.imgnetdet import ImageNetDetection

    ds = ImageNetDetection(det_root, split="train", allow_empty=True)
    assert len(ds) == 3

