import numpy as np

from viddet_tpu.eval.vid_motion_iou import MOTION_BINS, compute_motion_ious


def make_label(rows):
    return np.asarray(rows, np.float32) if rows else np.zeros((0, 7), np.float32)


def test_static_object_is_slow():
    labels = [make_label([[10, 10, 50, 50, 0, 0, 0]]) for _ in range(5)]
    ious = compute_motion_ious(labels)
    for v in ious:
        assert v[0] == 1.0  # static -> motion IoU 1.0 -> slow


def test_fast_object_low_motion_iou():
    labels = [make_label([[10 + 30 * t, 10, 40 + 30 * t, 40, 0, 0, 0]]) for t in range(5)]
    ious = compute_motion_ious(labels)
    assert ious[2][0] < 0.7  # jumps of 30px on a 30px box -> disjoint mostly


def test_track_separation():
    # two tracks: one static, one fast, in the same frames
    labels = [
        make_label(
            [[10, 10, 50, 50, 0, 0, 0], [100 + 50 * t, 10, 140 + 50 * t, 50, 0, 0, 1]]
        )
        for t in range(4)
    ]
    ious = compute_motion_ious(labels)
    assert ious[1][0] > 0.9
    assert ious[1][1] < 0.3


def test_window_limits():
    # object exists only at t=0 and t=20: outside ±10 window -> defaults 1.0
    labels = [make_label([]) for _ in range(21)]
    labels[0] = make_label([[0, 0, 10, 10, 0, 0, 3]])
    labels[20] = make_label([[500, 0, 510, 10, 0, 0, 3]])
    ious = compute_motion_ious(labels, motion_window=10)
    assert ious[0][0] == 1.0 and ious[20][0] == 1.0


def test_vid_metric_end_to_end(tmp_path):
    """Full metric over a fixture dataset with perfect detections."""
    import os
    import xml.etree.ElementTree as ET

    import cv2

    from viddet_tpu.data.imgnetvid import ImageNetVidDetection
    from viddet_tpu.eval.vid_motion_iou import VIDDetectionMetric

    root = tmp_path / "vidroot"
    snip = "snipA"
    ann = root / "Annotations" / "VID" / "val" / snip
    data = root / "Data" / "VID" / "val" / snip
    ann.mkdir(parents=True)
    data.mkdir(parents=True)
    img = np.zeros((60, 80, 3), np.uint8)
    boxes = []
    for t in range(4):
        box = (5 + t, 10, 35 + t, 40)  # slow-moving car
        boxes.append(box)
        xml_root = ET.Element("annotation")
        obj = ET.SubElement(xml_root, "object")
        ET.SubElement(obj, "name").text = "n02958343"
        ET.SubElement(obj, "trackid").text = "0"
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in zip(("xmin", "ymin", "xmax", "ymax"), box):
            ET.SubElement(bb, tag).text = str(v)
        (ann / f"{t:06d}.xml").write_text(ET.tostring(xml_root).decode())
        cv2.imwrite(str(data / f"{t:06d}.JPEG"), img)

    ds = ImageNetVidDetection(str(root), split="val")
    metric = VIDDetectionMetric(ds)
    car = ds.classes.index("car")
    for i in range(len(ds)):
        b = np.asarray([list(boxes[i])], np.float32)
        metric.update_with_indices(
            b[None], np.asarray([[car]], np.float32), np.asarray([[0.9]], np.float32), [i]
        )
    names, values = metric.get()
    result = dict(zip(names, values))
    assert result["mAP"] == 1.0
    assert result["mAP(slow)"] == 1.0
    assert np.isnan(result["mAP(fast)"]) or result["mAP(fast)"] == 0.0
