import numpy as np

from viddet_tpu.eval.voc_map import VOC07MApMetric, VOCMApMetric


def wrap(*arrays):
    return [np.asarray(a)[None] for a in arrays]


def test_perfect_detection_ap1():
    metric = VOCMApMetric(class_names=["a", "b"])
    gt_boxes = [[0, 0, 10, 10], [20, 20, 40, 40]]
    gt_ids = [0, 1]
    metric.update(
        *wrap(gt_boxes, gt_ids, [0.9, 0.8], gt_boxes, gt_ids)
    )
    names, values = metric.get()
    assert names == ["a", "b", "mAP"]
    np.testing.assert_allclose(values, [1.0, 1.0, 1.0])


def test_false_positive_halves_precision():
    metric = VOCMApMetric(class_names=["a"])
    preds = [[0, 0, 10, 10], [50, 50, 60, 60]]  # second is FP
    metric.update(
        *wrap(preds, [0, 0], [0.9, 0.8], [[0, 0, 10, 10]], [0])
    )
    _, values = metric.get()
    # recall hits 1.0 at precision 1.0 (TP first), so area AP = 1.0
    assert values[-1] == 1.0
    metric.reset()
    metric.update(
        *wrap(preds, [0, 0], [0.8, 0.9], [[0, 0, 10, 10]], [0])
    )  # FP ranked first now
    _, values = metric.get()
    assert 0.4 < values[-1] < 0.6  # precision at recall 1.0 is 0.5


def test_missed_gt_lowers_recall():
    metric = VOCMApMetric(class_names=["a"])
    metric.update(
        *wrap([[0, 0, 10, 10]], [0], [0.9],
              [[0, 0, 10, 10], [30, 30, 50, 50]], [0, 0])
    )
    _, values = metric.get()
    assert abs(values[-1] - 0.5) < 1e-6


def test_difficult_gt_ignored():
    metric = VOCMApMetric(class_names=["a"])
    # one normal GT matched + one difficult GT matched -> difficult ignored
    metric.update(
        *wrap(
            [[0, 0, 10, 10], [30, 30, 50, 50]], [0, 0], [0.9, 0.8],
            [[0, 0, 10, 10], [30, 30, 50, 50]], [0, 0], [0.0, 1.0],
        )
    )
    _, values = metric.get()
    assert values[-1] == 1.0  # difficult match neither TP nor FP; npos == 1


def test_duplicate_detection_is_fp():
    metric = VOCMApMetric(class_names=["a"])
    metric.update(
        *wrap(
            [[0, 0, 10, 10], [1, 1, 10, 10]], [0, 0], [0.9, 0.8],
            [[0, 0, 10, 10]], [0],
        )
    )
    _, values = metric.get()
    assert values[-1] == 1.0  # dup is FP after recall 1.0 -> area unchanged


def test_voc07_eleven_point():
    metric = VOC07MApMetric(class_names=["a"])
    metric.update(
        *wrap([[0, 0, 10, 10]], [0], [0.9],
              [[0, 0, 10, 10], [30, 30, 50, 50]], [0, 0])
    )
    _, values = metric.get()
    # recall 0.5 with precision 1.0 -> 11-pt AP = 6/11
    assert abs(values[-1] - 6 / 11) < 1e-6


def test_padding_ignored():
    metric = VOCMApMetric(class_names=["a"])
    pred_boxes = np.array([[[0, 0, 10, 10], [-1, -1, -1, -1]]])
    pred_ids = np.array([[0, -1]])
    pred_scores = np.array([[0.9, -1]])
    gt_boxes = np.array([[[0, 0, 10, 10], [-1, -1, -1, -1]]])
    gt_ids = np.array([[0, -1]])
    metric.update(pred_boxes, pred_ids, pred_scores, gt_boxes, gt_ids)
    _, values = metric.get()
    assert values[-1] == 1.0
