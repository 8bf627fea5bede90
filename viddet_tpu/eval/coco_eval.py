"""In-repo COCO-protocol bbox evaluation (pycocotools is unavailable —
SURVEY.md §3.2 N10).

Implements the standard COCO detection protocol from its published
definition: 10 IoU thresholds 0.50:0.05:0.95, 101-point interpolated
precision at recall thresholds 0:0.01:1, area ranges all/small/medium/large,
max detections 1/10/100, crowd ground truth as ignore regions (IoU against a
crowd box is intersection / detection-area), detections matched greedily in
score order preferring non-ignored GT.

GT "area" for the S/M/L bins follows the official definition: the
annotation's own ``area`` field (segmentation area) when the dataset supplies
it (``COCODetection.gt_areas``), with a bbox-area fallback for box-only
datasets.  Detection areas are bbox areas, as in pycocotools.  Results on
box-only fixtures match the protocol exactly (hand-scored cases in
tests/unit/test_coco_eval.py, incl. a seg-area≠bbox-area bin-flip fixture).

``COCODetectionMetric`` mirrors the reference's metric surface
(``metrics/mscoco_metrics.py`` — SURVEY.md §3.1 item 13): accumulate padded
fixed-shape detections, then ``get()`` -> AP / AP50 / AP75 / AP-S/M/L.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = (1, 10, 100)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _iou_xyxy(dt: np.ndarray, gt: np.ndarray, crowd: np.ndarray) -> np.ndarray:
    """IoU matrix (D, G); for crowd GT, IoU = inter / det_area."""
    d, g = len(dt), len(gt)
    out = np.zeros((d, g))
    if d == 0 or g == 0:
        return out
    for j in range(g):
        gx1, gy1, gx2, gy2 = gt[j, :4]
        garea = max(gx2 - gx1, 0) * max(gy2 - gy1, 0)
        for i in range(d):
            x1 = max(dt[i, 0], gx1)
            y1 = max(dt[i, 1], gy1)
            x2 = min(dt[i, 2], gx2)
            y2 = min(dt[i, 3], gy2)
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            darea = max(dt[i, 2] - dt[i, 0], 0) * max(dt[i, 3] - dt[i, 1], 0)
            union = darea if crowd[j] else darea + garea - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


class COCOEvalBBox:
    """Protocol evaluator over plain-array ground truth and detections.

    gts: image_id -> (boxes (G,4) xyxy, classes (G,), iscrowd (G,))
    dts: image_id -> (boxes (D,4) xyxy, classes (D,), scores (D,))
    """

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.gts: Dict = {}
        self.dts: Dict = {}

    def add_image(self, image_id, gt_boxes, gt_classes, gt_crowd, dt_boxes,
                  dt_classes, dt_scores, gt_areas=None):
        boxes = np.asarray(gt_boxes, np.float64).reshape(-1, 4)
        if gt_areas is None:
            # bbox-area fallback for box-only datasets; real COCO supplies
            # the annotation's segmentation area (official S/M/L definition)
            gt_areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        self.gts[image_id] = (
            boxes,
            np.asarray(gt_classes, np.int64).reshape(-1),
            np.asarray(gt_crowd, bool).reshape(-1),
            np.asarray(gt_areas, np.float64).reshape(-1),
        )
        self.dts[image_id] = (
            np.asarray(dt_boxes, np.float64).reshape(-1, 4),
            np.asarray(dt_classes, np.int64).reshape(-1),
            np.asarray(dt_scores, np.float64).reshape(-1),
        )

    def _evaluate_img(self, img_id, cat, area_rng, max_det):
        """Returns (dt_scores, dt_matched_ignore, dt_ignored, npig) arrays."""
        gt_boxes, gt_cls, gt_crowd, gt_areas = self.gts[img_id]
        dt_boxes, dt_cls, dt_scores = self.dts[img_id]
        gsel = gt_cls == cat
        dsel = dt_cls == cat
        gt_b, crowd, g_area = gt_boxes[gsel], gt_crowd[gsel], gt_areas[gsel]
        dt_b, scores = dt_boxes[dsel], dt_scores[dsel]
        if len(gt_b) == 0 and len(dt_b) == 0:
            return None

        g_ignore = crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])
        # non-ignored GT first (stable)
        g_order = np.argsort(g_ignore, kind="stable")
        gt_b, crowd, g_ignore = gt_b[g_order], crowd[g_order], g_ignore[g_order]

        d_order = np.argsort(-scores, kind="stable")[:max_det]
        dt_b, scores = dt_b[d_order], scores[d_order]

        ious = _iou_xyxy(dt_b, gt_b, crowd)
        T = len(IOU_THRS)
        D, G = len(dt_b), len(gt_b)
        dtm = -np.ones((T, D), np.int64)  # matched gt index or -1
        gtm = -np.ones((T, G), np.int64)
        for t, thr in enumerate(IOU_THRS):
            for di in range(D):
                best_iou = min(thr, 1 - 1e-10)
                best_g = -1
                for gi in range(G):
                    if gtm[t, gi] >= 0 and not crowd[gi]:
                        continue  # already claimed (crowd may match many)
                    if best_g >= 0 and not g_ignore[best_g] and g_ignore[gi]:
                        break  # rest are ignored; keep the real match
                    if ious[di, gi] < best_iou:
                        continue
                    best_iou = ious[di, gi]
                    best_g = gi
                if best_g >= 0:
                    dtm[t, di] = best_g
                    gtm[t, best_g] = di

        d_area = (dt_b[:, 2] - dt_b[:, 0]) * (dt_b[:, 3] - dt_b[:, 1])
        d_out = (d_area < area_rng[0]) | (d_area > area_rng[1])
        dt_ig = np.zeros((T, D), bool)
        for t in range(T):
            for di in range(D):
                m = dtm[t, di]
                dt_ig[t, di] = g_ignore[m] if m >= 0 else d_out[di]
        npig = int((~g_ignore).sum())
        return scores, dtm >= 0, dt_ig, npig

    def accumulate(self):
        """-> precision (T, R, K, A, M), recall (T, K, A, M); -1 where empty."""
        T, R, K = len(IOU_THRS), len(REC_THRS), self.num_classes
        areas = list(AREA_RNG.values())
        A, M = len(areas), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        img_ids = sorted(self.gts)
        for k in range(K):
            for a, rng in enumerate(areas):
                for m, max_det in enumerate(MAX_DETS):
                    scores_all: List = []
                    matched_all: List = []
                    ignored_all: List = []
                    npig = 0
                    for img_id in img_ids:
                        r = self._evaluate_img(img_id, k, rng, max_det)
                        if r is None:
                            continue
                        s, mt, ig, n = r
                        scores_all.append(s)
                        matched_all.append(mt)
                        ignored_all.append(ig)
                        npig += n
                    if npig == 0:
                        continue
                    if scores_all:
                        scores = np.concatenate(scores_all)
                        order = np.argsort(-scores, kind="mergesort")
                        mt = np.concatenate(matched_all, axis=1)[:, order]
                        ig = np.concatenate(ignored_all, axis=1)[:, order]
                    else:
                        mt = np.zeros((T, 0), bool)
                        ig = np.zeros((T, 0), bool)
                    tps = np.cumsum(mt & ~ig, axis=1).astype(np.float64)
                    fps = np.cumsum(~mt & ~ig, axis=1).astype(np.float64)
                    for t in range(T):
                        tp, fp = tps[t], fps[t]
                        rc = tp / npig
                        pr = tp / np.maximum(tp + fp, np.spacing(1))
                        recall[t, k, a, m] = rc[-1] if len(rc) else 0.0
                        # precision envelope (monotone non-increasing)
                        q = np.zeros(R)
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                        precision[t, :, k, a, m] = q
        return precision, recall

    def summarize(self) -> Dict[str, float]:
        precision, recall = self.accumulate()

        def ap(iou=None, area="all", max_det=100):
            a = list(AREA_RNG).index(area)
            m = list(MAX_DETS).index(max_det)
            p = precision[:, :, :, a, m]
            if iou is not None:
                t = int(np.argmin(np.abs(IOU_THRS - iou)))
                p = p[t : t + 1]
            p = p[p > -1]
            return float(np.mean(p)) if p.size else -1.0

        def ar(area="all", max_det=100):
            a = list(AREA_RNG).index(area)
            m = list(MAX_DETS).index(max_det)
            r = recall[:, :, a, m]
            r = r[r > -1]
            return float(np.mean(r)) if r.size else -1.0

        return {
            "AP": ap(),
            "AP50": ap(iou=0.5),
            "AP75": ap(iou=0.75),
            "AP_small": ap(area="small"),
            "AP_medium": ap(area="medium"),
            "AP_large": ap(area="large"),
            "AR_1": ar(max_det=1),
            "AR_10": ar(max_det=10),
            "AR_100": ar(max_det=100),
            "AR_small": ar(area="small"),
            "AR_medium": ar(area="medium"),
            "AR_large": ar(area="large"),
        }


class COCODetectionMetric:
    """Streaming metric over a COCODetection dataset (reference surface)."""

    def __init__(self, dataset):
        self._dataset = dataset
        self._eval = COCOEvalBBox(num_classes=len(dataset.classes))

    def reset(self):
        self._eval = COCOEvalBBox(num_classes=len(self._dataset.classes))

    def update_with_indices(self, pred_bboxes, pred_ids, pred_scores, indices):
        """Predictions in ORIGINAL image coords + dataset indices."""
        for b, idx in enumerate(indices):
            label = self._dataset.label(int(idx))
            pb = np.asarray(pred_bboxes[b])
            pi = np.asarray(pred_ids[b]).reshape(-1)
            ps = np.asarray(pred_scores[b]).reshape(-1)
            keep = (pi >= 0) & (ps >= 0)
            areas = (
                self._dataset.gt_areas(int(idx))
                if hasattr(self._dataset, "gt_areas") else None
            )
            self._eval.add_image(
                self._dataset.image_id(int(idx)),
                label[:, :4],
                label[:, 4],
                label[:, 5] > 0,
                pb[keep],
                pi[keep],
                ps[keep],
                gt_areas=areas,
            )

    def get(self) -> Tuple[List[str], List[float]]:
        stats = self._eval.summarize()
        return list(stats.keys()), list(stats.values())
