"""Metamorphic / protocol-property tests for the in-repo metrics.

VERDICT r3 item 7: the COCO evaluator and the VID motion-IoU metric are
full reimplementations (no pycocotools in this environment), so beyond
the hand-scored fixtures they get PROPERTY gates — transformations whose
effect on the metric is a theorem of the protocol, checked on randomized
scenes.

Scene-generation note: "adding a strictly-worse duplicate never
increases AP" is only a theorem when each detection overlaps at most ONE
ground truth — with two overlapping GTs, a lower-scored duplicate of a
matched detection can match the second GT and RAISE recall.  The
generator therefore places GTs on a coarse grid (≥200px apart, ≤90px
wide) and jitters detections by ≤8px, so cross-GT matches are
geometrically impossible.
"""

import numpy as np

from viddet_tpu.eval.coco_eval import COCOEvalBBox

GRID = 220.0
MAX_WH = 90.0


def make_scene(rng, images=4, classes=3):
    """Random well-separated scenes: per image, GTs on grid cells, dets =
    GT jitter or far-field FPs.  All scores globally distinct."""
    scenes = []
    total_dets = 0
    for img in range(images):
        g = int(rng.integers(1, 6))
        cells = rng.choice(25, size=g, replace=False)
        cx = (cells % 5) * GRID + GRID / 2
        cy = (cells // 5) * GRID + GRID / 2
        wh = rng.uniform(30, MAX_WH, (g, 2))
        gt = np.stack([cx - wh[:, 0] / 2, cy - wh[:, 1] / 2,
                       cx + wh[:, 0] / 2, cy + wh[:, 1] / 2], axis=1)
        gt_cls = rng.integers(0, classes, g)
        d = int(rng.integers(1, 8))
        src = rng.integers(0, g, d)
        jitter = rng.normal(0, 4, (d, 4)).clip(-8, 8)
        dt = gt[src] + jitter
        far = rng.random(d) < 0.3  # some pure FPs between grid cells
        if far.any():
            # cell-boundary corners: [k·GRID-40, k·GRID+20] never touches
            # the GT extents [k·GRID+65, k·GRID+155] on either axis
            fx = (rng.integers(0, 4, int(far.sum())) + 1) * GRID - 40
            fy = (rng.integers(0, 4, int(far.sum())) + 1) * GRID - 40
            dt[far] = np.stack([fx, fy, fx + 60, fy + 60], axis=1)
        dt[:, 2:] = np.maximum(dt[:, 2:], dt[:, :2] + 4)
        dt_cls = np.where(rng.random(d) < 0.8, gt_cls[src],
                          rng.integers(0, classes, d))
        scenes.append(dict(img=img, gt=gt, gt_cls=gt_cls,
                           crowd=np.zeros(g, np.int64), dt=dt, dt_cls=dt_cls,
                           n=d))
        total_dets += d
    order = rng.permutation(total_dets)
    scores = (order + 1) / (total_dets + 1)  # globally distinct
    k = 0
    for sc in scenes:
        sc["dt_scores"] = scores[k : k + sc["n"]]
        k += sc["n"]
    return scenes


def summarize(scenes, num_classes=3):
    ev = COCOEvalBBox(num_classes=num_classes)
    for s in scenes:
        ev.add_image(s["img"], s["gt"], s["gt_cls"], s["crowd"],
                     s["dt"], s["dt_cls"], s["dt_scores"])
    return ev.summarize()


def assert_all_leq(after, before, msg):
    for k in before:
        if before[k] < 0 or after[k] < 0:  # -1: undefined bin
            continue
        assert after[k] <= before[k] + 1e-9, (
            f"{msg}: {k} rose {before[k]:.6f} -> {after[k]:.6f}"
        )


def assert_all_geq(after, before, msg):
    for k in before:
        if before[k] < 0 or after[k] < 0:
            continue
        assert after[k] >= before[k] - 1e-9, (
            f"{msg}: {k} fell {before[k]:.6f} -> {after[k]:.6f}"
        )


def test_worse_duplicate_never_increases_ap():
    for trial in range(20):
        rng = np.random.default_rng(100 + trial)
        scenes = make_scene(rng)
        before = summarize(scenes)
        # duplicate one random detection per image at a strictly lower,
        # still globally-unique score
        dup = [dict(s) for s in scenes]
        for s in dup:
            i = int(rng.integers(0, s["n"]))
            eps = rng.uniform(0.2, 0.8) * s["dt_scores"][i] / (s["n"] + 7)
            s["dt"] = np.concatenate([s["dt"], s["dt"][i : i + 1]])
            s["dt_cls"] = np.concatenate([s["dt_cls"], s["dt_cls"][i : i + 1]])
            s["dt_scores"] = np.concatenate(
                [s["dt_scores"], [s["dt_scores"][i] - eps]]
            )
        after = summarize(dup)
        assert_all_leq(after, before, f"trial {trial} worse-duplicate")


def test_pure_fp_never_increases_ap():
    for trial in range(20):
        rng = np.random.default_rng(300 + trial)
        scenes = make_scene(rng)
        before = summarize(scenes)
        fp = [dict(s) for s in scenes]
        for s in fp:
            # far outside the 5x5 grid: overlaps nothing
            box = np.array([[3000.0, 3000.0, 3060.0, 3070.0]])
            s["dt"] = np.concatenate([s["dt"], box])
            s["dt_cls"] = np.concatenate([s["dt_cls"], [int(rng.integers(0, 3))]])
            s["dt_scores"] = np.concatenate(
                [s["dt_scores"], [float(rng.uniform(0, 1))]]
            )
        after = summarize(fp)
        assert_all_leq(after, before, f"trial {trial} pure-FP")


def test_detection_and_image_order_invariance():
    for trial in range(10):
        rng = np.random.default_rng(500 + trial)
        scenes = make_scene(rng)
        before = summarize(scenes)
        shuffled = []
        for s in scenes:
            p = rng.permutation(s["n"])
            shuffled.append(dict(s, dt=s["dt"][p], dt_cls=s["dt_cls"][p],
                                 dt_scores=s["dt_scores"][p]))
        rng.shuffle(shuffled)
        after = summarize(shuffled)
        assert before == after, f"trial {trial}: order changed the stats"


def test_crowd_region_absorbs_detections_noop():
    """Adding a far-away crowd GT plus detections inside it must not move
    any stat: crowd matches are neither TP nor FP, and crowd GTs are not
    positives.

    Protocol subtlety this test pins: detections are truncated to maxDets
    BEFORE matching (pycocotools evaluateImg semantics), so an ignored
    crowd match still CONSUMES an AR_1/AR_10 slot if it outscores a real
    detection.  The inserted detections therefore score below every real
    one — with them ranked last, the no-op is a theorem."""
    for trial in range(10):
        rng = np.random.default_rng(700 + trial)
        scenes = make_scene(rng)
        before = summarize(scenes)
        crowded = [dict(s) for s in scenes]
        for s in crowded:
            region = np.array([[5000.0, 5000.0, 5400.0, 5400.0]])
            s["gt"] = np.concatenate([s["gt"], region])
            cls = int(rng.integers(0, 3))
            s["gt_cls"] = np.concatenate([s["gt_cls"], [cls]])
            s["crowd"] = np.concatenate([s["crowd"], [1]])
            inside = np.array([[5100.0, 5100.0, 5250.0, 5280.0],
                               [5050.0, 5200.0, 5350.0, 5390.0]])
            s["dt"] = np.concatenate([s["dt"], inside])
            s["dt_cls"] = np.concatenate([s["dt_cls"], [cls, cls]])
            s["dt_scores"] = np.concatenate(
                [s["dt_scores"], [1e-4, 5e-5]]  # below every real score
            )
        after = summarize(crowded)
        for k in before:
            assert abs(after[k] - before[k]) < 1e-9, (
                f"trial {trial}: crowd absorption moved {k} "
                f"{before[k]:.6f} -> {after[k]:.6f}"
            )


def test_crowding_a_missed_gt_never_decreases_ap():
    """Converting a ground truth that NO detection overlaps into a crowd
    region only shrinks the recall denominator — every AP/AR stat is
    non-decreasing."""
    for trial in range(20):
        rng = np.random.default_rng(900 + trial)
        scenes = make_scene(rng)
        # add one guaranteed-missed GT per image (far corner, no dets there)
        for s in scenes:
            box = np.array([[4000.0, 4000.0, 4080.0, 4080.0]])
            s["gt"] = np.concatenate([s["gt"], box])
            s["gt_cls"] = np.concatenate([s["gt_cls"], [int(rng.integers(0, 3))]])
            s["crowd"] = np.concatenate([s["crowd"], [0]])
        before = summarize(scenes)
        relaxed = [
            dict(s, crowd=np.concatenate([s["crowd"][:-1], [1]]))
            for s in scenes
        ]
        after = summarize(relaxed)
        assert_all_geq(after, before, f"trial {trial} crowd-missed-GT")


# ---------------------------------------------------------------------
# VID motion-IoU: analytic worked examples + bin partition
# ---------------------------------------------------------------------

from viddet_tpu.eval.vid_motion_iou import MOTION_BINS, compute_motion_ious


def _track(frames, w, v):
    """Square w-px box translating v px/frame, trackid 0."""
    return [
        np.asarray([[v * t, 0.0, v * t + w, w, 0.0, 0.0, 0.0]], np.float32)
        for t in range(frames)
    ]


def test_motion_iou_constant_velocity_closed_form():
    """Closed-form check of the FGFA motion-IoU definition (mean IoU with
    the same track's boxes over ±10 frames).  For a w-px square moving
    v px/frame, IoU at frame offset u is (w - v|u|)/(w + v|u|), so the
    interior-frame motion IoU is (1/20)·Σ_{u=1..10} 2(w - vu)/(w + vu).
    The reference mount is empty (SURVEY §0), so this analytically-derived
    example stands in for a published table; it pins both the windowing
    (exclude u=0, ±10 inclusive) and the mean."""
    for w, v in ((100.0, 10.0), (100.0, 1.0), (50.0, 2.0)):
        labels = _track(25, w, v)
        got = compute_motion_ious(labels, motion_window=10)
        # IoU(u) = inter/union = (w-vu)·w / (2w² - (w-vu)·w) = (w-vu)/(w+vu)
        expected = sum(
            2 * max(w - v * u, 0.0) / (w + v * u) for u in range(1, 11)
        ) / 20.0
        # frame 12 has the full ±10 window on both sides
        np.testing.assert_allclose(got[12][0], expected, rtol=1e-6,
                                   err_msg=f"w={w} v={v}")


def test_motion_iou_bins_match_closed_form():
    """The three canonical regimes land in the right FGFA bins:
    static -> slow (1.0), v=1 on a 100px box -> medium (~0.897),
    v=10 on a 100px box -> fast (~0.338)."""
    def motion(v):
        return compute_motion_ious(_track(25, 100.0, v), motion_window=10)[12][0]

    def bin_of(x):
        return [m for m, (lo, hi) in MOTION_BINS.items() if lo < x <= hi]

    assert bin_of(motion(0.0)) == ["slow"]
    med = motion(1.0)
    assert abs(med - 0.89715) < 1e-3 and bin_of(med) == ["medium"]
    fast = motion(10.0)
    assert abs(fast - 0.33755) < 1e-3 and bin_of(fast) == ["fast"]


def test_motion_bins_partition():
    """Every motion-IoU value belongs to exactly one bin, including the
    protocol boundaries 0.7 and 0.9 and the endpoints 0 and 1."""
    for x in np.concatenate([np.linspace(0, 1, 101), [0.7, 0.9, 0.0, 1.0]]):
        holders = [m for m, (lo, hi) in MOTION_BINS.items() if lo < x <= hi]
        assert len(holders) == 1, f"motion {x} in bins {holders}"


# ---------------------------------------------------------------------
# VOC metric: the same metamorphic properties (symmetry with COCO above)
# ---------------------------------------------------------------------

from viddet_tpu.eval.voc_map import VOCMApMetric


def _voc_scene_args(s):
    """Adapt one make_scene image dict to VOCMApMetric.update (B=1)."""
    return (
        s["dt"][None], s["dt_cls"][None].astype(np.float32),
        s["dt_scores"][None].astype(np.float32),
        s["gt"][None], s["gt_cls"][None].astype(np.float32),
        s["crowd"][None].astype(np.float32),  # crowd flag reused as difficult
    )


def _voc_map(scenes, use_07=False):
    m = VOCMApMetric(0.5, [f"c{i}" for i in range(3)], use_07_metric=use_07)
    for s in scenes:
        m.update(*_voc_scene_args(s))
    names, values = m.get()
    return {n: v for n, v in zip(names, values) if not np.isnan(v)}


def test_voc_worse_duplicate_never_increases_ap():
    for trial in range(15):
        rng = np.random.default_rng(1100 + trial)
        scenes = make_scene(rng)
        before = _voc_map(scenes)
        dup = [dict(s) for s in scenes]
        for s in dup:
            i = int(rng.integers(0, s["n"]))
            eps = rng.uniform(0.2, 0.8) * s["dt_scores"][i] / (s["n"] + 7)
            s["dt"] = np.concatenate([s["dt"], s["dt"][i : i + 1]])
            s["dt_cls"] = np.concatenate([s["dt_cls"], s["dt_cls"][i : i + 1]])
            s["dt_scores"] = np.concatenate(
                [s["dt_scores"], [s["dt_scores"][i] - eps]]
            )
        after = _voc_map(dup)
        for k in before:
            if k in after:
                assert after[k] <= before[k] + 1e-9, (trial, k, before[k], after[k])


def test_voc_order_invariance():
    for trial in range(10):
        rng = np.random.default_rng(1300 + trial)
        scenes = make_scene(rng)
        before = _voc_map(scenes, use_07=True)
        shuffled = []
        for s in scenes:
            p = rng.permutation(s["n"])
            shuffled.append(dict(s, dt=s["dt"][p], dt_cls=s["dt_cls"][p],
                                 dt_scores=s["dt_scores"][p]))
        rng.shuffle(shuffled)
        after = _voc_map(shuffled, use_07=True)
        assert before == after, (trial, before, after)


def test_voc_difficult_gt_is_ignored():
    """A difficult GT with a matching detection must contribute neither a
    positive (recall denominator) nor an FP: mAP identical to the scene
    without that GT+detection pair."""
    for trial in range(10):
        rng = np.random.default_rng(1500 + trial)
        scenes = make_scene(rng)
        before = _voc_map(scenes)
        hard = [dict(s) for s in scenes]
        for s in hard:
            box = np.array([[4000.0, 4000.0, 4080.0, 4090.0]])
            cls = int(rng.integers(0, 3))
            s["gt"] = np.concatenate([s["gt"], box])
            s["gt_cls"] = np.concatenate([s["gt_cls"], [cls]])
            s["crowd"] = np.concatenate([s["crowd"], [1]])  # difficult
            s["dt"] = np.concatenate([s["dt"], box + rng.normal(0, 2, 4)])
            s["dt_cls"] = np.concatenate([s["dt_cls"], [cls]])
            s["dt_scores"] = np.concatenate([s["dt_scores"], [1e-4]])
        after = _voc_map(hard)
        for k in before:
            assert k in after and abs(after[k] - before[k]) < 1e-9, (
                trial, k, before.get(k), after.get(k)
            )
