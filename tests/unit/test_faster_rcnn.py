import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.models import faster_rcnn as F

TINY_CFG = F.FRCNNConfig(
    rpn_pre_nms_topk=64,
    rpn_nms_input=128,
    rpn_post_nms_train=64,
    rpn_post_nms_test=32,
    rpn_batch=64,
    roi_batch=64,
    nms_backend="xla",
)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(rng.uniform(10, 100, (20, 4)).astype(np.float32))
    anchors = jnp.concatenate(
        [jnp.minimum(anchors[:, :2], anchors[:, 2:]) - 1,
         jnp.maximum(anchors[:, :2], anchors[:, 2:]) + 1], axis=-1
    )
    gt = anchors + 5.0
    for weights in ((1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)):
        deltas = F.encode_rcnn(gt, anchors, weights)
        back = F.decode_rcnn(deltas, anchors, weights)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), rtol=1e-4, atol=1e-3)


def test_level_anchor_layout():
    a = F._level_anchors(2, 3, 16, 64.0)
    assert a.shape == (2 * 3 * 3, 4)
    # first anchor centered at (8, 8) = (0.5*stride, 0.5*stride)
    np.testing.assert_allclose(0.5 * (a[0, :2] + a[0, 2:]), [8.0, 8.0], atol=1e-4)
    # ratio-1 anchor (index 1 in ratios (0.5, 1, 2)) is square with side 64
    w = a[1, 2] - a[1, 0]
    h = a[1, 3] - a[1, 1]
    np.testing.assert_allclose([w, h], [64.0, 64.0], atol=1e-3)


def test_random_topk_select_static_sampling():
    rng = jax.random.key(0)
    eligible = jnp.asarray([True] * 10 + [False] * 20)
    sel = F._random_topk_select(rng, eligible, 4)
    assert int(sel.sum()) == 4
    assert bool(jnp.all(~sel[10:]))
    sel_all = F._random_topk_select(rng, eligible, 25)
    assert int(sel_all.sum()) == 10  # capped by eligibility


def test_rpn_target_assignment():
    anchors = jnp.asarray(
        [[0, 0, 32, 32], [100, 100, 132, 132], [300, 300, 332, 332]], jnp.float32
    )
    gt = jnp.asarray([[[0, 0, 30, 32], [-1, -1, -1, -1]]], jnp.float32)
    ids = jnp.asarray([[0, -1]], jnp.int32)
    labels, box_t = F.assign_rpn_targets(
        anchors, gt, ids, TINY_CFG, jax.random.key(0)
    )
    assert int(labels[0, 0]) == 1  # IoU ~0.94 -> positive
    assert int(labels[0, 1]) in (0, -1)  # negative (or unsampled)
    assert np.isfinite(np.asarray(box_t)).all()


def test_sample_rois_composition():
    cfg = TINY_CFG
    proposals = jnp.asarray(
        np.random.default_rng(0).uniform(0, 100, (1, 40, 4)).astype(np.float32)
    )
    proposals = jnp.concatenate(
        [jnp.minimum(proposals[..., :2], proposals[..., 2:]),
         jnp.maximum(proposals[..., :2], proposals[..., 2:]) + 8], axis=-1
    )
    p_valid = jnp.ones((1, 40), bool)
    gt = jnp.asarray([[[10, 10, 50, 50], [-1, -1, -1, -1]]], jnp.float32)
    ids = jnp.asarray([[2, -1]], jnp.int32)
    rois, cls_t, box_t, mask = F.sample_rois(
        jax.random.key(1), proposals, p_valid, gt, ids, cfg
    )
    assert rois.shape == (1, cfg.roi_batch, 4)
    cls_np = np.asarray(cls_t[0])
    # the appended GT box itself must be a positive with class 3 (=2+1)
    assert (cls_np == 3).sum() >= 1
    assert (cls_np == 0).sum() >= 1  # negatives exist
    # positives come first
    pos_idx = np.where(cls_np > 0)[0]
    if len(pos_idx):
        assert pos_idx.max() == len(pos_idx) - 1


# Shallow backbone for structural/parity unit tests: the gated properties
# (shapes, finite losses, ROI-backend parity) are depth-agnostic, and a
# full R50 compile costs ~25s/graph on 1 CPU core.  Full-depth coverage
# stays in the slow train-loss/overfit/DP-equality gates.
SHALLOW = dict(backbone_blocks=(1, 1, 1, 1), backbone_widths=(8, 16, 32, 64))


@functools.lru_cache(maxsize=None)
def _shallow_frcnn_init():
    """One shallow module + ONE eager init for both forward
    parametrizations (the init itself executes a full train-mode forward
    op-by-op, ~10s on 1 CPU core)."""
    module = F.FasterRCNN(
        num_classes=3, config=TINY_CFG, policy=FLOAT32_POLICY, **SHALLOW
    )
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    gt = jnp.asarray([[[10, 10, 60, 60], [-1, -1, -1, -1]]], jnp.float32)
    ids = jnp.asarray([[1, -1]], jnp.int32)
    variables = module.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, gt, ids, train=True,
    )
    return module, variables, x, gt, ids


@pytest.mark.parametrize("train", [False, True])
def test_frcnn_forward(train):
    module, variables, x, gt, ids = _shallow_frcnn_init()
    if train:
        out = module.apply(
            variables, x, gt, ids, train=True,
            mutable=["batch_stats"], rngs={"sampling": jax.random.key(2)},
        )[0]
        assert out["rois"].shape == (1, TINY_CFG.roi_batch, 4)
        assert out["roi_cls_logits"].shape == (1, TINY_CFG.roi_batch, 4)
        losses = F.frcnn_loss(out, gt, ids, TINY_CFG, jax.random.key(3))
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
    else:
        # frcnn_forward_and_postprocess runs the same eval forward
        # internally; a separate module.apply(train=False) here would
        # just compile the eval graph a second time (~15s on 1 CPU core)
        ids_o, scores_o, boxes_o = F.frcnn_forward_and_postprocess(
            module, variables, x, backend="xla", topk=64, post_nms=16
        )
        assert ids_o.shape == (1, 16) and boxes_o.shape == (1, 16, 4)
        assert np.isfinite(np.asarray(scores_o)).all()


@pytest.mark.slow
def test_frcnn_train_step_loss_decreases():
    """slow: a full R50-FPN train-step compile + 12 CPU steps (~42s on 1
    core).  Fast-suite FRCNN coverage: forward train/eval + finite loss
    (test_frcnn_forward) and the executed sharded step in
    test_data_parallel_families; convergence is pinned by the slow
    overfit-to-mAP gate."""
    from viddet_tpu.train.loop import make_frcnn_train_step
    from viddet_tpu.train.state import TrainState, make_lr_schedule, make_optimizer

    module = F.FasterRCNN(num_classes=2, config=TINY_CFG, policy=FLOAT32_POLICY)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)), jnp.float32
    )
    gt = jnp.asarray([[[20, 20, 80, 90]]], jnp.float32)
    ids = jnp.asarray([[0]], jnp.int32)
    variables = module.init(
        {"params": jax.random.key(0), "sampling": jax.random.key(1)},
        x, gt, ids, train=True,
    )
    tx = make_optimizer(make_lr_schedule(2e-3, 1), weight_decay=0.0)
    state = TrainState.create(
        params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
    )
    step = make_frcnn_train_step(module)
    history = []
    key = jax.random.key(5)
    for i in range(12):
        key, sub = jax.random.split(key)
        state, losses = step(state, sub, x, gt, ids)
        history.append(float(losses["total"]))
        assert np.isfinite(history[-1])
    assert min(history[-3:]) < max(history[:3]), history


def test_frcnn_roi_backend_pallas_matches_xla():
    """Full model forward with the Pallas ROIAlign (interpret mode) must
    match the packed-gather backend — same weights, same input."""
    x = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (1, 128, 128, 3)), jnp.float32
    )
    outs = {}
    for roi_backend in ("xla", "pallas_interpret"):
        import dataclasses

        cfg = dataclasses.replace(TINY_CFG, roi_backend=roi_backend)
        module = F.FasterRCNN(
            num_classes=3, config=cfg, policy=FLOAT32_POLICY, **SHALLOW
        )
        variables = module.init(
            {"params": jax.random.key(0), "sampling": jax.random.key(1)},
            x, train=False,
        )
        outs[roi_backend] = module.apply(variables, x, train=False)
    a, b = outs["xla"], outs["pallas_interpret"]
    np.testing.assert_allclose(
        np.asarray(a["roi_cls_logits"]), np.asarray(b["roi_cls_logits"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(a["roi_box_deltas"]), np.asarray(b["roi_box_deltas"]),
        rtol=1e-4, atol=1e-4,
    )
