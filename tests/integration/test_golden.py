"""Golden-detection regression test (self-referential bit-for-bit gate).

The BASELINE.json contract is bit-for-bit detections at fixed weights; the
reference weights are unobtainable (SURVEY.md §0), so this pins OUR OWN
pipeline instead: a fixed-seed tiny model's detections on a fixed input are
committed as a fixture, and every future change to the decode / top-k / NMS
path must reproduce them exactly (CPU, float32).  If a change breaks this
test intentionally (e.g. a semantics fix), regenerate with:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tests/integration/test_golden.py regenerate

(the device count matters: XLA partitions reductions differently per device
count, which perturbs box floats past 1e-4 — fixtures are pinned to the
8-virtual-device env tests/conftest.py forces.)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.models.yolo3 import NMSConfig, YOLOv3, forward_and_postprocess

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden_dets.npz")
FLAGSHIP_FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "golden_dets_darknet53_416.npz"
)


def compute_detections():
    module = YOLOv3(num_classes=4, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.asarray(
        np.random.default_rng(1234).uniform(-1, 1, (2, 96, 96, 3)), jnp.float32
    )
    variables = module.init(jax.random.key(99), x, train=False)
    ids, scores, boxes = forward_and_postprocess(
        module, variables, x, NMSConfig(backend="xla", topk=64, post_nms=16,
                                        valid_thresh=0.001)
    )
    return np.asarray(ids), np.asarray(scores), np.asarray(boxes)


def test_detections_match_golden_fixture():
    assert os.path.exists(FIXTURE), "fixture missing — run regenerate"
    ids, scores, boxes = compute_detections()
    with np.load(FIXTURE) as data:
        np.testing.assert_array_equal(ids, data["ids"])
        np.testing.assert_allclose(scores, data["scores"], rtol=0, atol=1e-6)
        np.testing.assert_allclose(boxes, data["boxes"], rtol=0, atol=1e-4)


def compute_flagship_detections(backend: str = "xla"):
    """The path the bench + parity contract actually measure: full
    darknet53 @ 416, f32, default NMS geometry (topk=400, post_nms=100)."""
    from viddet_tpu.models import get_model

    module, _ = get_model("yolo3_darknet53_coco", policy=FLOAT32_POLICY)
    x = jnp.asarray(
        np.random.default_rng(77).uniform(0, 1, (1, 416, 416, 3)), jnp.float32
    )
    variables = module.init(jax.random.key(7), x, train=False)
    ids, scores, boxes = forward_and_postprocess(
        module, variables, x, NMSConfig(backend=backend, valid_thresh=0.001)
    )
    return np.asarray(ids), np.asarray(scores), np.asarray(boxes)


@pytest.mark.slow
def test_flagship_darknet53_416_matches_golden():
    assert os.path.exists(FLAGSHIP_FIXTURE), "fixture missing — run regenerate"
    ids, scores, boxes = compute_flagship_detections("xla")
    with np.load(FLAGSHIP_FIXTURE) as data:
        np.testing.assert_array_equal(ids, data["ids"])
        np.testing.assert_allclose(scores, data["scores"], rtol=0, atol=1e-6)
        np.testing.assert_allclose(boxes, data["boxes"], rtol=0, atol=1e-4)


@pytest.mark.slow
def test_flagship_pallas_backend_matches_xla():
    """The Pallas NMS kernel (interpret mode on CPU, real kernel on TPU)
    must produce the same detections as the jnp/XLA oracle on the flagship
    path — this is the gate the bench config runs through."""
    backend = (
        "pallas" if jax.default_backend() not in ("cpu",) else "pallas_interpret"
    )
    ids_x, scores_x, boxes_x = compute_flagship_detections("xla")
    ids_p, scores_p, boxes_p = compute_flagship_detections(backend)
    np.testing.assert_array_equal(ids_x, ids_p)
    np.testing.assert_allclose(scores_x, scores_p, rtol=0, atol=1e-5)
    np.testing.assert_allclose(boxes_x, boxes_p, rtol=0, atol=1e-3)


SSD_FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "golden_dets_ssd_r50_256.npz"
)
FRCNN_FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "golden_dets_frcnn_r50fpn_128.npz"
)


def compute_ssd_detections():
    """SSD ResNet-50 @256 f32: pins anchors + softmax + dense two-stage NMS."""
    from viddet_tpu.models.ssd import SSD, SSDNMSConfig, ssd_forward_and_postprocess

    module = SSD(num_classes=4, image_size=256, policy=FLOAT32_POLICY)
    x = jnp.asarray(
        np.random.default_rng(55).uniform(0, 1, (1, 256, 256, 3)), jnp.float32
    )
    variables = module.init(jax.random.key(3), x, train=False)
    ids, scores, boxes = ssd_forward_and_postprocess(
        module, variables, x,
        SSDNMSConfig(backend="xla", topk=128, post_nms=32, valid_thresh=0.001),
    )
    return np.asarray(ids), np.asarray(scores), np.asarray(boxes)


def compute_frcnn_detections():
    """FRCNN r50-FPN @128 f32 (reduced counts): pins RPN decode + proposal
    NMS + ROIAlign + per-class decode/NMS."""
    import dataclasses

    from viddet_tpu.models import faster_rcnn as F

    cfg = F.FRCNNConfig(
        rpn_pre_nms_topk=64, rpn_nms_input=128, rpn_post_nms_train=64,
        rpn_post_nms_test=32, rpn_batch=64, roi_batch=64, nms_backend="xla",
    )
    module = F.FasterRCNN(num_classes=4, config=cfg, policy=FLOAT32_POLICY)
    x = jnp.asarray(
        np.random.default_rng(66).uniform(0, 1, (1, 128, 128, 3)), jnp.float32
    )
    variables = module.init(
        {"params": jax.random.key(4), "sampling": jax.random.key(5)},
        x, train=False,
    )
    ids, scores, boxes = F.frcnn_forward_and_postprocess(
        module, variables, x, backend="xla", topk=64, post_nms=16
    )
    return np.asarray(ids), np.asarray(scores), np.asarray(boxes)


def _assert_matches(fixture, ids, scores, boxes):
    assert os.path.exists(fixture), f"{fixture} missing — run regenerate"
    with np.load(fixture) as data:
        np.testing.assert_array_equal(ids, data["ids"])
        np.testing.assert_allclose(scores, data["scores"], rtol=0, atol=1e-6)
        np.testing.assert_allclose(boxes, data["boxes"], rtol=0, atol=1e-4)


@pytest.mark.slow
def test_ssd_matches_golden():
    _assert_matches(SSD_FIXTURE, *compute_ssd_detections())


@pytest.mark.slow
def test_frcnn_matches_golden():
    _assert_matches(FRCNN_FIXTURE, *compute_frcnn_detections())


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        # sitecustomize forces JAX_PLATFORMS=axon; only the config update
        # reliably pins CPU (see .claude/skills/verify/SKILL.md)
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu" and jax.device_count() == 8, (
            "regenerate under the test env: "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu"
        )
        ids, scores, boxes = compute_detections()
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, ids=ids, scores=scores, boxes=boxes)
        kept = int((ids >= 0).sum())
        print(f"wrote {FIXTURE} ({kept} kept detections)")
        ids, scores, boxes = compute_flagship_detections("xla")
        np.savez(FLAGSHIP_FIXTURE, ids=ids, scores=scores, boxes=boxes)
        kept = int((ids >= 0).sum())
        print(f"wrote {FLAGSHIP_FIXTURE} ({kept} kept detections)")
        for fixture, fn in ((SSD_FIXTURE, compute_ssd_detections),
                            (FRCNN_FIXTURE, compute_frcnn_detections)):
            ids, scores, boxes = fn()
            np.savez(fixture, ids=ids, scores=scores, boxes=boxes)
            print(f"wrote {fixture} ({int((ids >= 0).sum())} kept detections)")
