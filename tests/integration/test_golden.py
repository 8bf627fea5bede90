"""Golden-detection regression test (self-referential bit-for-bit gate).

The BASELINE.json contract is bit-for-bit detections at fixed weights; the
reference weights are unobtainable (SURVEY.md §0), so this pins OUR OWN
pipeline instead: a fixed-seed tiny model's detections on a fixed input are
committed as a fixture, and every future change to the decode / top-k / NMS
path must reproduce them exactly (CPU, float32).  If a change breaks this
test intentionally (e.g. a semantics fix), regenerate with:

  python tests/integration/test_golden.py regenerate
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.models.yolo3 import NMSConfig, YOLOv3, forward_and_postprocess

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "golden_dets.npz")


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


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        ids, scores, boxes = compute_detections()
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez(FIXTURE, ids=ids, scores=scores, boxes=boxes)
        kept = int((ids >= 0).sum())
        print(f"wrote {FIXTURE} ({kept} kept detections)")
