"""Deployment-export gates (viddet_tpu/infer/export.py).

The contract under test: a saved artifact (a) reproduces the live
jitted predictor's detections — ids exact, scores/boxes at float
tolerance (recompiling a serialized module is a different XLA
compilation; last-ulp drift measured on CPU) — and is bitwise
reproducible across processes for one serialized program, (b) is
batch-polymorphic when exported with a symbolic batch, (c) is callable
from a process that imports ONLY jax — no viddet_tpu on the path — and
(d) refuses unsound platform/kernel combinations instead of emitting a
broken artifact.
"""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.infer.export import (
    ExportSpec,
    build_infer_fn,
    export_predictor,
    load_artifact,
    save_artifact,
)

SPEC = ExportSpec(
    image_size=64, batch=None, input_dtype="uint8", platforms=("cpu",),
    nms_backend="xla", topk=32, post_nms=8,
)


def _tiny_yolo():
    from viddet_tpu.models.yolo3 import YOLOv3

    module = YOLOv3(num_classes=2, backbone="tiny", policy=FLOAT32_POLICY)
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    return module, variables


def test_roundtrip_and_batch_polymorphic(tmp_path):
    module, variables = _tiny_yolo()
    exported = export_predictor(module, variables, SPEC)
    path = str(tmp_path / "tiny.shlo")
    save_artifact(exported, path, meta={"model": "tiny-test"})

    art = load_artifact(path)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)

    infer = jax.jit(build_infer_fn(module, SPEC))
    want = infer(variables, frames)
    got = art.call(frames)
    # Recompiling the serialized module is a DIFFERENT XLA compilation
    # than the live jit (measured: last-ulp score drift on CPU), so the
    # cross-compilation contract is detection identity — same candidates
    # selected, same classes, same ranking — with scores/boxes at float
    # tolerance.  Bitwise identity holds within one serialized program
    # (test_artifact_runs_without_framework).
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    for w, g in zip(want[1:], got[1:]):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), rtol=2e-5, atol=1e-4
        )

    # symbolic batch: the same artifact serves any leading dim
    ids1, sc1, bx1 = art.call(frames[:1])
    assert ids1.shape[0] == 1 and bx1.shape == (1, 8, 4)
    # and the sidecar documents the contract
    sidecar = (tmp_path / "tiny.shlo.json").read_text()
    assert "tiny-test" in sidecar and "cpu" in sidecar


def test_artifact_runs_without_framework(tmp_path):
    """Deployment processes need only jax: deserialize + call in a
    subprocess whose code never imports viddet_tpu."""
    module, variables = _tiny_yolo()
    spec = ExportSpec(
        image_size=64, batch=1, input_dtype="uint8", platforms=("cpu",),
        nms_backend="xla", topk=32, post_nms=8,
    )
    path = str(tmp_path / "tiny_static.shlo")
    save_artifact(export_predictor(module, variables, spec), path)

    frames = np.zeros((1, 64, 64, 3), np.uint8)
    # in-process artifact run = the reference values: one serialized
    # program must be bitwise reproducible across processes
    want = [np.asarray(a) for a in load_artifact(path).call(frames)]

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"  # sitecustomize forces axon
        "import numpy as np\n"
        "from jax import export\n"
        f"art = export.deserialize(open({path!r}, 'rb').read())\n"
        "ids, sc, bx = art.call(np.zeros((1, 64, 64, 3), np.uint8))\n"
        "print(float(np.asarray(sc).sum()), float(np.asarray(bx).sum()))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, check=True,
    )
    sc_sum, bx_sum = (float(v) for v in out.stdout.split())
    assert sc_sum == pytest.approx(float(want[1].sum()), abs=0)
    assert bx_sum == pytest.approx(float(want[2].sum()), abs=0)


@pytest.mark.slow
def test_ssd_export_roundtrip(tmp_path):
    # slow: second family's export compile (~26s); the core contract is
    # already pinned by the YOLO gates above
    from viddet_tpu.models.ssd import SSD

    module = SSD(
        num_classes=3, image_size=64, policy=FLOAT32_POLICY,
        backbone_blocks=(1, 1, 1, 1), backbone_widths=(8, 16, 32, 64),
    )
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    spec = ExportSpec(
        image_size=64, batch=2, input_dtype="float32", platforms=("cpu",),
        nms_backend="xla", topk=16, post_nms=4,
    )
    path = str(tmp_path / "ssd.shlo")
    save_artifact(export_predictor(module, variables, spec), path)
    art = load_artifact(path)

    frames = np.random.default_rng(1).random((2, 64, 64, 3), np.float32)
    infer = jax.jit(build_infer_fn(module, spec))
    want = infer(variables, frames)
    got = art.call(frames)
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    for w, g in zip(want[1:], got[1:]):
        np.testing.assert_allclose(
            np.asarray(w), np.asarray(g), rtol=2e-5, atol=1e-4
        )


def test_pallas_backend_requires_tpu_only_platforms():
    spec = ExportSpec(platforms=("cpu", "tpu"), nms_backend="pallas")
    with pytest.raises(ValueError, match="pallas"):
        spec.validate()
    # tpu-only is accepted (lowering itself is covered by the on-chip
    # parity ladder, tools/tpu_parity_check.py)
    ExportSpec(platforms=("tpu",), nms_backend="pallas").validate()


def test_export_cli_writes_artifact(tmp_path, monkeypatch):
    """CLI end-to-end on the tiny registered model: artifact + sidecar."""
    from viddet_tpu.cli import export_model

    out = str(tmp_path / "cli.shlo")
    export_model.main([
        "--network", "yolo3_tiny_darknet", "--dataset", "voc",
        "--image-size", "64", "--batch", "1", "--platforms", "cpu",
        "--topk", "16", "--post-nms", "4", "--out", out,
    ])
    art = load_artifact(out)
    ids, sc, bx = art.call(np.zeros((1, 64, 64, 3), np.uint8))
    assert bx.shape == (1, 4, 4)
    assert (tmp_path / "cli.shlo.json").exists()


@pytest.mark.slow
def test_savedmodel_matches_artifact(tmp_path):
    """jax2tf SavedModel computes the same function (same StableHLO)."""
    tf = pytest.importorskip("tensorflow")
    from viddet_tpu.infer.export import export_savedmodel

    module, variables = _tiny_yolo()
    spec = ExportSpec(
        image_size=64, batch=1, input_dtype="uint8", platforms=("cpu",),
        nms_backend="xla", topk=32, post_nms=8,
    )
    sm_dir = str(tmp_path / "savedmodel")
    export_savedmodel(module, variables, sm_dir, spec)

    frames = np.random.default_rng(2).integers(0, 256, (1, 64, 64, 3), np.uint8)
    infer = jax.jit(build_infer_fn(module, spec))
    want = [np.asarray(a) for a in infer(variables, frames)]

    loaded = tf.saved_model.load(sm_dir)
    got = loaded.signatures["serving_default"](images=tf.constant(frames))
    # signature outputs keep function order as output_0/1/2; TF-side XLA
    # recompiles the embedded module, so same contract as the artifact
    # roundtrip gate: ids exact, floats to tolerance
    np.testing.assert_array_equal(want[0], np.asarray(got["output_0"]))
    for i, w in enumerate(want[1:], start=1):
        np.testing.assert_allclose(
            w, np.asarray(got[f"output_{i}"]), rtol=2e-5, atol=1e-4
        )
