"""Data-parallel correctness on the fake 8-device CPU backend.

The reference tests DP implicitly via single-process multi-GPU (SURVEY.md
§6); our equivalent: the SAME jitted train step run (a) on one device and
(b) with the batch sharded over an 8-device mesh must produce identical
updated parameters — proving XLA's inserted gradient all-reduce matches the
serial computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.models.yolo3 import YOLOv3
from viddet_tpu.parallel.mesh import make_mesh, put_batch, replicate
from viddet_tpu.train.loop import make_train_step
from viddet_tpu.train.state import TrainState, make_lr_schedule, make_optimizer


def _yolo_setup():
    module = YOLOv3(num_classes=3, backbone="tiny", policy=FLOAT32_POLICY)
    size, batch = 64, 8
    x_init = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x_init, train=True)
    tx = make_optimizer(make_lr_schedule(1e-3, 1), weight_decay=0.0)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)), jnp.float32)
    gt_boxes = jnp.asarray(
        np.tile(np.array([[[8.0, 8.0, 40.0, 48.0], [30.0, 5.0, 60.0, 30.0]]]), (batch, 1, 1))
    )
    gt_ids = jnp.asarray(np.tile(np.array([[0, 2]]), (batch, 1)).astype(np.int32))

    step = make_train_step(
        module,
        strides=(32, 16),
        anchors=(((40, 40), (24, 48), (48, 24)), ((10, 10), (16, 8), (8, 16))),
        num_classes=3,
    )

    def fresh_state():
        return TrainState.create(
            params=jax.tree.map(jnp.copy, variables["params"]),
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            tx=tx,
        )

    return step, fresh_state, (images, gt_boxes, gt_ids)


def test_yolo_step_contains_allreduce():
    """Fast-suite DP gate: the GSPMD-partitioned train step must carry a
    cross-device all-reduce (the KVStore/NCCL equivalent).  Same
    compile-gate/slow-equality-twin split as the SSD/FRCNN families:
    sharded-step EXECUTION runs every driver round via dryrun_multichip,
    and the exact-equality twin below runs in `make test`."""
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    step, fresh_state, batch = _yolo_setup()
    # 2-device submesh: the all-reduce assertion is axis-size-agnostic and
    # the SPMD-partition compile cost scales with the partition count (see
    # _gate_mesh in test_data_parallel_families.py); full 8-device
    # execution is the slow twin + the driver's dryrun_multichip.
    mesh = make_mesh(jax.devices()[:2])
    state = jax.tree.map(lambda x: jax.device_put(x, replicate(mesh)), fresh_state())
    sharded = put_batch(batch, mesh)
    hlo = step.lower(state, *sharded).compile().as_text()
    assert "all-reduce" in hlo, "no cross-device reduction in the DP step"


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """slow: two tiny-YOLO train-step compiles on the 8-device CPU mesh
    (~60s on 1 core); the fast suite keeps the compile-gate above."""
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    step, fresh_state, (images, gt_boxes, gt_ids) = _yolo_setup()

    # (a) single device
    state_a, losses_a = step(fresh_state(), images, gt_boxes, gt_ids)

    # (b) batch sharded over the 8-device data mesh, state replicated.
    mesh = make_mesh()
    rep = replicate(mesh)
    state_b = jax.tree.map(lambda x: jax.device_put(x, rep), fresh_state())
    sharded = put_batch((images, gt_boxes, gt_ids), mesh)
    state_b, losses_b = step(state_b, *sharded)

    np.testing.assert_allclose(
        float(losses_a["total"]), float(losses_b["total"]), rtol=1e-5
    )
    # fp32 reduction order differs between the sharded (hierarchical psum)
    # and single-device (sequential) sums; allow that noise and nothing more.
    for pa, pb in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=1e-3, atol=2e-5
        )


def test_sharded_eval_matches_single_device():
    """Batch-sharded inference (the evaluate CLI's multi-chip path) must
    produce the same detections as default placement."""
    from viddet_tpu.models.yolo3 import NMSConfig, forward_and_postprocess

    module = YOLOv3(num_classes=3, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (8, 64, 64, 3)), jnp.float32
    )
    variables = module.init(jax.random.key(0), x, train=False)
    nms = NMSConfig(backend="xla", topk=64, post_nms=16, valid_thresh=0.001)

    @jax.jit
    def infer(variables, images):
        return forward_and_postprocess(module, variables, images, nms)

    single = infer(variables, x)

    mesh = make_mesh()
    vr = jax.device_put(variables, replicate(mesh))
    sharded = infer(vr, put_batch(x, mesh))
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )
