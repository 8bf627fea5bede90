"""Checkpoint/resume behavior (SURVEY.md §5.3-5.4).

The rebuild's contract is stronger than the reference's: Orbax checkpoints
restore the FULL TrainState (params + batch stats + optimizer momentum +
step), so resume continues bit-identically — verified here by comparing a
continuous 4-step run against 2 steps + save/restore + 2 steps.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.models.yolo3 import YOLOv3
from viddet_tpu.train.loop import make_train_step
from viddet_tpu.train.state import (
    TrainState,
    latest_checkpoint,
    load_weights_npz,
    make_lr_schedule,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
    save_weights_npz,
)

ANCHORS = (((40, 40), (24, 48), (48, 24)), ((10, 10), (16, 8), (8, 16)))


import functools


@functools.lru_cache(maxsize=1)
def _shared():
    """One model init + ONE jitted train step for the whole module.

    Resume bit-identity is a property of the STATE contents, not of the
    executable's identity, so every test can reuse the same compiled step
    (three separate make_train_step compiles cost ~40s on 1 CPU core).
    """
    module = YOLOv3(num_classes=2, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=True)
    tx = make_optimizer(make_lr_schedule(1e-3, 1), weight_decay=0.0)
    step = make_train_step(module, strides=(32, 16), anchors=ANCHORS, num_classes=2)
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 48.0]]] * 2)
    gt_ids = jnp.asarray([[1]] * 2, jnp.int32)
    return module, variables, tx, step, (x, gt_boxes, gt_ids)


def setup():
    """Fresh state (copied leaves) over the shared module/step/batch."""
    module, variables, tx, step, batch = _shared()
    state = TrainState.create(
        params=jax.tree.map(jnp.copy, variables["params"]),
        batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        tx=tx,
    )
    return module, state, step, batch


def leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_orbax_resume_bit_identical(tmp_path):
    _, state, step, batch = setup()

    # continuous run: 4 steps
    s_cont = state
    for _ in range(4):
        s_cont, _ = step(s_cont, *batch)

    # interrupted run: 2 steps, save, restore into a FRESH state, 2 more
    _, s_b, step2, _ = setup()
    for _ in range(2):
        s_b, _ = step2(s_b, *batch)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, s_b, int(s_b.step))
    path = latest_checkpoint(ckpt_dir)
    assert path is not None

    _, s_fresh, step3, _ = setup()
    s_restored = restore_checkpoint(path, s_fresh)
    assert int(s_restored.step) == 2
    for _ in range(2):
        s_restored, _ = step3(s_restored, *batch)

    for a, b in zip(leaves(s_cont.params), leaves(s_restored.params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(leaves(s_cont.opt_state), leaves(s_restored.opt_state)):
        np.testing.assert_array_equal(a, b)


def test_npz_weights_roundtrip(tmp_path):
    _, state, step, batch = setup()
    state, _ = step(state, *batch)
    path = str(tmp_path / "w.npz")
    save_weights_npz(path, state.params, state.batch_stats)
    params, batch_stats = load_weights_npz(path)
    for a, b in zip(leaves(state.params), leaves(params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(leaves(state.batch_stats), leaves(batch_stats)):
        np.testing.assert_array_equal(a, b)
    # schema: flat keys, params/ and batch_stats/ groups
    with np.load(path) as data:
        keys = data.files
    assert any(k.startswith("params/") for k in keys)
    assert any(k.startswith("batch_stats/") for k in keys)
