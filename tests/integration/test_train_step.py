import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.models.yolo3 import YOLOv3
from viddet_tpu.train.loop import make_train_step
from viddet_tpu.train.state import TrainState, make_optimizer, make_lr_schedule


import functools


@functools.lru_cache(maxsize=None)
def _shared(num_classes=3, size=64, lr=1e-3):
    """One module init + ONE jitted step per (classes, size, lr) for the
    whole module: the jit cache keys on the step closure AND the state's
    static tx (optax instances compare by identity), so tests that rebuilt
    both paid a fresh ~10s CPU compile each."""
    module = YOLOv3(num_classes=num_classes, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=True)
    tx = make_optimizer(make_lr_schedule(lr, steps_per_epoch=1), weight_decay=0.0)
    step = make_train_step(
        module,
        strides=(32, 16),
        anchors=(((40, 40), (24, 48), (48, 24)), ((10, 10), (16, 8), (8, 16))),
        num_classes=num_classes,
    )
    return module, variables, tx, step


def tiny_setup(num_classes=3, size=64, lr=1e-3):
    module, variables, tx, step = _shared(num_classes, size, lr)
    state = TrainState.create(
        params=jax.tree.map(jnp.copy, variables["params"]),
        batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        tx=tx,
    )
    return module, state, step


def make_batch(rng, size=64, num_classes=3, batch=2, max_gt=4):
    images = jnp.asarray(rng.uniform(0, 1, size=(batch, size, size, 3)), jnp.float32)
    gt_boxes = -np.ones((batch, max_gt, 4), np.float32)
    gt_ids = -np.ones((batch, max_gt), np.int32)
    gt_boxes[:, 0] = [10, 12, 44, 50]
    gt_ids[:, 0] = 1
    gt_boxes[:, 1] = [40, 8, 56, 20]
    gt_ids[:, 1] = 2
    return images, jnp.asarray(gt_boxes), jnp.asarray(gt_ids)


def test_one_step_runs_and_updates():
    module, state, step = tiny_setup()
    images, gt_boxes, gt_ids = make_batch(np.random.default_rng(0))
    p0 = jax.device_get(jax.tree.leaves(state.params)[0])
    state, losses = step(state, images, gt_boxes, gt_ids)
    for name, value in losses.items():
        assert np.isfinite(float(value)), name
    assert int(state.step) == 1
    p1 = jax.device_get(jax.tree.leaves(state.params)[0])
    assert not np.allclose(p0, p1)


def test_loss_decreases_overfit():
    module, state, step = tiny_setup(lr=5e-4)
    images, gt_boxes, gt_ids = make_batch(np.random.default_rng(1))
    first = None
    for i in range(30):
        state, losses = step(state, images, gt_boxes, gt_ids)
        if first is None:
            first = float(losses["total"])
    last = float(losses["total"])
    assert last < 0.5 * first, (first, last)


def test_uint8_batch_matches_host_normalized():
    """A raw uint8 batch (the device-normalize loader path) must produce
    the same losses as the same batch normalized on the host — up to the
    1-ulp input difference (XLA may rewrite /255 as a reciprocal
    multiply)."""
    from viddet_tpu.data.transforms import normalize

    # two identically-seeded setups: train_step donates its state, so the
    # same state object cannot be stepped twice
    _, state_a, step = tiny_setup()
    _, state_b, _ = tiny_setup()
    rng = np.random.default_rng(7)
    u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    _, gt_boxes, gt_ids = make_batch(rng)

    _, losses_u8 = step(state_a, jnp.asarray(u8), gt_boxes, gt_ids)
    _, losses_f32 = step(state_b, jnp.asarray(normalize(u8)), gt_boxes, gt_ids)
    for name in losses_f32:
        np.testing.assert_allclose(
            float(losses_u8[name]), float(losses_f32[name]),
            rtol=1e-4, err_msg=name,
        )
