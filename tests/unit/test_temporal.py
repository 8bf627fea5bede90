import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.data.clip_transforms import ClipTrainTransform, ClipValTransform
from viddet_tpu.models.temporal import TemporalYOLOv3
from viddet_tpu.models.yolo3 import NMSConfig, forward_and_postprocess


@pytest.mark.parametrize("aggregation", ["stack", "max", "mean", "conv"])
def test_temporal_forward_shapes(aggregation):
    module = TemporalYOLOv3(
        num_classes=3, k=3, backbone="tiny", aggregation=aggregation,
        policy=FLOAT32_POLICY,
    )
    clips = jnp.zeros((2, 3, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.key(0), clips, train=False)
    out = module.apply(variables, clips, train=False)
    n = (2 * 2 + 4 * 4) * 3  # two scales at 64px
    assert out["boxes"].shape == (2, n, 4)
    assert out["raw_cls"].shape == (2, n, 3)
    ids, scores, boxes = forward_and_postprocess(
        module, variables, clips, NMSConfig(backend="xla", topk=32, post_nms=8)
    )
    assert ids.shape == (2, 8)


def test_temporal_train_gradients_flow():
    module = TemporalYOLOv3(
        num_classes=2, k=3, backbone="tiny", aggregation="mean",
        policy=FLOAT32_POLICY,
    )
    clips = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 3, 64, 64, 3)), jnp.float32
    )
    variables = module.init(jax.random.key(0), clips, train=True)
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 48.0]], [[10.0, 10.0, 30.0, 30.0]]])
    gt_ids = jnp.asarray([[0], [1]], jnp.int32)
    # image_size for target assignment comes from images.shape[1:3]; for
    # clips that is (k, H) — so the train step must be built on the clip
    # model's spatial dims. Use the loss path directly to verify gradients.
    from viddet_tpu.train.losses import yolo_loss

    def loss_fn(params):
        out = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            clips, train=False,
        )
        return yolo_loss(
            out, gt_boxes, gt_ids, None,
            image_size=(64, 64),
            strides=(32, 16),
            anchors=(((40, 40), (24, 48), (48, 24)), ((10, 10), (16, 8), (8, 16))),
            num_classes=2,
        )["total"]

    # jitted: eager op-by-op reverse-mode over the clip backbone costs
    # ~20s of dispatch on 1 CPU core; one compile is ~3x faster
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_clip_transforms_consistent_geometry():
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, (3, 80, 100, 3)).astype(np.uint8)
    # make frames identical so identical geometry => identical outputs
    clip[1] = clip[0]
    clip[2] = clip[0]
    label = np.array([[10.0, 10.0, 60.0, 70.0, 1.0, 0.0]])
    tf = ClipTrainTransform(size=(64, 64))
    out, lab = tf(clip, label, np.random.default_rng(7))
    assert out.shape == (3, 64, 64, 3)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0], out[2])

    vt = ClipValTransform(size=(48, 48), letterbox_resize=True)
    vout, vlab, affine = vt(clip, label)
    assert vout.shape == (3, 48, 48, 3)
    assert affine is not None
