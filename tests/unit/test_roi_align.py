import jax.numpy as jnp
import numpy as np

from viddet_tpu.ops.roi_align import fpn_roi_level, multilevel_roi_align, roi_align


def test_constant_region_pools_constant():
    feat = jnp.full((16, 16, 3), 5.0)
    rois = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])  # image coords, stride 4
    out = roi_align(feat, rois, spatial_scale=0.25, output_size=7)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_linear_gradient_exact():
    # f(y, x) = x: bilinear interp of a linear function is exact
    x = np.arange(32, dtype=np.float32)
    feat = np.broadcast_to(x[None, :, None], (32, 32, 1)).copy()
    rois = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])  # stride 1
    out = np.asarray(roi_align(jnp.asarray(feat), rois, 1.0, output_size=4, sampling_ratio=2))
    # bin centers along x: 4 + (i + 0.5) * 2 for bins of width 2
    want = 4 + (np.arange(4) + 0.5) * 2
    np.testing.assert_allclose(out[0, 0, :, 0], want, atol=1e-4)
    # constant along y
    np.testing.assert_allclose(out[0][:, 1, 0], out[0][0, 1, 0], atol=1e-4)


def test_out_of_bounds_contributes_zero():
    feat = jnp.ones((8, 8, 1))
    rois = jnp.asarray([[-100.0, -100.0, -50.0, -50.0]])  # fully outside
    out = np.asarray(roi_align(feat, rois, 1.0, output_size=2))
    np.testing.assert_allclose(out, 0.0)


def test_fpn_level_assignment():
    rois = jnp.asarray(
        [
            [0, 0, 56, 56],     # sqrt(wh)=56  -> 4 + log2(0.25) = 2
            [0, 0, 224, 224],   # -> 4
            [0, 0, 448, 448],   # -> 5
            [0, 0, 1000, 1000], # -> clipped 5
            [0, 0, 10, 10],     # -> clipped 2
        ],
        jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(fpn_roi_level(rois)), [2, 4, 5, 5, 2])


def test_multilevel_matches_single_level():
    rng = np.random.default_rng(0)
    # two-level pyramid; roi sized to map to level 2 (stride 4)
    p2 = jnp.asarray(rng.uniform(size=(32, 32, 2)).astype(np.float32))
    p3 = jnp.asarray(rng.uniform(size=(16, 16, 2)).astype(np.float32))
    rois = jnp.asarray([[8.0, 8.0, 64.0, 64.0]])  # sqrt(wh)=56 -> level 2
    got = multilevel_roi_align([p2, p3], rois, strides=[4, 8], k_min=2)
    want = roi_align(p2, rois, 0.25)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_packed_matches_masked_multilevel():
    from viddet_tpu.ops.roi_align import multilevel_roi_align_packed

    rng = np.random.default_rng(1)
    pyramid = [
        jnp.asarray(rng.uniform(size=(64, 64, 8)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(32, 32, 8)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(16, 16, 8)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(8, 8, 8)).astype(np.float32)),
    ]
    strides = [4, 8, 16, 32]
    pts = rng.uniform(0, 250, size=(24, 2, 2)).astype(np.float32)
    rois = jnp.asarray(
        np.concatenate([pts.min(1), pts.max(1) + 8.0], axis=-1)
    )
    want = multilevel_roi_align(pyramid, rois, strides, k_min=2)
    got = multilevel_roi_align_packed(pyramid, rois, strides, k_min=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


# ---------------------------------------------------------------------------
# Pallas kernel (interpret mode on CPU) vs the jnp packed oracle
# ---------------------------------------------------------------------------


def _random_pyramid_and_rois(seed, b=2, c=8, image=128, r=24, max_aspect=2.5):
    rng = np.random.default_rng(seed)
    shapes = [(image // s, image // s) for s in (4, 8, 16, 32)]
    pyramid = [
        jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        for h, w in shapes
    ]
    # sizes spanning every FPN level, aspects within the kernel's exact
    # domain (module docstring), positions anywhere in the image
    size = rng.uniform(8, image * 0.9, size=(b, r))
    aspect = rng.uniform(1.0 / max_aspect, max_aspect, size=(b, r))
    w_box = size * np.sqrt(aspect)
    h_box = size / np.sqrt(aspect)
    cx = rng.uniform(0, image, size=(b, r))
    cy = rng.uniform(0, image, size=(b, r))
    rois = np.stack(
        [cx - w_box / 2, cy - h_box / 2, cx + w_box / 2, cy + h_box / 2], axis=-1
    )
    return pyramid, jnp.asarray(np.clip(rois, 0, image).astype(np.float32))


def test_pallas_matches_packed_oracle():
    import jax

    from viddet_tpu.ops.roi_align import multilevel_roi_align_packed
    from viddet_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    pyramid, rois = _random_pyramid_and_rois(0)
    got = multilevel_roi_align_pallas(
        pyramid, rois, strides=(4, 8, 16, 32), interpret=True
    )
    want = jax.vmap(
        lambda maps, boxes: multilevel_roi_align_packed(
            maps, boxes, strides=(4, 8, 16, 32)
        ),
        in_axes=(0, 0),
    )(pyramid, rois)
    assert got.shape == want.shape == (2, 24, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pallas_out_of_image_rois_match():
    """Rois poking outside the image: invalid samples contribute zero in
    both implementations."""
    import jax

    from viddet_tpu.ops.roi_align import multilevel_roi_align_packed
    from viddet_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas

    pyramid, _ = _random_pyramid_and_rois(1, b=1, r=4)
    rois = jnp.asarray(
        [[[-20.0, -10.0, 40.0, 30.0], [100.0, 100.0, 160.0, 150.0],
          [0.0, 0.0, 127.0, 127.0], [60.0, -5.0, 90.0, 20.0]]]
    )
    got = multilevel_roi_align_pallas(
        pyramid, rois, strides=(4, 8, 16, 32), interpret=True
    )
    want = jax.vmap(
        lambda maps, boxes: multilevel_roi_align_packed(
            maps, boxes, strides=(4, 8, 16, 32)
        ),
        in_axes=(0, 0),
    )(pyramid, rois)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pallas_auto_dispatch():
    from viddet_tpu.ops.roi_align_pallas import multilevel_roi_align_auto

    pyramid, rois = _random_pyramid_and_rois(2, b=1, r=4)
    a = multilevel_roi_align_auto(pyramid, rois, strides=(4, 8, 16, 32),
                                  backend="xla")
    b = multilevel_roi_align_auto(pyramid, rois, strides=(4, 8, 16, 32),
                                  backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
