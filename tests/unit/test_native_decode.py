"""Native C++ decode library vs the cv2/numpy oracle path."""

import os

import cv2
import numpy as np
import pytest

from viddet_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.build_error()}"
)


def smooth_image(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 127 / (h + w)], -1
    ).astype(np.uint8)
    return img


@pytest.fixture
def jpegs(tmp_path):
    paths = []
    for i, (h, w) in enumerate([(120, 200), (240, 180), (64, 64)]):
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(
            p, cv2.cvtColor(smooth_image(h, w, i), cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 100],
        )
        paths.append(p)
    return paths


def test_batch_decode_matches_cv2_path(jpegs):
    from viddet_tpu.data.transforms import letterbox, normalize

    out, affines, orig = native.decode_jpeg_batch(jpegs, (128, 128), letterbox=True)
    assert out.shape == (3, 128, 128, 3)
    for i, p in enumerate(jpegs):
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        assert tuple(orig[i]) == img.shape[:2]
        ref, ref_aff = letterbox(img, (128, 128), pad_value=128)
        ref = normalize(ref)
        assert np.abs(ref - out[i]).mean() < 0.05
        np.testing.assert_allclose(affines[i], ref_aff, atol=1.0)


def test_batch_decode_failed_slot(jpegs, tmp_path):
    bad = str(tmp_path / "missing.jpg")
    out, affines, orig = native.decode_jpeg_batch(
        [jpegs[0], bad], (64, 64), letterbox=False
    )
    assert tuple(orig[1]) == (0, 0)
    assert np.all(out[1] == 0)


def test_video_stream(tmp_path):
    path = str(tmp_path / "v.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (160, 120))
    for t in range(12):
        vw.write(np.full((120, 160, 3), min(t * 20, 255), np.uint8))
    vw.release()

    vs = native.NativeVideoStream(path, (96, 96), every=3)
    assert (vs.width, vs.height) == (160, 120)
    frames = list(vs)
    assert [f[0] for f in frames] == [0, 3, 6, 9]
    idx, frame, affine = frames[2]
    assert frame.shape == (96, 96, 3)
    # frame 6 is uniform gray 120: check the center (non-letterbox-pad) region
    from viddet_tpu.data.transforms import normalize

    want = normalize(np.full((1, 1, 3), 120, np.uint8))[0, 0]
    np.testing.assert_allclose(frame[48, 48], want, atol=0.15)
    vs.close()


def test_batch_decode_u8_mode(jpegs):
    """normalize=False emits raw uint8 frames whose device-side
    normalization lands on the f32 path's values (within the uint8
    rounding quantum), with identical affines."""
    from viddet_tpu.data.transforms import normalize

    out_f, aff_f, orig_f = native.decode_jpeg_batch(
        jpegs, (128, 128), letterbox=True
    )
    out_u, aff_u, orig_u = native.decode_jpeg_batch(
        jpegs, (128, 128), letterbox=True, normalize=False
    )
    assert out_u.dtype == np.uint8 and out_u.shape == out_f.shape
    np.testing.assert_array_equal(aff_u, aff_f)
    np.testing.assert_array_equal(orig_u, orig_f)
    # normalize(u8) vs fused-f32: differ only by the ~0.5/255 rounding
    # quantum divided by the smallest std
    assert np.abs(normalize(out_u) - out_f).max() <= (0.52 / 255.0) / 0.224


def test_video_stream_u8_mode(tmp_path):
    import cv2 as _cv2

    path = str(tmp_path / "v.mp4")
    vw = _cv2.VideoWriter(
        path, _cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
    )
    for i in range(6):
        vw.write(np.full((48, 64, 3), 20 * i + 10, np.uint8))
    vw.release()

    f32 = {
        idx: (img, aff)
        for idx, img, aff in native.NativeVideoStream(path, (32, 32))
    }
    u8s = native.NativeVideoStream(path, (32, 32), normalize=False)
    n = 0
    from viddet_tpu.data.transforms import normalize

    for idx, img, aff in u8s:
        assert img.dtype == np.uint8
        ref_img, ref_aff = f32[idx]
        np.testing.assert_array_equal(aff, ref_aff)
        assert np.abs(normalize(img) - ref_img).max() <= (0.52 / 255.0) / 0.224
        n += 1
    assert n == len(f32) == 6


def test_predictor_ingraph_normalize_matches_host():
    """make_predictor's in-graph uint8 normalize must match
    data.transforms.normalize to within 1 ulp on the same uint8 input
    (same f32 expression; XLA may rewrite /255 as a reciprocal multiply,
    so exact bit-equality is not guaranteed)."""
    import jax
    import jax.numpy as jnp

    from viddet_tpu.data.transforms import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        normalize,
    )

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def dev_norm(x):
        return (x.astype(jnp.float32) / 255.0 - mean) / std

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (2, 16, 16, 3)).astype(np.uint8)
    np.testing.assert_allclose(
        np.asarray(dev_norm(x)), normalize(x), rtol=2e-7, atol=2e-7
    )
