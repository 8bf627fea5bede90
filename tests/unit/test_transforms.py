import numpy as np

from viddet_tpu.data import transforms as T


def make_image(h=100, w=150):
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def test_letterbox_geometry():
    img = make_image(100, 200)
    out, affine = T.letterbox(img, (64, 64), pad_value=77)
    assert out.shape == (64, 64, 3)
    s, _, dx, dy = affine
    assert abs(s - 64 / 200) < 1e-6
    # vertical padding: scaled height = 32 -> 16px pad top and bottom
    assert dy == 16 and dx == 0
    assert (out[:16] == 77).all() and (out[-16:] == 77).all()


def test_letterbox_box_roundtrip():
    img = make_image(100, 200)
    _, affine = T.letterbox(img, (64, 64))
    boxes = np.array([[10.0, 20.0, 110.0, 80.0, 3.0, 0.0]])
    mapped = T.apply_affine_to_boxes(boxes, affine)
    back = T.invert_affine_to_boxes(mapped[:, :4], affine)
    np.testing.assert_allclose(back, boxes[:, :4], atol=1e-4)


def test_affine_preserves_padding_rows():
    boxes = np.array([[10.0, 10.0, 20.0, 20.0, 1, 0], [-1, -1, -1, -1, -1, -1]])
    mapped = T.apply_affine_to_boxes(boxes, np.array([2.0, 2.0, 5.0, 5.0]))
    assert (mapped[1] == -1).all()
    assert mapped[0, 0] == 25.0


def test_train_transform_deterministic_under_seed():
    img = make_image()
    label = np.array([[10.0, 10.0, 60.0, 80.0, 2.0, 0.0]])
    tf = T.TrainTransform(size=(64, 64))
    out1, lab1 = tf(img, label.copy(), np.random.default_rng(42))
    out2, lab2 = tf(img, label.copy(), np.random.default_rng(42))
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(lab1, lab2)
    out3, _ = tf(img, label.copy(), np.random.default_rng(43))
    assert not np.array_equal(out1, out3)


def test_train_transform_output_shape_and_range():
    img = make_image()
    label = np.array([[10.0, 10.0, 60.0, 80.0, 2.0, 0.0]])
    tf = T.TrainTransform(size=(96, 64))
    for seed in range(5):
        out, lab = tf(img, label.copy(), np.random.default_rng(seed))
        assert out.shape == (96, 64, 3)
        assert out.dtype == np.float32
        valid = lab[(lab[:, 4] >= 0)]
        if len(valid):
            assert (valid[:, 0] <= valid[:, 2]).all()
            assert (valid[:, [0, 2]] <= 64 + 1e-3).all()
            assert (valid[:, [1, 3]] <= 96 + 1e-3).all()


def test_val_transform():
    img = make_image()
    label = np.array([[10.0, 10.0, 60.0, 80.0, 2.0, 0.0]])
    tf = T.ValTransform(size=(64, 64), letterbox_resize=True)
    out, lab, affine = tf(img, label)
    assert out.shape == (64, 64, 3)
    assert affine.shape == (4,)


def test_hflip_boxes():
    img = make_image(10, 100)
    boxes = np.array([[10.0, 1.0, 30.0, 5.0, 0.0, 0.0]])
    # force a flip by trying seeds until image changes
    for seed in range(20):
        rng = np.random.default_rng(seed)
        out, ob = T.random_hflip(img, boxes, rng)
        if not np.array_equal(out, img):
            np.testing.assert_allclose(ob[0, :4], [70.0, 1.0, 90.0, 5.0])
            return
    raise AssertionError("no flip in 20 seeds")


def test_clip_transforms_tile_stills_to_static_clips():
    """A still image through a k-aware clip transform becomes a static
    k-frame clip (how combined DET+VID temporal training handles still
    members — data/clip_transforms._as_clip)."""
    from viddet_tpu.data.clip_transforms import ClipTrainTransform, ClipValTransform

    img = make_image(80, 120)
    label = np.array([[10.0, 10.0, 60.0, 70.0, 1.0, 0.0]])

    val = ClipValTransform(size=(64, 64), letterbox_resize=True, k=3)
    out, lab, affine = val(img, label)
    assert out.shape == (3, 64, 64, 3)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0], out[2])

    train = ClipTrainTransform(size=(64, 64), k=3)
    out_t, lab_t = train(img, label.copy(), np.random.default_rng(0))
    assert out_t.shape == (3, 64, 64, 3)
    # identical geometry across the tiled frames
    np.testing.assert_array_equal(out_t[0], out_t[2])

    # a true clip of the right length passes through
    clip = np.stack([img, img, img])
    out_c, _, _ = val(clip, label)
    assert out_c.shape == (3, 64, 64, 3)


def test_clip_transforms_reject_mismatched_clips():
    import pytest

    from viddet_tpu.data.clip_transforms import ClipValTransform

    img = make_image(40, 40)
    val = ClipValTransform(size=(32, 32), k=3)
    with pytest.raises(ValueError, match="expects k=3"):
        val(np.stack([img, img]), None)

    # k unset (legacy true-clip mode) must reject stills loudly
    val0 = ClipValTransform(size=(32, 32))
    with pytest.raises(ValueError, match="no k set"):
        val0(img, None)


def test_color_distort_lut_matches_float_chain():
    """The LUT implementation must be bit-identical, per transformed
    channel, to the direct full-image float chain with the same gating
    (LUTs precompute the identical f32 ops per possible uint8 value)."""
    import cv2

    from viddet_tpu.data.transforms import random_color_distort

    def oracle(image, rng):
        b = c = None
        if rng.random() < 0.5:
            b = rng.uniform(-32, 32)
        if rng.random() < 0.5:
            c = rng.uniform(0.5, 1.5)
        if b is not None or c is not None:
            img = image.astype(np.float32)
            if b is not None:
                img = img + np.float32(b)
            if c is not None:
                img = img * np.float32(c)
            image = np.clip(img, 0, 255).astype(np.uint8)
        k = d = None
        if rng.random() < 0.5:
            k = rng.uniform(0.5, 1.5)
        if rng.random() < 0.5:
            d = rng.uniform(-18, 18)
        if k is not None or d is not None:
            hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.float32)
            if k is not None:
                hsv[..., 1] = hsv[..., 1] * np.float32(k)
            if d is not None:
                hsv[..., 0] = (hsv[..., 0] + np.float32(d)) % 180
            hsv[..., 1:] = np.clip(hsv[..., 1:], 0, 255)
            image = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        return image

    base = np.random.default_rng(0).integers(
        0, 255, (97, 113, 3)
    ).astype(np.uint8)
    for seed in range(64):
        out = random_color_distort(base, np.random.default_rng(seed))
        want = oracle(base, np.random.default_rng(seed))
        np.testing.assert_array_equal(out, want)


def test_exif_orientation_sniffer(tmp_path):
    """Header-scan EXIF orientation: plain JPEGs report 1; a spliced APP1
    Exif segment with Orientation=6 is detected (both byte orders)."""
    import cv2

    from viddet_tpu.utils.image import exif_orientation

    plain = str(tmp_path / "plain.jpg")
    cv2.imwrite(plain, np.zeros((8, 8, 3), np.uint8))
    assert exif_orientation(plain) == 1

    def tiff(endian):
        import struct

        e = "<" if endian == b"II" else ">"
        entry = (
            struct.pack(e + "H", 0x0112)   # Orientation
            + struct.pack(e + "H", 3)      # SHORT
            + struct.pack(e + "I", 1)      # count
            + struct.pack(e + "H", 6) + b"\x00\x00"  # value, padded
        )
        return (
            endian + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
            + struct.pack(e + "H", 1) + entry + struct.pack(e + "I", 0)
        )

    with open(plain, "rb") as f:
        raw = f.read()
    for endian in (b"II", b"MM"):
        body = b"Exif\x00\x00" + tiff(endian)
        app1 = b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body
        rotated = str(tmp_path / f"rot_{endian.decode()}.jpg")
        with open(rotated, "wb") as f:
            f.write(raw[:2] + app1 + raw[2:])
        assert exif_orientation(rotated) == 6
        # sanity: cv2 still decodes the spliced file
        assert cv2.imread(rotated) is not None
