"""Streaming video detection pipeline over a generated fixture video."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.data.transforms import ValTransform
from viddet_tpu.models.yolo3 import NMSConfig, YOLOv3, forward_and_postprocess


@pytest.fixture
def video(tmp_path):
    path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96))
    rng = np.random.default_rng(0)
    for t in range(14):
        frame = rng.integers(80, 120, (96, 128, 3)).astype(np.uint8)
        cv2.rectangle(frame, (20 + t, 20), (60 + t, 60), (0, 0, 255), -1)
        vw.write(frame)
    vw.release()
    return path


def make_infer():
    module = YOLOv3(num_classes=2, backbone="tiny", policy=FLOAT32_POLICY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)
    nms = NMSConfig(backend="xla", topk=32, post_nms=8)

    @jax.jit
    def infer(v, im):
        return forward_and_postprocess(module, v, im, nms)

    return infer, variables


def test_stream_detect_video_end_to_end(video, tmp_path):
    from viddet_tpu.infer.stream import stream_detect_video

    infer, variables = make_infer()
    out_dir = str(tmp_path / "out")
    stats = stream_detect_video(
        video, infer, variables,
        ValTransform(size=(64, 64), letterbox_resize=True),
        class_names=["a", "b"],
        output_dir=out_dir,
        thresh=0.0,
        batch_size=4,
        every=2,
        draw=True,
        save_detections=True,
    )
    assert stats["frames"] == 7  # 14 frames, every 2
    assert os.path.exists(os.path.join(out_dir, "clip_det.mp4"))
    assert os.path.exists(os.path.join(out_dir, "clip_det.txt"))
    # output video has the annotated frames at original resolution
    cap = cv2.VideoCapture(os.path.join(out_dir, "clip_det.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 7
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
    cap.release()


def test_stream_detect_ordering(video):
    """Frames come back in order with one batch in flight."""
    from viddet_tpu.infer.stream import FrameSource, stream_detect

    infer, variables = make_infer()
    source = FrameSource(video, ValTransform(size=(64, 64), letterbox_resize=True))
    indices = [
        idx
        for idx, *_ in stream_detect(iter(source), infer, variables, 4, (64, 64))
    ]
    assert indices == list(range(14))


def test_stream_detect_video_native_path(video, tmp_path):
    """draw=False routes through the native C++ video stream when available."""
    from viddet_tpu import native
    from viddet_tpu.infer.stream import stream_detect_video

    if not native.available():
        pytest.skip("native lib unavailable")
    infer, variables = make_infer()
    out_dir = str(tmp_path / "out2")
    stats = stream_detect_video(
        video, infer, variables,
        ValTransform(size=(64, 64), letterbox_resize=True),
        class_names=["a", "b"],
        output_dir=out_dir,
        thresh=0.0,
        batch_size=4,
        draw=False,
        save_detections=True,
    )
    assert stats["frames"] == 14
    assert os.path.exists(os.path.join(out_dir, "clip_det.txt"))


def test_frame_source_close_wakes_consumer(tmp_path):
    """close() must terminate a blocked consumer even though the decode
    thread can no longer enqueue its None sentinel."""
    import time

    import numpy as np

    from viddet_tpu.data.transforms import ValTransform
    from viddet_tpu.infer.stream import FrameSource

    path = str(tmp_path / "v.mp4")
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for _ in range(200):
        vw.write(np.zeros((48, 64, 3), np.uint8))
    vw.release()

    src = FrameSource(path, ValTransform((64, 64)), queue_size=4)
    it = iter(src)
    next(it)
    src.close()
    t0 = time.perf_counter()
    for _ in it:  # must drain/terminate promptly, not hang on q.get()
        pass
    assert time.perf_counter() - t0 < 5.0
