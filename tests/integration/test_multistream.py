"""Multi-stream continuous batching + temporal clip streaming.

Covers the BASELINE north-star "continuously-batched over frame streams"
contract and config #5's temporal decode->batch->detect stream
(VERDICT r2 item 2): N videos share one fixed-shape device batch, and
k-frame models consume clips assembled from live streams by per-stream
ring buffers.
"""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viddet_tpu.core.precision import FLOAT32_POLICY
from viddet_tpu.data.transforms import ValTransform
from viddet_tpu.infer.multistream import ClipBuffer, stream_detect_multi
from viddet_tpu.models.yolo3 import NMSConfig, YOLOv3, forward_and_postprocess


def _write_video(path, frames, size=(128, 96), offset=0):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, size)
    rng = np.random.default_rng(offset)
    for t in range(frames):
        frame = rng.integers(80, 120, (size[1], size[0], 3)).astype(np.uint8)
        cv2.rectangle(
            frame, (10 + offset + t, 20), (50 + offset + t, 60), (0, 0, 255), -1
        )
        vw.write(frame)
    vw.release()
    return path


@pytest.fixture
def videos(tmp_path):
    return [
        _write_video(str(tmp_path / "a.mp4"), 11, offset=0),
        _write_video(str(tmp_path / "b.mp4"), 7, offset=15),
    ]


def _make_single_frame_infer():
    module = YOLOv3(num_classes=2, backbone="tiny", policy=FLOAT32_POLICY)
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    nms = NMSConfig(backend="xla", topk=32, post_nms=8)

    @jax.jit
    def infer(v, im):
        return forward_and_postprocess(module, v, im, nms)

    return infer, variables


def _make_temporal_infer(k):
    from viddet_tpu.models.zoo import temporal_yolo3_custom

    module, _ = temporal_yolo3_custom(
        ["a", "b"], k=k, aggregation="max", backbone="tiny",
        policy=FLOAT32_POLICY,
    )
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, k, 64, 64, 3)), train=False
    )
    nms = NMSConfig(backend="xla", topk=32, post_nms=8)

    @jax.jit
    def infer(v, clips):
        return forward_and_postprocess(module, v, clips, nms)

    return infer, variables


# ---------------------------------------------------------------- ClipBuffer

def test_clip_buffer_window_and_stride():
    buf = ClipBuffer("s", k=3, stride=2)
    frames = [
        (i, None, np.full((4, 4, 3), i, np.float32), np.zeros(4))
        for i in range(8)
    ]
    keys = []
    for f in frames:
        for item in buf.push(*f):
            keys.append(item.frame_idx)
            assert item.x.shape == (3, 4, 4, 3)
            # clip center == key frame
            assert item.x[1, 0, 0, 0] == item.frame_idx
    # windows end at frames 2, 4, 6 -> keys (centers) 1, 3, 5
    assert keys == [1, 3, 5]
    tail = buf.flush()
    # flush repeats frame 7 until it becomes the key
    assert [t.frame_idx for t in tail] == [7]


def test_clip_buffer_short_stream_flush():
    buf = ClipBuffer("s", k=5, stride=1)
    out = []
    for i in range(2):  # fewer frames than the window
        out += buf.push(i, None, np.full((2, 2, 3), i, np.float32), np.zeros(4))
    assert out == []
    tail = buf.flush()
    assert [t.frame_idx for t in tail] and tail[-1].frame_idx == 1


# ------------------------------------------------------- multi-stream batcher

def test_multistream_single_frame_ordering(videos):
    from viddet_tpu.infer.multistream import open_sources

    infer, variables = _make_single_frame_infer()
    transform = ValTransform(size=(64, 64), letterbox_resize=True)
    sources = open_sources(videos, transform, prefer_native=False)
    per_stream = {}
    for name, idx, rgb, affine, ids, scores, boxes in stream_detect_multi(
        {n: iter(s) for n, s in sources.items()},
        infer, variables, batch_size=4, input_shape=(64, 64),
    ):
        per_stream.setdefault(name, []).append(idx)
        assert ids.shape == (8,) and boxes.shape == (8, 4)
    # every frame of both videos seen exactly once, in order, per stream
    assert sorted(per_stream) == ["a.mp4", "b.mp4"]
    assert per_stream["a.mp4"] == list(range(11))
    assert per_stream["b.mp4"] == list(range(7))


def test_multistream_temporal_clips(videos):
    from viddet_tpu.infer.multistream import open_sources

    k = 3
    infer, variables = _make_temporal_infer(k)
    transform = ValTransform(size=(64, 64), letterbox_resize=True)
    sources = open_sources(videos, transform, prefer_native=False)
    per_stream = {}
    for name, idx, rgb, affine, ids, scores, boxes in stream_detect_multi(
        {n: iter(s) for n, s in sources.items()},
        infer, variables, batch_size=4, input_shape=(64, 64), k=k,
    ):
        per_stream.setdefault(name, []).append(idx)
    # keys: centers of [0..2], [1..3], ... plus the flush clip for the
    # final frame -> 1..9+10 for the 11-frame video
    assert per_stream["a.mp4"] == list(range(1, 10)) + [10]
    assert per_stream["b.mp4"] == list(range(1, 6)) + [6]


def test_detect_cli_temporal_video(videos, tmp_path):
    """A VID-style k=3 model runs on an actual mp4 through the CLI."""
    from viddet_tpu.cli.detect import main

    out = str(tmp_path / "out")
    main([
        "--platform", "cpu",
        "--network", "yolo3_tiny_darknet",
        "--dataset", "voc",
        "--input", videos[0],
        "--output", out,
        "--data-shape", "64",
        "--batch-size", "4",
        "--temporal-k", "3",
        "--thresh", "0.0",
        "--no-draw",
        "--save-detections",
    ])
    assert os.path.exists(os.path.join(out, "a_det.txt"))


def test_detect_cli_two_videos(videos, tmp_path):
    from viddet_tpu.cli.detect import main

    out = str(tmp_path / "out2")
    main([
        "--platform", "cpu",
        "--network", "yolo3_tiny_darknet",
        "--dataset", "voc",
        "--input", ",".join(videos),
        "--output", out,
        "--data-shape", "64",
        "--batch-size", "4",
        "--thresh", "0.0",
        "--no-draw",
        "--save-detections",
    ])
    assert os.path.exists(os.path.join(out, "a_det.txt"))
    assert os.path.exists(os.path.join(out, "b_det.txt"))


def test_decode_error_propagates_not_truncates():
    """A source that dies mid-stream must raise in the consumer (with the
    original exception as cause), not silently end the stream early."""
    infer, variables = _make_single_frame_infer()

    def good():
        for i in range(6):
            yield i, None, np.zeros((64, 64, 3), np.float32), np.eye(3, dtype=np.float32)

    def bad():
        yield 0, None, np.zeros((64, 64, 3), np.float32), np.eye(3, dtype=np.float32)
        raise ValueError("corrupt frame")

    with pytest.raises(RuntimeError, match="stream 'bad' failed") as ei:
        for _ in stream_detect_multi(
            {"good": good(), "bad": bad()},
            infer,
            variables,
            batch_size=4,
            input_shape=(64, 64),
            flush_ms=50.0,
        ):
            pass
    assert isinstance(ei.value.__cause__, ValueError)


def test_duplicate_basename_streams_write_distinct_outputs(tmp_path):
    """'/x/a.mp4' and '/y/a.mp4' share a basename; their det txts (and
    annotated mp4s) must not collapse onto one path."""
    from viddet_tpu.data.transforms import ValTransform
    from viddet_tpu.infer.multistream import stream_detect_videos

    path = _write_video(str(tmp_path / "a.mp4"), 6, offset=0)
    infer, variables = _make_single_frame_infer()
    out = str(tmp_path / "out")
    stats = stream_detect_videos(
        [path, path],
        infer,
        variables,
        ValTransform((64, 64)),
        ["c0", "c1"],
        output_dir=out,
        thresh=0.0,
        batch_size=4,
        draw=False,
        save_detections=True,
    )
    txts = sorted(os.listdir(out))
    assert txts == ["a_1_det.txt", "a_det.txt"], txts
    assert stats["frames"] == 12


def test_flush_deadline_anchored_to_first_frame():
    """A source faster than 1000/flush_ms fps must STILL flush a partial
    batch once flush_ms has passed since the batch's first frame — the
    live-webcam latency bound.  (A per-get timeout would reset on every
    frame and wait for the full batch: ~1.3s here vs ~0.1s.)"""
    import time

    import numpy as np

    from viddet_tpu.infer.multistream import stream_detect_multi

    def src():
        for i in range(64):
            yield i, None, np.zeros((8, 8, 3), np.float32), np.zeros(4, np.float32)
            time.sleep(0.04)  # 25 fps — faster than the 100ms flush window

    def fake_infer(_variables, batch):
        b = batch.shape[0]
        return (
            np.zeros((b, 5), np.float32),
            np.zeros((b, 5), np.float32),
            np.zeros((b, 5, 4), np.float32),
        )

    t0 = time.perf_counter()
    gen = stream_detect_multi(
        {"s": src()}, fake_infer, None, batch_size=32, input_shape=(8, 8),
        flush_ms=100.0,
    )
    next(gen)
    first_dt = time.perf_counter() - t0
    gen.close()
    assert first_dt < 0.6, (
        f"first result after {first_dt:.2f}s — partial-batch flush did not "
        "fire at the deadline"
    )


def test_idle_drain_releases_results_while_source_stalls():
    """ADVICE r3: a live source that stalls AFTER a partial-batch submit
    must not withhold the already-computed detections — the loop drains
    pending batches when the ready-queue wait times out with no new items
    (mirrors DetectionService._run's idle drain)."""
    import time

    import numpy as np

    from viddet_tpu.infer.multistream import stream_detect_multi

    def stalling_src():
        yield 0, None, np.zeros((8, 8, 3), np.float32), np.zeros(4, np.float32)
        time.sleep(30.0)  # stall far longer than the test budget; never ends

    def fake_infer(_variables, batch):
        b = batch.shape[0]
        return (
            np.zeros((b, 5), np.float32),
            np.zeros((b, 5), np.float32),
            np.zeros((b, 5, 4), np.float32),
        )

    t0 = time.perf_counter()
    gen = stream_detect_multi(
        {"s": stalling_src()}, fake_infer, None, batch_size=32,
        input_shape=(8, 8), flush_ms=100.0, max_in_flight=2,
    )
    out = next(gen)  # must arrive despite max_in_flight not being reached
    dt = time.perf_counter() - t0
    gen.close()
    assert out[0] == "s" and out[1] == 0
    assert dt < 2.0, (
        f"first result after {dt:.2f}s — idle drain did not release the "
        "computed partial batch while the source stalled"
    )
