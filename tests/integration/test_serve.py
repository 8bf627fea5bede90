"""Serving stack: continuous request batching + the HTTP front end.

Covers the two layers of the serving surface (a strict superset of the
reference, which stops at a webcam demo — SURVEY.md §4.3):
  * ``infer/service.py`` DetectionService — concurrent callers fused into
    shared device batches, results routed back per request;
  * ``cli/serve.py`` — full HTTP roundtrip on an ephemeral port.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest


def _tiny_stack(data_shape=64, batch_size=4, flush_ms=20.0):
    from viddet_tpu.cli.common import build_model, load_weights, make_predictor
    from viddet_tpu.data.transforms import ValTransform
    from viddet_tpu.infer.service import DetectionService

    module, class_names = build_model("yolo3_tiny_darknet", "voc")
    variables = load_weights(module, "", data_shape)
    infer = make_predictor(module)
    transform = ValTransform(size=(data_shape, data_shape), letterbox_resize=True)
    service = DetectionService(
        infer, variables, transform, batch_size=batch_size, flush_ms=flush_ms
    )
    return service, class_names


def test_service_concurrent_requests_batched():
    """N threads calling detect() concurrently all get correctly-shaped,
    original-coordinate results, and the batcher fuses them into fewer
    device dispatches than requests."""
    service, _ = _tiny_stack()
    try:
        img = np.random.default_rng(0).integers(
            0, 255, (48, 80, 3), np.uint8
        )  # non-square: exercises the letterbox inverse
        # warm compile so the concurrent phase measures batching, not compile
        ids0, scores0, boxes0 = service.detect(img, timeout=300)
        assert ids0.ndim == 1 and boxes0.shape == (ids0.shape[0], 4)

        results = [None] * 6
        errors = []

        def call(i):
            try:
                results[i] = service.detect(img, timeout=300)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors
        for r in results:
            assert r is not None
            ids, scores, boxes = r
            assert ids.shape == ids0.shape
            # same image -> identical detections regardless of batch slot
            np.testing.assert_allclose(boxes, boxes0, atol=1e-3)
        assert service.served == 7
    finally:
        service.close()


def test_service_close_fails_waiters_not_hangs():
    service, _ = _tiny_stack()
    service.close()
    with pytest.raises(RuntimeError):
        service.detect(np.zeros((32, 32, 3), np.uint8), timeout=5)


def test_http_roundtrip():
    """POST an encoded JPEG to a live server; JSON reply in original
    coordinates; /healthz reports the model."""
    cv2 = pytest.importorskip("cv2")
    from viddet_tpu.cli.serve import parse_args, serve_forever
    from viddet_tpu.cli.common import setup_logging

    args = parse_args([
        "--network", "yolo3_tiny_darknet", "--dataset", "voc",
        "--data-shape", "64", "--batch-size", "2", "--port", "0",
        "--thresh", "0.0", "--platform", "cpu",
    ])
    server = serve_forever(args, setup_logging())
    port = server.server_address[1]
    try:
        img = np.random.default_rng(1).integers(0, 255, (60, 90, 3), np.uint8)
        ok, enc = cv2.imencode(".jpg", img[:, :, ::-1])
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect?thresh=0.0",
            data=enc.tobytes(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.loads(resp.read())
        assert out["width"] == 90 and out["height"] == 60
        assert isinstance(out["detections"], list)
        for d in out["detections"]:
            assert set(d) == {"class_id", "class_name", "score", "box"}
            x1, y1, x2, y2 = d["box"]
            assert x1 <= x2 and y1 <= y2

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60
        ) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["network"] == "yolo3_tiny_darknet"
        assert health["requests_served"] >= 1

        # malformed payload -> 400, not a hung request
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect", data=b"not an image",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=60)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.viddet_service.close()


def test_service_partial_batch_flush_deadline():
    """A lone request must not wait for a full batch — the flush deadline
    pads and submits (live-traffic latency bound)."""
    import time

    service, _ = _tiny_stack(batch_size=8, flush_ms=30.0)
    try:
        img = np.zeros((40, 40, 3), np.uint8)
        service.detect(img, timeout=300)  # warm compile
        t0 = time.perf_counter()
        ids, scores, boxes = service.detect(img, timeout=300)
        dt = time.perf_counter() - t0
        assert ids.ndim == 1
        # one warm tiny-net batch is ~1s on this CPU; anything far beyond
        # device cost + flush window means the request waited for a batch
        # that could never fill
        assert dt < 30.0
        assert service.served == 2
    finally:
        service.close()
