"""Serving-path benchmark: concurrent request throughput + latency.

Drives ``infer/service.py``'s continuous request batcher (the core of
``cli/serve.py``, HTTP layer excluded so the numbers are the batcher's)
with N client threads issuing back-to-back requests, and reports sustained
requests/sec plus per-request latency percentiles.  The interesting
contrast vs ``bench.py`` is the batching efficiency under independent
callers: at concurrency >= batch size the device should see mostly-full
batches and approach the offline fps; at concurrency 1 the p50 latency is
the single-image cost incl. one flush window.

  python tools/serve_bench.py --concurrency 16 --requests 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "LIBTPU_INIT_ARGS" not in os.environ:
    os.environ["LIBTPU_INIT_ARGS"] = "--xla_tpu_scoped_vmem_limit_kib=73728"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="yolo3_darknet53_coco")
    p.add_argument("--data-shape", type=int, default=416)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--flush-ms", type=float, default=5.0)
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--requests", type=int, default=200,
                   help="total requests across all client threads")
    p.add_argument("--platform", default="auto", choices=("auto", "cpu", "tpu"))
    p.add_argument("--http", action="store_true",
                   help="drive the FULL stack over HTTP (cli/serve.py on an "
                        "ephemeral port, JPEG-encoded payloads) instead of "
                        "calling the batcher directly — measures the "
                        "decode+HTTP overhead on top of the service")
    args = p.parse_args(argv)

    import jax

    if args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    cache = os.environ.get("VIDDET_JAX_CACHE")
    if cache:
        from viddet_tpu.cli.common import enable_compilation_cache

        enable_compilation_cache(cache)
    import numpy as np

    from viddet_tpu.data.transforms import ValTransform
    from viddet_tpu.infer.service import DetectionService
    from viddet_tpu.models import get_model
    from viddet_tpu.cli.common import make_predictor, load_weights

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)

    server = None
    if args.http:
        import cv2
        import urllib.request

        from viddet_tpu.cli import serve as serve_cli
        from viddet_tpu.cli.common import setup_logging

        # the served network is '<family>_<backbone>' + --dataset; map the
        # zoo name back (e.g. yolo3_darknet53_coco)
        net, ds_name = args.network.rsplit("_", 1)
        srv_args = serve_cli.parse_args([
            "--network", net, "--dataset", ds_name,
            "--data-shape", str(args.data_shape),
            "--batch-size", str(args.batch_size),
            "--flush-ms", str(args.flush_ms),
            "--port", "0", "--thresh", "0.5",
        ])
        server = serve_cli.serve_forever(srv_args, setup_logging())
        port = server.server_address[1]
        ok, enc = cv2.imencode(".jpg", img[:, :, ::-1])
        assert ok
        payload = enc.tobytes()
        url = f"http://127.0.0.1:{port}/detect"

        def one_request():
            req = urllib.request.Request(url, data=payload, method="POST")
            with urllib.request.urlopen(req, timeout=600) as resp:
                resp.read()
    else:
        module, _ = get_model(args.network)
        variables = load_weights(module, "", args.data_shape)
        infer = make_predictor(module)
        transform = ValTransform(
            size=(args.data_shape, args.data_shape), letterbox_resize=True,
            normalize=False
        )
        service = DetectionService(
            infer, variables, transform,
            batch_size=args.batch_size, flush_ms=args.flush_ms,
        )

        def one_request():
            service.detect(img, timeout=600)

    one_request()  # compile warmup (serve_forever also pre-warms)

    per_thread = max(1, args.requests // args.concurrency)
    latencies: list = []
    lock = threading.Lock()
    errors: list = []

    def client():
        mine = []
        try:
            for _ in range(per_thread):
                t0 = time.perf_counter()
                one_request()
                mine.append(time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)
        with lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(args.concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if server is not None:
        server.shutdown()
        server.viddet_service.close()
    else:
        service.close()
    if errors:
        raise errors[0]

    lat = np.sort(np.asarray(latencies)) * 1e3
    n = len(lat)
    print(json.dumps({
        "metric": (
            "serve_http_requests_per_sec" if args.http
            else "serve_requests_per_sec"
        ),
        "value": round(n / wall, 1),
        "unit": "req/s",
        "concurrency": args.concurrency,
        "batch_size": args.batch_size,
        "flush_ms": args.flush_ms,
        "requests": n,
        "p50_ms": round(float(lat[n // 2]), 2),
        "p95_ms": round(float(lat[min(n - 1, int(n * 0.95))]), 2),
        "p99_ms": round(float(lat[min(n - 1, int(n * 0.99))]), 2),
        "network": args.network,
    }))


if __name__ == "__main__":
    main()
