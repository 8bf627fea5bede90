"""Sweep the headline-bench configuration space on a real chip.

Runs bench.py as a subprocess per configuration (fresh process = fresh
compile cache and clean VMEM tuning), collects each JSON line, and prints a
ranked table.  Use this to close the last % toward the >2000 fps north star
(VERDICT r1 item 3): batch size, NMS topk bucket, and scoped-VMEM budget.

  python tools/bench_sweep.py [--quick]

NOTE: topk < 400 changes NMS semantics (fewer candidates survive to
suppression).  The recorded headline number must keep topk=400 unless an
mAP check shows no quality change; batch and vmem are semantics-free.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(batch, topk, vmem_kib, shape=416, timeout=900):
    env = dict(
        os.environ,
        VIDDET_BENCH_BATCH=str(batch),
        VIDDET_BENCH_TOPK=str(topk),
        VIDDET_BENCH_SHAPE=str(shape),
        LIBTPU_INIT_ARGS=f"--xla_tpu_scoped_vmem_limit_kib={vmem_kib}",
    )
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"batch": batch, "topk": topk, "vmem_kib": vmem_kib,
                "error": "timeout"}
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        rec = {"error": (out.stderr or out.stdout)[-300:]}
    rec["vmem_kib"] = vmem_kib
    rec.setdefault("batch", batch)
    rec.setdefault("topk", topk)
    rec.setdefault("shape", shape)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="3-point sweep instead of the full grid")
    p.add_argument("--batches", default="64,128,256")
    p.add_argument("--topks", default="256,400")
    p.add_argument("--vmem", default="65536,73728,98304")
    p.add_argument("--shapes", default="",
                   help="comma list, e.g. 320,416,608: sweep input "
                        "resolution at batch 128 instead of the "
                        "batch/topk/vmem grid — mirrors the YOLOv3 "
                        "paper's latency table (BASELINE.md)")
    args = p.parse_args(argv)

    if args.shapes:
        results = []
        for sh in (int(x) for x in args.shapes.split(",")):
            rec = run_one(128, 400, 65536, shape=sh)
            results.append(rec)
            print(json.dumps(rec), flush=True)
        ok = [r for r in results if "value" in r]
        print("\n# shape table (batch 128)")
        for r in ok:
            lat = r.get("batch_latency_ms")
            per_frame = (lat / r["batch"]) if lat else None
            print(f"{r['shape']:>4}px  {r['value']:8.1f} fps"
                  + (f"  {per_frame:.2f} ms/frame amortized" if per_frame else ""))
        return

    if args.quick:
        grid = [(128, 400, 65536), (256, 400, 65536), (128, 256, 65536)]
    else:
        grid = list(itertools.product(
            [int(x) for x in args.batches.split(",")],
            [int(x) for x in args.topks.split(",")],
            [int(x) for x in args.vmem.split(",")],
        ))

    results = []
    for batch, topk, vmem in grid:
        rec = run_one(batch, topk, vmem)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if "value" in r]
    ok.sort(key=lambda r: -r["value"])
    print("\n# ranked")
    for r in ok:
        print(f"{r['value']:8.1f} fps  batch={r['batch']:<4} "
              f"topk={r['topk']:<4} vmem={r['vmem_kib']}")
    if ok:
        best = ok[0]
        print(f"\nbest: {best['value']} fps "
              f"(VIDDET_BENCH_BATCH={best['batch']} "
              f"VIDDET_BENCH_TOPK={best['topk']} "
              f"LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib={best['vmem_kib']})")


if __name__ == "__main__":
    main()
