"""tools/compare_detections.py — the saved-detections parity differ."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tools.compare_detections import main


def write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


ROW = {"index": 0, "ids": [1, 2], "scores": [0.9, 0.5],
       "boxes": [[1, 2, 3, 4], [5, 6, 7, 8]]}


def run(a, b, *extra, capsys=None):
    rc = main([a, b, *extra])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    return rc, out


def test_identical_files(tmp_path, capsys):
    a, b = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    write(a, [ROW])
    write(b, [ROW])
    rc, s = run(a, b, capsys=capsys)
    assert rc == 0 and s["identical"]


def test_order_swap_is_not_divergence(tmp_path, capsys):
    a, b = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    write(a, [ROW])
    write(b, [dict(ROW, ids=[2, 1], scores=[0.5, 0.9],
                   boxes=[[5, 6, 7, 8], [1, 2, 3, 4]])])
    rc, s = run(a, b, capsys=capsys)
    assert rc == 0 and s["images_order_only"] == 1 and not s["identical"]


def test_value_divergence_and_tolerance(tmp_path, capsys):
    a, b = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    write(a, [ROW])
    write(b, [dict(ROW, scores=[0.9, 0.45])])
    rc, s = run(a, b, capsys=capsys)
    assert rc == 1 and s["images_diverged"] == 1
    rc, s = run(a, b, "--score-atol", "0.1", capsys=capsys)
    assert rc == 0 and s["images_diverged"] == 0


def test_missing_images_counted(tmp_path, capsys):
    a, b = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    write(a, [ROW, dict(ROW, index=1)])
    write(b, [ROW])
    rc, s = run(a, b, capsys=capsys)
    assert rc == 1 and s["images_only_in_a"] == 1


def test_strict_order_fails_on_order_only(tmp_path, capsys):
    """--strict-order turns order-only mismatches into exit 1 (the
    same-framework byte-identity contract gates on the exit code)."""
    a, b = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    write(a, [ROW])
    write(b, [dict(ROW, ids=[2, 1], scores=[0.5, 0.9],
                   boxes=[[5, 6, 7, 8], [1, 2, 3, 4]])])
    rc, s = run(a, b, "--strict-order", capsys=capsys)
    assert rc == 1 and s["images_order_only"] == 1
    rc, s = run(a, a, "--strict-order", capsys=capsys)
    assert rc == 0 and s["identical"]


def test_nearest_match_not_first_fit(tmp_path, capsys):
    """First-fit false divergence (advisor r4): a1=0.50 would consume
    b=0.52 (B's first row), leaving a2=0.55 with only b=0.46 (gap 0.09 >
    atol) — a spurious mismatch.  Nearest-in-tolerance processes a2
    first (higher score) and pairs it with 0.52, leaving 0.46 for a1
    (gap 0.04): a complete assignment exists and must be found."""
    a, b = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    box = [10, 10, 20, 20]
    write(a, [{"index": 0, "ids": [1, 1], "scores": [0.50, 0.55],
               "boxes": [box, box]}])
    write(b, [{"index": 0, "ids": [1, 1], "scores": [0.52, 0.46],
               "boxes": [box, box]}])
    rc, s = run(a, b, "--score-atol", "0.06", capsys=capsys)
    assert rc == 0 and s["images_diverged"] == 0
