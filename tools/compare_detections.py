"""Diff two saved-detections files (the `evaluate --save-detections` JSONL).

Operationalizes the fixed-weight parity contract (BASELINE.json; SURVEY.md
§7): run the reference exporting its detections, run this framework with
`evaluate --save-detections`, then compare the files — bit-for-bit by
default, or within numeric tolerances for cross-framework float noise.

  python tools/compare_detections.py a.jsonl b.jsonl
  python tools/compare_detections.py a.jsonl b.jsonl --atol 1e-4 --score-atol 1e-5

Rows are keyed by the "index" field (dataset position).  Within an image,
detections are compared as SETS matched greedily by (class, score, box)
within tolerance — detector output order is part of the bit-for-bit
contract only when both files come from this framework, so order
mismatches are reported separately from value mismatches.

Prints ONE JSON summary line; exit code 1 when any image diverges.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            rows[int(r["index"])] = r
    return rows


def match_image(a, b, score_atol, box_atol):
    """Greedy set match: returns (unmatched_a, unmatched_b, order_equal).

    A-detections are processed in descending-score order and each takes the
    NEAREST in-tolerance B-candidate (min score gap, then min box gap) of
    its class, not the first — so an A-det cannot casually consume the only
    B-det a later near-identical A-det could match.  Greedy nearest-first
    is still not an optimal assignment, so with nonzero tolerances the
    result is conservative: it may over-report divergence in adversarial
    tie layouts, never under-report (at atol=0 matching is exact).
    """
    da = list(zip(a["ids"], a["scores"], a["boxes"]))
    db = list(zip(b["ids"], b["scores"], b["boxes"]))
    order_equal = len(da) == len(db) and all(
        ia == ib and abs(sa - sb) <= score_atol
        and all(abs(x - y) <= box_atol for x, y in zip(ba, bb))
        for (ia, sa, ba), (ib, sb, bb) in zip(da, db)
    )
    used = [False] * len(db)
    unmatched_a = 0
    for ia, sa, ba in sorted(da, key=lambda d: -d[1]):
        best, best_key = -1, None
        for j, (ib, sb, bb) in enumerate(db):
            if used[j] or ia != ib or abs(sa - sb) > score_atol:
                continue
            gaps = [abs(x - y) for x, y in zip(ba, bb)]
            if max(gaps, default=0.0) > box_atol:
                continue
            key = (abs(sa - sb), max(gaps, default=0.0))
            if best < 0 or key < best_key:
                best, best_key = j, key
        if best >= 0:
            used[best] = True
        else:
            unmatched_a += 1
    return unmatched_a, used.count(False), order_equal


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("file_a")
    p.add_argument("file_b")
    p.add_argument("--score-atol", type=float, default=0.0,
                   help="score tolerance (0 = bit-for-bit after JSON round-trip)")
    p.add_argument("--atol", type=float, default=0.0,
                   help="box-coordinate tolerance in pixels")
    p.add_argument("--strict-order", action="store_true",
                   help="exit 1 on order-only mismatches too (use for the "
                        "same-framework byte-identity contract, where "
                        "detector output order is part of the guarantee)")
    p.add_argument("--verbose", action="store_true",
                   help="print one line per diverging image")
    args = p.parse_args(argv)

    a, b = load(args.file_a), load(args.file_b)
    common = sorted(set(a) & set(b))
    only_a = len(a) - len(common)
    only_b = len(b) - len(common)

    diverged = order_only = 0
    total_unmatched = 0
    for idx in common:
        ua, ub, order_equal = match_image(
            a[idx], b[idx], args.score_atol, args.atol
        )
        if ua or ub:
            diverged += 1
            total_unmatched += ua + ub
            if args.verbose:
                print(f"image {idx}: {ua} only in A, {ub} only in B",
                      file=sys.stderr)
        elif not order_equal:
            order_only += 1
            if args.verbose:
                print(f"image {idx}: same detection set, different order",
                      file=sys.stderr)

    summary = {
        "images_compared": len(common),
        "images_only_in_a": only_a,
        "images_only_in_b": only_b,
        "images_diverged": diverged,
        "images_order_only": order_only,
        "detections_unmatched": total_unmatched,
        "score_atol": args.score_atol,
        "box_atol": args.atol,
        "identical": diverged == 0 and order_only == 0
        and not only_a and not only_b,
    }
    print(json.dumps(summary))
    if args.strict_order and order_only:
        return 1
    return 1 if (diverged or only_a or only_b) else 0


if __name__ == "__main__":
    raise SystemExit(main())
