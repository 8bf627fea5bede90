#!/bin/bash
# One-shot on-chip adjudication queue (VERDICT r3 #1 / round-4 staging).
#
# Run this the moment the TPU tunnel answers.  Executes the full
# chipcheck ladder — parity gates, trace_tail variant groups, bench under
# every staged flag — plus benchall, logging each step to its own file so
# a mid-session tunnel drop loses nothing.  Steps that fail are recorded
# and skipped past (no set -e): a Mosaic rejection of one staged variant
# must not block timing the others.
#
#   bash tools/chip_session.sh [out_dir]
#
# Afterwards: read $OUT/SUMMARY, promote winning variants to defaults in
# ops/nms.py, re-record BASELINE.md, and re-run `python bench.py` to
# confirm the promoted configuration.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_session_$(date +%m%d_%H%M)}
mkdir -p "$OUT"
export VIDDET_JAX_CACHE=${VIDDET_JAX_CACHE:-/tmp/viddet_xla_cache}
SUMMARY="$OUT/SUMMARY"
: > "$SUMMARY"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name: $* ===" | tee -a "$SUMMARY"
  if timeout "$to" "$@" >"$OUT/$name.log" 2>&1; then
    echo "  OK   $(tail -1 "$OUT/$name.log")" | tee -a "$SUMMARY"
  else
    echo "  FAIL rc=$? — see $OUT/$name.log (tail: $(tail -1 "$OUT/$name.log"))" \
      | tee -a "$SUMMARY"
  fi
}

# --- 1. parity ladder: default config first, then each staged variant --
run parity_default        900 python tools/tpu_parity_check.py
run parity_compact        900 env VIDDET_COMPACT_KERNEL=1   python tools/tpu_parity_check.py
run parity_masked         900 env VIDDET_SCORE_KERNEL=masked python tools/tpu_parity_check.py
run parity_rank           900 env VIDDET_TOPM_KERNEL=rank    python tools/tpu_parity_check.py
run parity_det            900 env VIDDET_PAIR_TOPK=det       python tools/tpu_parity_check.py

# --- 2. kernel timing via variant traces (docs/perf_notes.md method) ---
run trace_compact         900 python tools/trace_tail.py --group compact
run trace_scores          900 python tools/trace_tail.py --group scores
run trace_topm            900 python tools/trace_tail.py --group topm
run trace_pairtopk        900 python tools/trace_tail.py --group pairtopk
run trace_scan            900 python tools/trace_tail.py --group scan
run trace_finalize        900 python tools/trace_tail.py --group finalize

# --- 3. headline bench under each flag (best-of-5 windows each) --------
run bench_default         900 python bench.py
run bench_compact         900 env VIDDET_COMPACT_KERNEL=1   python bench.py
run bench_masked          900 env VIDDET_SCORE_KERNEL=masked python bench.py
run bench_rank            900 env VIDDET_TOPM_KERNEL=rank    python bench.py
run bench_det             900 env VIDDET_PAIR_TOPK=det       python bench.py
run bench_int8            900 env VIDDET_QUANT=int8          python bench.py
# combined best-candidates run once singles are known (edit as needed):
run bench_combo           900 env VIDDET_SCORE_KERNEL=masked VIDDET_TOPM_KERNEL=rank \
                              VIDDET_COMPACT_KERNEL=1 python bench.py

# --- 4. full perf record (benchall equivalents, one JSON line each) ----
run ssd_bench             900 python tools/ssd_bench.py
run frcnn_bench           900 python tools/frcnn_bench.py
run train_bench_yolo     1200 python tools/train_bench.py
run train_bench_ssd      1200 python tools/train_bench.py --family ssd
run train_bench_frcnn    1200 python tools/train_bench.py --family frcnn
run serve_bench           900 python tools/serve_bench.py --concurrency 32 --requests 400
run stream_bench          900 python tools/stream_bench.py --streams 4
run stream_bypass         900 python tools/stream_bench.py --decode-bypass
run decode_sweep          900 python tools/stream_bench.py --decode-sweep 1,2,4
run loader_bench          900 python tools/loader_bench.py
# paper-comparable latency table across input resolutions (BASELINE.md
# reference anchors: 22/29/51 ms @ 320/416/608 on Titan X).
run bench_sweep          1200 python tools/bench_sweep.py --shapes 320,416,608

echo "--- done: $(date -u) ---" | tee -a "$SUMMARY"
echo "logs in $OUT"
