#!/bin/bash
# Lightweight tunnel watcher: confirm the PROMOTED headline config on-chip.
#
# Unlike tools/chip_wait.sh (which runs the full adjudication queue —
# appropriate when staged variants await judgment), this probes backend
# init every PROBE_INTERVAL seconds and, on the first successful probe,
# runs `python bench.py` N_RUNS times to confirm the promoted defaults
# (Pallas compact tail + 72 MiB scoped VMEM, docs/perf_notes.md round-5
# table) still reproduce ~2058 fps, then exits.  Use after an
# adjudication session has already landed, when the only open question
# is "does the shipped default still hit the number".
#
#   bash tools/bench_wait.sh [out_dir] & echo $! > /tmp/benchwait.pid
#
# Probe rc=124 = tunnel down (backend init hangs forever when the axon
# tunnel is unreachable; the bounded timeout IS the health check).

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bench_wait}
PROBE_INTERVAL=${PROBE_INTERVAL:-600}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-75}
N_RUNS=${N_RUNS:-3}
mkdir -p "$OUT"
LOG="$OUT/probes.log"

if [ -s "$OUT/BENCH" ]; then
  echo "$(date -u '+%F %T') BENCH already present in $OUT — nothing to do" \
    | tee -a "$LOG"
  exit 0
fi

while true; do
  if timeout "$PROBE_TIMEOUT" python -c \
      "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "$(date -u '+%F %T') tunnel UP — running bench.py x$N_RUNS" >>"$LOG"
    for i in $(seq 1 "$N_RUNS"); do
      echo "--- run $i $(date -u '+%F %T')" >>"$OUT/BENCH"
      timeout 900 python bench.py >>"$OUT/BENCH" 2>&1
      echo "rc=$?" >>"$OUT/BENCH"
    done
    echo "$(date -u '+%F %T') done; see $OUT/BENCH" >>"$LOG"
    exit 0
  fi
  echo "$(date -u '+%F %T') tunnel down (probe rc=124), retry in ${PROBE_INTERVAL}s" \
    >>"$LOG"
  sleep "$PROBE_INTERVAL"
done
