#!/bin/bash
# Unattended TPU-tunnel watcher (VERDICT r4 item 2).
#
# Rounds 3 and 4 lost their chip windows because running the adjudication
# queue required a human to notice the tunnel was back.  This loop probes
# backend init with a bounded timeout every PROBE_INTERVAL seconds and, on
# the first successful probe, executes tools/chip_session.sh unattended,
# then exits.  Run it in the background at session start:
#
#   bash tools/chip_wait.sh [out_dir] & echo $! > /tmp/chipwait.pid
#   # or: make chipwait
#
# Every probe is logged to $OUT/probes.log (rc=124 = tunnel down, the
# probe hung).  If the queue has already produced a SUMMARY in $OUT the
# watcher exits immediately instead of re-running it.

set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chip_session_auto}
PROBE_INTERVAL=${PROBE_INTERVAL:-600}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-75}
mkdir -p "$OUT"
LOG="$OUT/probes.log"

if [ -s "$OUT/SUMMARY" ]; then
  echo "$(date -u '+%F %T') SUMMARY already present in $OUT — nothing to do" \
    | tee -a "$LOG"
  exit 0
fi

while true; do
  # Bare `import jax; jax.devices()` hangs forever when the tunnel is down
  # (never errors), so the bounded timeout IS the health check.
  if timeout "$PROBE_TIMEOUT" python -c \
      "import jax; print(jax.devices())" >>"$LOG" 2>&1; then
    echo "$(date -u '+%F %T') tunnel UP — running chip_session.sh" >>"$LOG"
    bash tools/chip_session.sh "$OUT"
    echo "$(date -u '+%F %T') chip session finished; see $OUT/SUMMARY" >>"$LOG"
    exit 0
  fi
  echo "$(date -u '+%F %T') tunnel down (probe rc=124), retry in ${PROBE_INTERVAL}s" \
    >>"$LOG"
  sleep "$PROBE_INTERVAL"
done
