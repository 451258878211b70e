#!/bin/bash
# Round-4 chip queue, part D: spill-merge microbench (fixed probe shapes)
# + e2e re-measurement with the grouped device-resident consolidation
# (commit 89193b7) and stage logging on.
#     nohup bash tools/chip_round4d.sh <wait_pid> > /tmp/chip_round4d.log 2>&1 &
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
log() { echo "== $(date +%H:%M:%S) $*"; }

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  log "waiting for pid $WAIT_PID (part C) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

log "1. exact-capacity vs legacy 2x receive merge (chip)"
python tools/bench_spill_merge.py
log "spill merge rc=$?"

log "2. e2e run C (cold for the consolidation programs)"
HYSORTK_LOG=info python tools/bench_e2e.py tpu
log "e2e C rc=$?"

log "3. e2e run D (warm — the new measurement of record)"
HYSORTK_LOG=info python tools/bench_e2e.py tpu
log "e2e D rc=$?"

log "4. report"
python tools/bench_e2e.py report
log "report rc=$?"

log "ALL DONE"
