#!/bin/bash
# Round-4 chip queue, part B: e2e measurement of record + bench rerun
# under the new (unfused-default) configuration. Waits for any oracle
# compile to finish first so CPU-side walls are uncontended.
#     nohup bash tools/chip_round4b.sh <wait_pid> > /tmp/chip_round4b.log 2>&1 &
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
log() { echo "== $(date +%H:%M:%S) $*"; }

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  log "waiting for pid $WAIT_PID (oracle build) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi

log "0. regenerate the 512Mb e2e FASTA"
python tools/bench_e2e.py gen
log "gen rc=$?"

log "1. reference binary e2e (CPU, all cores)"
python tools/bench_e2e.py ref
log "ref rc=$?"

log "2. e2e run A (cold for changed programs; populates cache)"
python tools/bench_e2e.py tpu
log "e2e A rc=$?"

log "3. e2e run B (warm-cache wall — the measurement of record)"
python tools/bench_e2e.py tpu
log "e2e B rc=$?"

log "4. report"
python tools/bench_e2e.py report
log "report rc=$?"

log "5. bench.py rerun (unfused default; warms driver-run cache)"
python bench.py
log "bench rc=$?"

log "ALL DONE"
