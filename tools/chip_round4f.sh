#!/bin/bash
# Round-4 chip queue, part F: merge-formulated spill bench + e2e with
# --repeat 2 (steady-state spans).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
log() { echo "== $(date +%H:%M:%S) $*"; }

log "1. spill receive-side bench (merge-level fold formulation)"
python tools/bench_spill_merge.py
log "spill merge rc=$?"

log "2. e2e with --repeat 2 (first span = load-dominated, rep1 = steady)"
HYSORTK_LOG=info python tools/bench_e2e.py tpu --repeat 2
log "e2e rc=$?"

log "3. report"
python tools/bench_e2e.py report
log "ALL DONE"
