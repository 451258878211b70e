#!/bin/bash
# Round-4 chip queue, part G: padded-run spill bench + repeat e2e retry.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
log() { echo "== $(date +%H:%M:%S) $*"; }

log "1. spill receive-side bench (padded-run single-merge formulation)"
python tools/bench_spill_merge.py
log "spill merge rc=$?"

log "2. e2e with --repeat 2 (rep1 = deployment steady state)"
HYSORTK_LOG=info python tools/bench_e2e.py tpu --repeat 2
log "e2e rc=$?"

log "3. report"
python tools/bench_e2e.py report
log "ALL DONE"
