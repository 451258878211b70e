#!/bin/bash
# Round-4 chip work queue — run ONCE when the TPU tunnel is back:
#     nohup bash tools/chip_round4.sh > /tmp/chip_round4.log 2>&1 &
# Strictly sequential (one TPU client at a time; never kill mid-compile).
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
log() { echo "== $(date +%H:%M:%S) $*"; }

log "1. fused-sort validation + rows sweep (small compile first)"
python tools/bench_fused_sort.py --n $((1 << 26)) --rows 512 1024
log "fused sort rc=$?"

log "2. bench.py (steady-state pipeline; also pre-warms .jax_cache)"
python bench.py
log "bench rc=$?"

log "3. e2e run A (cold for changed programs; populates cache)"
python tools/bench_e2e.py tpu
log "e2e A rc=$?"

log "4. e2e run B (warm-cache wall — the measurement of record)"
python tools/bench_e2e.py tpu
log "e2e B rc=$?"

log "5. report"
python tools/bench_e2e.py report
log "ALL DONE"
