#!/bin/bash
# Round-4 chip queue, part C: microbench evidence (spill merge, K sweep)
# then quiet-host CPU-mesh sweeps (must not overlap any TPU client).
#     nohup bash tools/chip_round4c.sh <wait_pid> > /tmp/chip_round4c.log 2>&1 &
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
log() { echo "== $(date +%H:%M:%S) $*"; }

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  log "waiting for pid $WAIT_PID (part B) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

log "1. exact-capacity vs legacy 2x receive merge (chip)"
python tools/bench_spill_merge.py
log "spill merge rc=$?"

log "2. K sweep with the round-4 pipeline (chip)"
python tools/bench_ksweep.py
log "ksweep rc=$?"

log "3. async-window sweep (CPU mesh, quiet host)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python tools/bench_async_stream.py
log "async sweep rc=$?"

log "4. weak-scaling sweep (CPU mesh, quiet host)"
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python tools/bench_scaling.py --devices 1 2 4 8
log "scaling rc=$?"

log "ALL DONE"
