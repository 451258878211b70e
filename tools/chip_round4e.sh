#!/bin/bash
# Round-4 chip queue, part E: K=55 rerun at a depth that fits HBM.
#     nohup bash tools/chip_round4e.sh <wait_pid> > /tmp/chip_round4e.log 2>&1 &
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
echo "== $(date +%H:%M:%S) K=55 rerun"
python tools/bench_ksweep.py --ks 55
echo "== $(date +%H:%M:%S) rc=$? DONE"
