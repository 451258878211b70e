#!/usr/bin/env bash
# Build the reference HySortK binary from the read-only tree at /root/reference
# against the single-rank MPI shim, producing the golden test oracle at
# .oracle/hysortk_ref_K<k>_L<l>_U<u>. Objects go under .oracle/; /root/reference
# is never written to.
#
# Usage: tools/build_reference.sh [K [M [L [U]]]]
set -euo pipefail

K=${1:-31}
M=${2:-17}
L=${3:-2}
U=${4:-50}
EXT=${5:-0}

REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference
OUT="$REPO/.oracle"
SHIM="$REPO/tools/mpi_shim"
BUILD="$OUT/build_K${K}_M${M}_L${L}_U${U}_E${EXT}"
BIN="$OUT/hysortk_ref_K${K}_M${M}_L${L}_U${U}_E${EXT}"

if [[ -x "$BIN" ]]; then
  echo "$BIN"
  exit 0
fi

mkdir -p "$BUILD"

CXX=${CXX:-g++}
CC=${CC:-gcc}
FLAGS=(-O2 -std=c++17 -fopenmp -mavx2 -I"$SHIM" -I"$REF/include"
       -I"$REF/dependency/Raduls" -I"$REF/dependency/Paradis"
       -DKMER_SIZE="$K" -DMINIMIZER_SIZE="$M"
       -DLOWER_KMER_FREQ="$L" -DUPPER_KMER_FREQ="$U"
       -DEXTENSION="$EXT" -DLOG_LEVEL=1 -DDEBUG=0
       -DTHREAD_PER_WORKER=2 -DMAX_THREAD_MEMORY_BOUNDED=4
       -DAVG_TASK_PER_WORKER=3 -DMAX_SEND_BATCH=80000
       -DDISPATCH_UPPER_COE=1.5 -DDISPATCH_STEP=0.05 -DUNBALANCED_RATIO=2.3
       -DSORT=0)

$CC -O2 -c "$SHIM/mpi_shim.c" -o "$BUILD/mpi_shim.o"

for src in "$REF"/src/*.cpp; do
  obj="$BUILD/$(basename "${src%.cpp}").o"
  [[ -f "$obj" ]] || $CXX "${FLAGS[@]}" -c "$src" -o "$obj"
done

# RADULS sorting networks (large generated files; required by the partial link)
for src in "$REF"/dependency/Raduls/sorting_network.cpp; do
  obj="$BUILD/$(basename "${src%.cpp}").o"
  [[ -f "$obj" ]] || $CXX "${FLAGS[@]}" -c "$src" -o "$obj"
done

$CXX "${FLAGS[@]}" "$REF/standalone/main.cpp" "$BUILD"/*.o -o "$BIN"
echo "$BIN"
