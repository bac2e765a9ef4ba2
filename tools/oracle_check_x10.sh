#!/bin/bash
# SCALE §9.24 protocol: the full-suite replica comparison, ONE PROCESS per
# query (a shared DuckDB process accumulates allocator state across ~120
# 1M-row comparisons until a 4 KB allocation fails and every later query
# inherits the OOM). q_triangle_count goes through the sharded checker
# (its single-query oracle exceeds box memory+disk at 10x, §9.21).
# Usage: tools/oracle_check_x10.sh <sfDir> <verifyOutDir> [logFile]
set -u
SF=${1:?sfDir}
OUT=${2:?verifyOutDir}
LOG=${3:-/tmp/oracle_x10.log}
: > "$LOG"
# SCALE §9.29 gate: a Verify/Bench JVM still exiting holds tens of GB of
# heap; a DuckDB comparison started under it can die with "Failed to
# allocate block" — a spurious, NON-correctness certification failure
# that passes on isolated re-run. Wait for any graft JVM to exit, then
# for MemAvailable to recover, before the first comparison.
for _ in $(seq 1 120); do
  pgrep -f 'graft\.(Verify|Bench|ScaleBench)' >/dev/null 2>&1 || break
  sleep 2
done
for _ in $(seq 1 60); do
  avail=$(awk '/MemAvailable/{print $2}' /proc/meminfo 2>/dev/null)
  [ "${avail:-8388608}" -ge 8388608 ] && break  # >= 8 GiB free
  sleep 2
done
pass=0; fail=0; failed=""
for d in "$OUT"/*/; do
  q=$(basename "$d")
  if [ "$q" = "q_triangle_count" ]; then
    if python3 "$(dirname "$0")/triangle_shard_check.py" "$SF" "$OUT" \
        >> "$LOG" 2>&1; then pass=$((pass+1));
    else fail=$((fail+1)); failed="$failed $q"; fi
    continue
  fi
  if python3 "$(dirname "$0")/oracle_check.py" "$SF" "$OUT" "$q" \
      >> "$LOG" 2>&1; then pass=$((pass+1));
  else fail=$((fail+1)); failed="$failed $q"; fi
done
if [ $((pass + fail)) -eq 0 ]; then
  echo "== x10 replica: NO query dirs found under $OUT — vacuous run" >&2
  exit 2
fi
echo "== x10 replica: $pass pass, $fail fail$failed"
[ "$fail" -eq 0 ]
