#!/bin/bash
# Run the Verify dump at sf0.01 and compare against DuckDB locally —
# a replica of the driver's correctness gate.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
LOG=$(mktemp)
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tee "$LOG" | grep -Ei 'error|exception|\[verify\]' | head -30 || true
# hygiene gate: any operator cache that survives its query's releaseAll
# is a regression even when every value matches
if grep -q '\[verify\] LEAK' "$LOG"; then
  echo "== FAIL: leaked operator-internal caches =="
  grep '\[verify\] LEAK' "$LOG"
  rm -f "$LOG"
  exit 1
fi
rm -f "$LOG"
python3 scripts/oracle_check.py "$SF" "$OUT"
