#!/bin/bash
# Run the Verify dump at sf0.01 and compare against DuckDB locally —
# a replica of the driver's correctness gate.
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -Ei 'error|exception|\[verify\]' | head -30 || true
python3 scripts/oracle_check.py "$SF" "$OUT"
