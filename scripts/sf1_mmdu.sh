#!/bin/bash
# Detached sf1 oracle run for the round-15 5-leg mm_dup_union shape
# (verdict r15 task #1): Spark dump at /tmp/graft_sf1, then the DuckDB
# replay with the norm-precompute CTE (bit-identical hoist of the
# per-pair sqrt(list_dot_product(a,a)) — same ops, same doubles).
set -e
cd /root/repo
OUT=${1:-/tmp/verify_sf1_mmdu}
rm -rf "$OUT"
SPARK_GRAFT_ONLY=mm_dup_union SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify /tmp/graft_sf1 $OUT" 2>&1 \
  | grep -Ei '\[verify\]|error]' | grep -v 'INFO\|WARN' | head -5 || true
echo "== spark dump done $(date -u +%H:%M:%S) =="
python3 scripts/oracle_check.py /tmp/graft_sf1 "$OUT"
