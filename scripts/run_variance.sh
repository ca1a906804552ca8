#!/bin/bash
# Bench variance study driver (VERDICT r4 item 2). Serializes all TPU work.
# Usage: bash scripts/run_variance.sh /tmp/var_r5
set -u
OUT=${1:-/tmp/var_r5}
mkdir -p "$OUT"
cd /root/repo

echo "=== in-process permuted order ===" | tee "$OUT/inproc.log"
timeout 3600 python scripts/bench_variance.py 2>"$OUT/inproc.err" | tee -a "$OUT/inproc.log"

echo "=== fresh-process MODE=both x4 ===" | tee "$OUT/fresh_both.log"
for i in 1 2 3 4; do
  echo "--- run $i ---" | tee -a "$OUT/fresh_both.log"
  timeout 1800 python bench.py 2>>"$OUT/fresh_both.err" | tee -a "$OUT/fresh_both.log"
done

echo "=== fresh-process isolated modes x2 ===" | tee "$OUT/fresh_iso.log"
for i in 1 2; do
  for m in clip warm stream; do
    echo "--- $m run $i ---" | tee -a "$OUT/fresh_iso.log"
    BENCH_MODE=$m timeout 1800 python bench.py 2>>"$OUT/fresh_iso.err" | tee -a "$OUT/fresh_iso.log"
  done
done
echo "DONE" | tee "$OUT/done"
