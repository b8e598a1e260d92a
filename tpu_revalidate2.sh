#!/bin/bash
# Reordered on-chip revalidation: bench-critical audits first.
set -u
LOG=tpu_revalidate.log
echo "=== revalidate2 $(date) ===" >> $LOG
run() {
  echo "--- $1 ---" >> $LOG
  timeout "$2" python -u "$1" ${3:-} >> $LOG 2>&1
  echo "exit=$? ($1)" >> $LOG
}
run smoke_tpu.py 600
run probe_bench_dce.py 900
run probe_transposed2.py 900
run probe_fused_db.py 900
run bench.py 900
run smoke_accuracy_tpu.py 1200
run bench_all.py 1750
run profile_mod3.py 1750 full
echo "=== done2 $(date) ===" >> $LOG
