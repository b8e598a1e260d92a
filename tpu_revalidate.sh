#!/bin/bash
# Full TPU validation sequence after the interp rework + harness fix.
# Run when the axon tunnel recovers; appends to tpu_revalidate.log.
set -u
LOG=tpu_revalidate.log
echo "=== revalidate $(date) ===" >> $LOG
run() {
  echo "--- $1 ---" >> $LOG
  timeout "$2" python -u "$1" ${3:-} >> $LOG 2>&1
  echo "exit=$? ($1)" >> $LOG
}
run smoke_tpu.py 900
run smoke_accuracy_tpu.py 1200
run profile_mod3.py 1750 full
run bench_all.py 1750
run probe_bench_dce.py 1750
run probe_fused_db.py 1750
run probe_transposed2.py 1750
run bench.py 900
echo "=== done $(date) ===" >> $LOG
