#!/bin/bash
set -u
LOG=tpu_revalidate.log
echo "=== revalidate3 (array carry) $(date) ===" >> $LOG
run() {
  echo "--- $1 ---" >> $LOG
  timeout "$2" python -u "$1" ${3:-} >> $LOG 2>&1
  echo "exit=$? ($1)" >> $LOG
}
run bench.py 900
run smoke_accuracy_tpu.py 1200
run bench_all.py 1750
run profile_mod3.py 1750 full
echo "=== done3 $(date) ===" >> $LOG
