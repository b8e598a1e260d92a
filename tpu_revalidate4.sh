#!/bin/bash
# Round-3 on-chip revalidation sequence (run after an axon outage or on a
# fresh runtime; CLAUDE.md: probe with a trivial op first, trust the
# first failure).  Appends to tpu_revalidate.log.
set -u
LOG=tpu_revalidate.log
echo "=== revalidate4 (round 3) $(date) ===" >> $LOG
run() {
  echo "--- $1 ---" >> $LOG
  timeout "$2" python -u "$1" ${3:-} >> $LOG 2>&1
  echo "exit=$? ($1)" >> $LOG
}
run smoke_tpu.py 900
run smoke_accuracy_tpu.py 1200
run bench.py 900
run probe_os3.py 900          # overlap-save kernel parity + A/B
run probe_os3_geom.py 900     # parity across fft_len geometries
run probe_budget.py 1200      # precision-budget A/B (4 modes)
run probe_breakdown3.py 1750  # cumulative planar stage profile
echo "--- bench_all ---" >> $LOG
timeout 1750 python -u bench_all.py --json BENCH_ALL_r03.json >> $LOG 2>&1
echo "exit=$? (bench_all)" >> $LOG
echo "=== done4 $(date) ===" >> $LOG
