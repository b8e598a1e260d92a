#!/bin/bash
# Probe the axon tunnel with a trivial op; when it recovers, run the full
# revalidation sequence (tpu_revalidate.sh). Appends probe attempts to
# tunnel_watch.log. Exits after revalidation completes, or gives up after
# ~11h worst case (each failed iteration costs up to 150s hang + 150s
# sleep, so 135 iterations bound the watch at ~11.2h).
set -u
LOG=tunnel_watch.log
echo "=== watch start $(date) ===" >> $LOG
for i in $(seq 1 135); do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((1024,))
assert float(x.sum()) == 1024.0
print('TUNNEL_OK', jax.devices()[0].platform)
" >> $LOG 2>&1; then
    echo "=== tunnel recovered $(date), starting revalidate ===" >> $LOG
    bash tpu_revalidate.sh
    echo "=== revalidate finished $(date) ===" >> $LOG
    exit 0
  fi
  echo "probe $i failed $(date)" >> $LOG
  sleep 150
done
echo "=== watch gave up $(date) ===" >> $LOG
exit 1
