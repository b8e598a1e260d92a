#!/bin/bash
# Round-4 on-chip revalidation sequence (run after a tunnel outage or
# kernel change).  Each step is bounded; a hang means the tunnel is
# still bad — probe with a tiny op before debugging anything.
set -x
cd "$(dirname "$0")"
timeout 120  python -c "import jax; print('tiny op', float(jax.numpy.ones((1024,)).sum()))" || exit 1
timeout 1200 python smoke_tpu.py           | tail -3
timeout 1200 python smoke_accuracy_tpu.py  | tail -4
timeout 1800 python probe_chan_pallas.py   | tail -5   # channelizer kernel
timeout 1800 python probe_resample.py      | tail -6   # resample kernel
timeout 1800 python probe_os3.py           | tail -4   # overlap-save kernel
timeout 1800 python bench.py               | tail -1   # flagship
timeout 3000 python bench_all.py --merge BENCH_ALL_r04.json | tail -8
