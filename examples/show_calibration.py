"""Port of reference examples/show_calibration.rs: run the one-time
autotune calibration and print the report."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import basic_dsp_tpu as bd

best = bd.autotune.calibrate(n=1 << 18,
                             block_candidates=(512, 1024, 2048, 4096),
                             iters=2)
bd.autotune.print_calibration()
print(f"calibration installed: {best}")
