/* Minimal C consumer of the basic_dsp_tpu C ABI — the analog of the
 * reference's examples/basic_dsp_example.py (which drives the Rust cdylib
 * via ctypes).
 *
 * Build (after `make interop`):
 *   gcc examples/c_example.c -Iinterop/include -Linterop/build \
 *       -lbasic_dsp_tpu -Wl,-rpath,$PWD/interop/build -o /tmp/c_example
 */
#include <stdio.h>

#include "basic_dsp_tpu.h"

int main(void) {
  if (bdsp_init() != 0) {
    fprintf(stderr, "init failed: %s\n", bdsp_last_error());
    return 1;
  }

  /* 100k-sample real time vector, repeatedly offset — the reference
   * example's loop. */
  DspVec *vec = new64(0, 0, 0.0, 100000, 1.0);
  printf("at start: vec[0] = %f\n", get_value64(vec, 0));
  for (int i = 0; i < 5; ++i) {
    VectorResult r = real_offset64(vec, 5.0);
    if (r.result_code != 0) {
      fprintf(stderr, "offset failed: %d\n", r.result_code);
      return 1;
    }
    vec = r.vector;
  }
  printf("after 5 offsets of 5.0: vec[0] = %f\n", get_value64(vec, 0));

  /* Windowed FFT magnitude of a sine. */
  DspVec *sig = new64(0, 0, 0.0, 64, 1.0);
  for (int i = 0; i < 64; ++i) {
    VectorResult r = set_value64(sig, i, i % 8 == 0 ? 1.0 : 0.0);
    sig = r.vector;
  }
  VectorResult c = to_complex64(sig);
  VectorResult f = windowed_fft64(c.vector, 1 /* Hamming */);
  VectorResult m = magnitude64(f.vector);
  RealStatistics stats;
  real_statistics64(m.vector, &stats);
  printf("spectrum peak %f at bin %llu\n", stats.max,
         (unsigned long long)stats.max_index);

  delete_vector64(vec);
  delete_vector64(m.vector);
  printf("ok\n");
  return 0;
}
