"""Test configuration.

Tests run on a virtual 8-device CPU mesh so sharded code paths execute
without TPU hardware (the driver separately validates the multi-chip path,
and benches run on the real chip).

Note: jax is pre-imported in this environment, so platform selection must go
through jax.config (env vars are too late).
"""
import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")
# f64 flavors are part of the API surface; tests exercise both precisions.
jax.config.update("jax_enable_x64", True)
