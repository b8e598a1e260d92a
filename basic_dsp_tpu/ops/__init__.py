"""Pure functional op kernels over raw jnp arrays.

Every function here is jit-traceable (static shapes, no Python control flow on
traced values) — this layer is what gets fused by XLA and is shared by the
single-chip vector API, the matrix (channel) layer, and the sharded
multi-chip paths.
"""
