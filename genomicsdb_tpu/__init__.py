"""genomicsdb_tpu: TPU-native variant-array engine.

The flattened genome axis spans ~3.1e9 positions (> int32), so 64-bit JAX
types are enabled package-wide.  Per-block kernels still use int32 for field
data; only coordinates are int64.
"""

try:
    import jax

    jax.config.update("jax_enable_x64", True)
except ImportError:  # pure-host usage
    pass

__version__ = "0.1.0"
