"""Test config: run JAX on CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware (bench.py uses the real
chip; tests must be hermetic)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU with 8 virtual devices.  The JAX_PLATFORMS / XLA_FLAGS env
# vars are IGNORED by this jax build (the axon TPU plugin wins platform
# selection regardless); only the config API works, and it must run
# before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent XLA compilation cache: recon programs are shape-specialized
# and dominate test wall time otherwise

jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpeg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".refbuild")
REF_FFMPEG = os.path.join(REFBUILD, "ffmpeg")
