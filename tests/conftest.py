"""Test config: run JAX on CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware (bench.py uses the real
chip; tests must be hermetic)."""
import os
import sys

# Force CPU: the session env presets JAX_PLATFORMS=axon (TPU tunnel),
# so these must be overwritten, not defaulted.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compilation cache: recon programs are shape-specialized
# and dominate test wall time otherwise (env vars are ignored by this
# jax build; the config API works)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ffmpeg_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".refbuild")
REF_FFMPEG = os.path.join(REFBUILD, "ffmpeg")
