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

# NOTE: no persistent compile cache here — this jaxlib's XLA:CPU AOT
# serialization is unreliable (serialize segfaults, deserialize aborts),
# so CPU test runs compile fresh (pipeline._ensure_compile_cache only
# enables the cache on TPU backends).

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".refbuild")
REF_FFMPEG = os.path.join(REFBUILD, "ffmpeg")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _fresh_frame_programs():
    """Reset the capacity ratchet and compiled-program cache per test.

    Programs whose capacities were ratcheted up by earlier tests grow
    large enough to crash this jaxlib's XLA:CPU compiler (segfault in
    backend_compile on the 96x96 RA program with inherited caps); each
    test compiling its own tightly-sized programs is also what a fresh
    decoder session would do."""
    from ffmpeg_tpu.models.vvc import pipeline

    pipeline._CAPS.clear()
    pipeline._PROGRAM_CACHE.clear()
    yield
