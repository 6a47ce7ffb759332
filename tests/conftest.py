"""Test config: run JAX on CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware (bench.py uses the real
chip; tests must be hermetic)."""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the axon TPU plugin ignores JAX_PLATFORMS; the legacy var does work
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFBUILD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".refbuild")
REF_FFMPEG = os.path.join(REFBUILD, "ffmpeg")
