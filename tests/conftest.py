"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere (including via
rs_detection_tpu imports), so this executes at conftest collection time.
"""

import os
import sys

# force CPU: the shell env exports JAX_PLATFORMS=axon (TPU
# tunnel) — tests must run on the virtual 8-device CPU mesh. pytest
# plugins preload jax before conftest runs, so setting the env var is
# not enough; flip the config too (backends are not initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/rs_detection_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
