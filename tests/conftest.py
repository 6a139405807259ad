"""Test config: force an 8-virtual-device CPU platform so sharding/SPMD tests
run without TPU hardware, and make the repo importable.

Note: the environment pre-registers a TPU PJRT plugin that prepends itself to
jax_platforms even when JAX_PLATFORMS=cpu is exported, so we must override the
config explicitly after importing jax.
"""

import os
import sys

# see hold_tpu/__init__.py: cv2's OpenMP workers starve XLA:CPU otherwise
os.environ.setdefault("OPENCV_FOR_THREADS_NUM", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
