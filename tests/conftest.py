"""Test environment: CPU backend with 8 virtual devices for sharding tests.

XLA flags must be set before the jax backend initializes; the platform
override must also beat the sandbox's sitecustomize (which pins
JAX_PLATFORMS to the TPU plugin), so we update jax.config directly.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("ODIL_DTYPE", "float64")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
