"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(``--xla_force_host_platform_device_count=8``); the real TPU is reserved for
bench runs.

The dev image registers the TPU-tunnel PJRT plugin from a sitecustomize hook
and exports ``JAX_PLATFORMS=axon``, so jax is already imported when pytest
starts; ``jax.config.update`` (which overrides the env var) is the reliable
way to pin tests to CPU. XLA_FLAGS still takes effect because the CPU backend
initializes lazily on first use, which is after conftest import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache (explicit opt-in — library imports no longer
# set it; repeated suite runs reuse compiled programs).
from ikflow_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()
