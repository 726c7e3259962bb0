"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/mesh tests run
against XLA's host-platform device partitioning. Bench runs (bench.py) use
the real TPU chip instead.

NOTE: this environment's sitecustomize registers the tunneled TPU backend
(axon) at interpreter start and jax captures JAX_PLATFORMS from the
environment at import time — so the platform must be overridden
*programmatically* after import, not via os.environ.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
