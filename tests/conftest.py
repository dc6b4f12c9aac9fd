"""Test config: run on a virtual 8-device CPU mesh with x64 available.

Multi-device sharding tests simulate the TPU ICI mesh on CPU devices
(SURVEY.md §4 item 5); float64 is enabled so math-core parity tests can
compare against tight closed forms.

Note: this container's sitecustomize pre-imports jax and sets
JAX_PLATFORMS=axon (the TPU tunnel), so plain env vars are too late here —
we must go through jax.config.update before any backend is initialized.
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# persistent compile cache across test sessions (the suite is compile-bound)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
