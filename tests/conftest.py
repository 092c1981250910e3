"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the
TPU-world substitute for multi-GPU tests; see SURVEY.md §4).

NOTE: this container's sitecustomize force-registers the remote 'axon' TPU
backend and overrides the JAX_PLATFORMS env var, so we must override the
platform via jax.config *after* import (env vars alone are ignored)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: repeated suite runs skip recompiling the big
# adjoint/while-loop programs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
