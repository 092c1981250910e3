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

# Workaround for a jax 0.9.0 deadlock in Pallas TPU interpret mode on
# this single-core CPU client: io_callback hands the interpreter's
# callbacks jax.Arrays, and operations like `device_id * n` or
# `tuple(int(x) for x in block_indices)` (interpret_pallas_call.py:643,
# shared_memory.py:589) then DISPATCH NEW XLA COMPUTATIONS from the
# callback thread — which intermittently deadlocks against the main
# thread's dispatch (observed: suite hangs in test_sa_fused2.py's
# full-backbone interpret tests, every thread parked in futex_wait).
# Restore the legacy callback contract — deliver numpy arrays — at the
# FlatCallback chokepoint: np.asarray of an already-materialized arg is
# a plain host transfer, so callback code never re-enters the dispatcher.
import numpy as _np  # noqa: E402
import jax._src.callback as _jcb  # noqa: E402

_orig_flat_call = _jcb._FlatCallback.__call__


def _numpy_flat_call(self, *flat_args):
    flat_args = tuple(
        _np.asarray(a) if isinstance(a, jax.Array) else a for a in flat_args
    )
    return _orig_flat_call(self, *flat_args)


_jcb._FlatCallback.__call__ = _numpy_flat_call
# persistent compile cache: repeated suite runs skip recompiling the big
# adjoint/while-loop programs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
