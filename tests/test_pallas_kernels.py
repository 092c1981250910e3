"""Pallas kernel tests, run through the TPU interpreter on CPU so the
kernels are exercised without hardware (SURVEY.md §4 plan)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from caspr_tpu.ops.pointops import farthest_point_sampling_xla
from caspr_tpu.ops.pallas_kernels import farthest_point_sampling_pallas


def test_fps_pallas_matches_xla_interpret():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(3, 160, 3).astype(np.float32) * 0.4)
    want = np.asarray(farthest_point_sampling_xla(xyz, 40))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(farthest_point_sampling_pallas(xyz, 40))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_identity_shortcut():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    got = np.asarray(farthest_point_sampling_pallas(xyz, 16))
    np.testing.assert_array_equal(got, np.tile(np.arange(16), (2, 1)))
