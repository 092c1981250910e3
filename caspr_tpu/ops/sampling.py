"""Random sampling utilities (explicit-PRNG JAX versions of reference
caspr/models/utils.py and caspr/utils/transform_utils.py helpers)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def standard_normal_logprob(z):
    """Elementwise log N(z; 0, 1) (reference caspr/models/utils.py:10-12)."""
    log_z = -0.5 * math.log(2 * math.pi)
    return log_z - jnp.square(z) / 2.0


def truncated_normal(key, shape, trunc_std: float = 2.0, dtype=jnp.float32):
    """Standard normal truncated to +-trunc_std.

    The reference draws 4 candidates per slot and takes the first valid one
    (caspr/models/utils.py:15-22); we sample the truncated distribution
    exactly instead -- same law, no retry tail.
    """
    a = -trunc_std
    b = trunc_std
    return jax.random.truncated_normal(key, a, b, shape, dtype)


def sample_gaussian(key, shape, truncate_std=None, dtype=jnp.float32):
    """N(0,1) samples, optionally truncated (reference
    caspr/models/utils.py:24-29)."""
    if truncate_std is not None:
        return truncated_normal(key, shape, truncate_std, dtype)
    return jax.random.normal(key, shape, dtype)


def sphere_surface_points(key, num_points: int, radius: float = 0.5, dtype=jnp.float32):
    """Random points on a sphere surface by normalizing cube samples,
    matching reference caspr/utils/transform_utils.py:80-85 (used for the
    Gaussian-contour sampling mode of CaSPR.decode, caspr.py:232-250)."""
    cube = jax.random.uniform(
        key, (num_points, 3), dtype, minval=-1.0, maxval=1.0
    )
    norm = jnp.linalg.norm(cube, axis=1, keepdims=True)
    return cube / jnp.maximum(norm, 1e-12) * radius
