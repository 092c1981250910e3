"""Pallas approxmatch-EMD forward kernel (ops/emd_pallas.py) vs the XLA
composition (ops/metrics.py::_approx_match + _match_cost), through the
TPU interpreter."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from caspr_tpu.ops.emd_pallas import approx_match_emd_pallas, can_emd_pallas
from caspr_tpu.ops.metrics import _approx_match, _match_cost


def _xla_emd(x1, x2):
    out = []
    for a, b in zip(x1, x2):
        out.append(_match_cost(a, b, _approx_match(a, b)))
    return jnp.stack(out)


def _clouds(key, b, n, m, scale=1.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    return (
        jax.random.uniform(k1, (b, n, 3)) * scale,
        jax.random.uniform(k2, (b, m, 3)) * scale,
    )


def test_emd_kernel_matches_xla_square():
    x1, x2 = _clouds(0, b=2, n=128, m=128)
    want = np.asarray(_xla_emd(x1, x2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(approx_match_emd_pallas(x1, x2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_emd_kernel_unequal_sizes_and_padding():
    # N not a sublane multiple, M not a lane multiple: exercises the
    # zero-capacity padding rows/lanes
    x1, x2 = _clouds(1, b=2, n=100, m=150)
    want = np.asarray(_xla_emd(x1, x2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(approx_match_emd_pallas(x1, x2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_emd_kernel_multi_tile():
    # M spans multiple 512-lane tiles
    x1, x2 = _clouds(2, b=1, n=64, m=1024)
    want = np.asarray(_xla_emd(x1, x2))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(approx_match_emd_pallas(x1, x2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_emd_kernel_identity_near_zero():
    x1, _ = _clouds(3, b=2, n=96, m=96)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(approx_match_emd_pallas(x1, x1))
    # matching a cloud to itself: near-zero transport cost per point
    assert np.all(got / 96 < 5e-3)


def test_can_emd_pallas_guard():
    assert can_emd_pallas(2048, 2048)
    assert not can_emd_pallas(65536, 65536)
