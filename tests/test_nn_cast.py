"""CASPR_TPU_MATMUL_CAST: the explicit bf16 operand cast for nn.linear.

The suite's conftest pins jax_default_matmul_precision='highest', which
(correctly) disables the cast — these tests flip the config locally so
the cast path itself is exercised on CPU via the 'force' escape hatch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from caspr_tpu.nn.core import linear, linear_init


def test_matmul_cast_force_close_and_guards(monkeypatch):
    p = linear_init(jax.random.PRNGKey(0), 64, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 64))
    base = np.asarray(linear(p, x))

    prev = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", None)

        # mode=1 on CPU: backend guard keeps full f32 (bit-identical)
        monkeypatch.setenv("CASPR_TPU_MATMUL_CAST", "1")
        np.testing.assert_array_equal(np.asarray(linear(p, x)), base)

        # force: the cast path actually runs -> bf16-scale difference
        monkeypatch.setenv("CASPR_TPU_MATMUL_CAST", "force")
        got = np.asarray(linear(p, x))
        assert not np.array_equal(got, base)  # really took the cast path
        np.testing.assert_allclose(got, base, rtol=3e-2, atol=2e-2)

        # --matmul-precision highest disables even force
        jax.config.update("jax_default_matmul_precision", "highest")
        np.testing.assert_array_equal(np.asarray(linear(p, x)), base)
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
