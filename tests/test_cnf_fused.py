"""Fused CNF dynamics kernel (ops/cnf_fused.py) vs the XLA jax.jvp
composition, through the TPU interpreter on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from caspr_tpu.models.cnf import CNFConfig, odenet_apply, odenet_init
from caspr_tpu.ops.cnf_fused import (
    _reference_dynamics,
    can_fuse,
    fused_concatsquash_dynamics,
)

CFG = CNFConfig(input_dim=3, dims=(128, 128, 128), zdim=16)


def _setup(key=0, bt=2, n=256, cfg=CFG):
    k = jax.random.split(jax.random.PRNGKey(key), 4)
    params = odenet_init(k[0], cfg)
    tc = jax.random.normal(k[1], (bt, 1 + cfg.zdim)) * 0.5
    y = jax.random.normal(k[2], (bt, n, cfg.input_dim))
    e = jax.random.normal(k[3], (bt, n, cfg.input_dim))
    return params, tc, y, e


def _xla_oracle(params, cfg, tc, y, e):
    dx, jvp_val = jax.jvp(
        lambda x_: odenet_apply(params, cfg, tc, x_), (y,), (e,)
    )
    return dx, jnp.sum(jvp_val * e, axis=-1)


def test_can_fuse_gating():
    assert can_fuse(CFG)
    assert can_fuse(CNFConfig(dims=(512, 512, 512), zdim=1600))
    assert not can_fuse(CNFConfig(dims=(32, 32)))  # not lane-aligned
    assert not can_fuse(CNFConfig(dims=(512, 256, 512)))  # non-uniform
    assert not can_fuse(CNFConfig(layer_type="concat"))
    assert not can_fuse(CNFConfig(nonlinearity="tanh"))


def test_fused_matches_xla_jvp_interpret():
    params, tc, y, e = _setup()
    want_dx, want_div = _xla_oracle(params, CFG, tc, y, e)
    with pltpu.force_tpu_interpret_mode():
        got_dx, got_div = fused_concatsquash_dynamics(params, tc, y, e)
    np.testing.assert_allclose(
        np.asarray(got_dx), np.asarray(want_dx), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_div), np.asarray(want_div), rtol=2e-5, atol=2e-4
    )


def test_fused_ragged_points_padding():
    # N not a lane multiple exercises the pad/slice path
    params, tc, y, e = _setup(key=1, bt=3, n=200)
    want_dx, want_div = _xla_oracle(params, CFG, tc, y, e)
    with pltpu.force_tpu_interpret_mode():
        got_dx, got_div = fused_concatsquash_dynamics(params, tc, y, e)
    np.testing.assert_allclose(
        np.asarray(got_dx), np.asarray(want_dx), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_div), np.asarray(want_div), rtol=2e-5, atol=2e-4
    )


def test_reference_dynamics_matches_model_path():
    # the custom_vjp backward differentiates _reference_dynamics; it must
    # be the same math as the model's jax.jvp composition
    params, tc, y, e = _setup(key=2)
    want = _xla_oracle(params, CFG, tc, y, e)
    got = _reference_dynamics(params, tc, y, e)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                               rtol=1e-6, atol=1e-6)


def test_fused_gradients_match_xla():
    params, tc, y, e = _setup(key=3, bt=2, n=128)

    def loss_fused(p, c, yy):
        with pltpu.force_tpu_interpret_mode():
            dx, div = fused_concatsquash_dynamics(p, c, yy, e)
        return jnp.sum(dx**2) + jnp.sum(jnp.sin(div))

    def loss_xla(p, c, yy):
        dx, div = _xla_oracle(p, CFG, c, yy, e)
        return jnp.sum(dx**2) + jnp.sum(jnp.sin(div))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(params, tc, y)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(params, tc, y)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    flat_x = jax.tree_util.tree_leaves(g_xla)
    for a, b in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_fused_two_dims_config():
    cfg = CNFConfig(input_dim=3, dims=(128, 128), zdim=8)
    assert can_fuse(cfg)
    params, tc, y, e = _setup(key=4, bt=2, n=128, cfg=cfg)
    want_dx, want_div = _xla_oracle(params, cfg, tc, y, e)
    with pltpu.force_tpu_interpret_mode():
        got_dx, got_div = fused_concatsquash_dynamics(params, tc, y, e)
    np.testing.assert_allclose(
        np.asarray(got_dx), np.asarray(want_dx), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_div), np.asarray(want_div), rtol=2e-5, atol=2e-4
    )


def test_bf16_matmul_mode_close():
    params, tc, y, e = _setup(key=5)
    want_dx, want_div = _xla_oracle(params, CFG, tc, y, e)
    with pltpu.force_tpu_interpret_mode():
        got_dx, got_div = fused_concatsquash_dynamics(params, tc, y, e,
                                                      "bf16")
    # bf16 matmuls: ~0.4% relative error budget
    np.testing.assert_allclose(
        np.asarray(got_dx), np.asarray(want_dx), rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(got_div), np.asarray(want_div), rtol=0.05, atol=0.5
    )


def test_cnf_block_end_to_end_fused_vs_xla(monkeypatch):
    """cnf_block_apply with the pallas dynamics must reproduce the XLA
    path (same solve, same NFE) at small scale."""
    from caspr_tpu.models.cnf import cnf_block_apply, cnf_block_init

    cfg = CNFConfig(input_dim=3, dims=(128, 128), zdim=8,
                    atol=1e-4, rtol=1e-4)
    key = jax.random.PRNGKey(7)
    params = cnf_block_init(key, cfg)
    x = jax.random.normal(key, (2, 64, 3)) * 0.3
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, cfg.zdim)) * 0.3
    lp = jnp.zeros((2, 64, 1))

    monkeypatch.setenv("CASPR_TPU_CNF_KERNEL", "xla")
    y_x, lp_x, nfe_x = cnf_block_apply(params, cfg, x, ctx, lp, key, False)

    monkeypatch.setenv("CASPR_TPU_CNF_KERNEL", "pallas")
    with pltpu.force_tpu_interpret_mode():
        y_p, lp_p, nfe_p = cnf_block_apply(
            params, cfg, x, ctx, lp, key, False
        )
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp_p), np.asarray(lp_x),
                               rtol=1e-4, atol=1e-3)
    assert abs(float(nfe_p) - float(nfe_x)) <= 6.0


def test_fused_backward_kernel_matches_xla(monkeypatch):
    """The fused augmented-dynamics backward kernel (CASPR_TPU_CNF_BWD=
    pallas) must reproduce the XLA composition's vjp for params, context
    and y — including the divergence's Hessian-vector term."""
    params, tc, y, e = _setup(key=6, bt=2, n=200)

    def loss(p, c, yy):
        dx, div = fused_concatsquash_dynamics(p, c, yy, e)
        return jnp.sum(dx**2) + jnp.sum(jnp.sin(div))

    monkeypatch.setenv("CASPR_TPU_CNF_BWD", "pallas")
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss, argnums=(0, 1, 2))(params, tc, y)
    monkeypatch.setenv("CASPR_TPU_CNF_BWD", "xla")
    with pltpu.force_tpu_interpret_mode():
        g_xla = jax.grad(loss, argnums=(0, 1, 2))(params, tc, y)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_fused_backward_kernel_two_dims(monkeypatch):
    cfg = CNFConfig(input_dim=3, dims=(128, 128), zdim=8)
    params, tc, y, e = _setup(key=7, bt=3, n=128, cfg=cfg)

    def loss(p, c, yy):
        dx, div = fused_concatsquash_dynamics(p, c, yy, e)
        return jnp.sum(dx * dx) + jnp.sum(div)

    monkeypatch.setenv("CASPR_TPU_CNF_BWD", "pallas")
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss, argnums=(0, 1, 2))(params, tc, y)
    monkeypatch.setenv("CASPR_TPU_CNF_BWD", "xla")
    with pltpu.force_tpu_interpret_mode():
        g_xla = jax.grad(loss, argnums=(0, 1, 2))(params, tc, y)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


# ------------------------- manual (stream-stacked) backward ----------------


def test_manual_vjp_matches_autodiff():
    """_manual_dynamics_vjp must reproduce jax.vjp(_reference_dynamics)
    for params, context and y — same math, stream-stacked matmuls."""
    from caspr_tpu.ops.cnf_fused import _manual_dynamics_vjp

    for key, bt, n, cfg in (
        (8, 2, 256, CFG),
        (9, 3, 200, CNFConfig(input_dim=3, dims=(128, 128), zdim=8)),
        (10, 1, 64, CNFConfig(input_dim=3, dims=(64, 64, 64, 64), zdim=4)),
    ):
        params, tc, y, e = _setup(key=key, bt=bt, n=n, cfg=cfg)
        kd, kv = jax.random.split(jax.random.PRNGKey(100 + key))
        ct_dx = jax.random.normal(kd, y.shape)
        ct_div = jax.random.normal(kv, y.shape[:2])

        _, vjp = jax.vjp(
            lambda p, c, yy: _reference_dynamics(p, c, yy, e), params, tc, y
        )
        want = vjp((ct_dx, ct_div))
        got = _manual_dynamics_vjp(params, tc, y, e, ct_dx, ct_div)
        assert (
            jax.tree_util.tree_structure(got[0])
            == jax.tree_util.tree_structure(want[0])
        )
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5
            )


def test_manual_backward_end_to_end(monkeypatch):
    """CASPR_TPU_CNF_BWD=manual grads through the fused custom_vjp match
    the xla mode, including second-order terms via jnp.sin(div)."""
    params, tc, y, e = _setup(key=11, bt=2, n=200)

    def loss(p, c, yy):
        with pltpu.force_tpu_interpret_mode():
            dx, div = fused_concatsquash_dynamics(p, c, yy, e)
        return jnp.sum(dx**2) + jnp.sum(jnp.sin(div))

    monkeypatch.setenv("CASPR_TPU_CNF_BWD", "manual")
    g_man = jax.grad(loss, argnums=(0, 1, 2))(params, tc, y)
    monkeypatch.setenv("CASPR_TPU_CNF_BWD", "xla")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(params, tc, y)
    for a, b in zip(jax.tree_util.tree_leaves(g_man),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


# ------------------------- primal-only (sampling) kernel -------------------


def test_fused_primal_matches_oracle_interpret():
    from caspr_tpu.ops.cnf_fused import (
        _reference_primal,
        fused_concatsquash_primal,
    )

    params, tc, y, _ = _setup(key=6)
    want = odenet_apply(params, CFG, tc, y)
    ref = _reference_primal(params, tc, y)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(want), rtol=1e-6)
    with pltpu.force_tpu_interpret_mode():
        got = fused_concatsquash_primal(params, tc, y)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_primal_ragged_and_grads():
    from caspr_tpu.ops.cnf_fused import fused_concatsquash_primal

    params, tc, y, _ = _setup(key=7, bt=3, n=200)
    want = odenet_apply(params, CFG, tc, y)
    with pltpu.force_tpu_interpret_mode():
        got = fused_concatsquash_primal(params, tc, y)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss_fused(p, c, yy):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_concatsquash_primal(p, c, yy) ** 2)

    def loss_xla(p, c, yy):
        return jnp.sum(odenet_apply(p, CFG, c, yy) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(params, tc, y)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(params, tc, y)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_sample_mode_skips_divergence(monkeypatch):
    """cnf_block_apply with logpx=None must integrate x alone; the result
    stays within solver tolerance of the integrate-everything reference
    path (CASPR_TPU_SAMPLE_DIV=1), which itself must match the old
    stacked-state behavior bit-for-bit."""
    from caspr_tpu.models.cnf import cnf_block_apply, cnf_block_init

    cfg = CNFConfig(input_dim=3, dims=(128, 128), zdim=8,
                    atol=1e-5, rtol=1e-5)
    key = jax.random.PRNGKey(11)
    params = cnf_block_init(key, cfg)
    x = jax.random.normal(key, (2, 64, 3)) * 0.3
    ctx = jax.random.normal(jax.random.fold_in(key, 1), (2, cfg.zdim)) * 0.3

    monkeypatch.setenv("CASPR_TPU_CNF_KERNEL", "xla")
    y_fast, lp_fast, nfe_fast = cnf_block_apply(
        params, cfg, x, ctx, None, key, True
    )
    assert float(jnp.max(jnp.abs(lp_fast))) == 0.0

    monkeypatch.setenv("CASPR_TPU_SAMPLE_DIV", "1")
    y_ref, _, nfe_ref = cnf_block_apply(params, cfg, x, ctx, None, key, True)
    # same field, different error norm -> slightly different accepted
    # steps; results agree within a small multiple of the tolerance
    np.testing.assert_allclose(
        np.asarray(y_fast), np.asarray(y_ref), rtol=1e-3, atol=1e-3
    )
    # with the explicit-zeros logp the div channel is integrated: the
    # reference-parity path must equal passing explicit zeros
    lp0 = jnp.zeros((2, 64, 1))
    y_z, _, nfe_z = cnf_block_apply(params, cfg, x, ctx, lp0, key, True)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_z))
    assert float(nfe_ref) == float(nfe_z)


def test_flow_apply_sampling_path(monkeypatch):
    """flow_apply with logpx=None (decode) runs the no-div path end to end
    and returns x of the right shape with logp None."""
    from caspr_tpu.models.cnf import flow_apply, flow_init

    cfg = CNFConfig(input_dim=3, dims=(128, 128), zdim=8,
                    atol=1e-4, rtol=1e-4)
    key = jax.random.PRNGKey(13)
    params, state = flow_init(key, cfg)
    y = jax.random.normal(key, (2, 32, 3))
    ctx = jax.random.normal(jax.random.fold_in(key, 2), (2, cfg.zdim)) * 0.3

    monkeypatch.setenv("CASPR_TPU_CNF_KERNEL", "xla")
    x, lp, _, nfe = flow_apply(
        params, state, cfg, y, ctx, None, key, reverse=True, training=False
    )
    assert x.shape == y.shape and lp is None and float(nfe) > 0
    monkeypatch.setenv("CASPR_TPU_SAMPLE_DIV", "1")
    x_ref, _, _, _ = flow_apply(
        params, state, cfg, y, ctx, None, key, reverse=True, training=False
    )
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=1e-3, atol=1e-3
    )
