"""CNF dynamics parity against a PyTorch autograd oracle.

The reference computes the Hutchinson divergence with torch.autograd.grad
inside the dynamics (reference caspr/models/odefunc.py:13-31,119-136); we
use jax.jvp.  e^T J e is the same scalar either way — this test proves it
numerically on the full conditioned ODEnet with identical weights and
noise, which pins down the conditioning layout ([t, context] order), the
gate/bias broadcasting, and the divergence sign conventions."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from caspr_tpu.models.cnf import CNFConfig, _make_dynamics, odenet_init


class _TorchODEnet(torch.nn.Module):
    """ConcatSquash stack with softplus (reference odefunc.py:62-105 with
    diffeq_layers.py:76-90 semantics)."""

    def __init__(self, dims, input_dim, zdim):
        super().__init__()
        self.layers = torch.nn.ModuleList()
        d_in = input_dim
        for d_out in tuple(dims) + (input_dim,):
            blk = torch.nn.ModuleDict(
                {
                    "_layer": torch.nn.Linear(d_in, d_out),
                    "_hyper_bias": torch.nn.Linear(1 + zdim, d_out, bias=False),
                    "_hyper_gate": torch.nn.Linear(1 + zdim, d_out),
                }
            )
            self.layers.append(blk)
            d_in = d_out

    def forward(self, context, y):
        dx = y
        n = len(self.layers)
        for i, blk in enumerate(self.layers):
            gate = torch.sigmoid(blk["_hyper_gate"](context)).unsqueeze(1)
            bias = blk["_hyper_bias"](context).unsqueeze(1)
            dx = blk["_layer"](dx) * gate + bias
            if i < n - 1:
                dx = torch.nn.functional.softplus(dx)
        return dx


def _copy_weights(tm, params):
    for i, blk in enumerate(tm.layers):
        jl = params["layers"][i]
        with torch.no_grad():
            blk["_layer"].weight.copy_(torch.from_numpy(np.asarray(jl["_layer"]["weight"])))
            blk["_layer"].bias.copy_(torch.from_numpy(np.asarray(jl["_layer"]["bias"])))
            blk["_hyper_bias"].weight.copy_(
                torch.from_numpy(np.asarray(jl["_hyper_bias"]["weight"]))
            )
            blk["_hyper_gate"].weight.copy_(
                torch.from_numpy(np.asarray(jl["_hyper_gate"]["weight"]))
            )
            blk["_hyper_gate"].bias.copy_(
                torch.from_numpy(np.asarray(jl["_hyper_gate"]["bias"]))
            )


def test_cnf_dynamics_matches_torch_autograd():
    cfg = CNFConfig(dims=(24, 24), zdim=10)
    params = odenet_init(jax.random.PRNGKey(0), cfg)
    tm = _TorchODEnet(cfg.dims, cfg.input_dim, cfg.zdim)
    _copy_weights(tm, params)

    rng = np.random.RandomState(1)
    bt, n = 3, 12
    x = rng.randn(bt, n, 3).astype(np.float32) * 0.5
    ctx = rng.randn(bt, cfg.zdim).astype(np.float32)
    e = rng.randn(bt, n, 3).astype(np.float32)
    t_val = 0.37

    # --- torch oracle: autograd-based divergence (odefunc.py:13-31) ---
    tx = torch.from_numpy(x).requires_grad_(True)
    tctx = torch.from_numpy(ctx)
    te = torch.from_numpy(e)
    tvec = torch.full((bt, 1), t_val)
    tc = torch.cat([tvec, tctx], dim=1)
    dy = tm(tc, tx)
    e_dzdx = torch.autograd.grad(dy, tx, te, create_graph=True)[0]
    div_torch = (e_dzdx * te).sum(dim=-1).unsqueeze(-1)
    dy_torch = dy.detach().numpy()
    div_torch = div_torch.detach().numpy()

    # --- ours: jvp-based divergence inside the ODE dynamics ---
    dyn = _make_dynamics(cfg, reverse=False)
    args = {
        "params": params,
        "context": jnp.asarray(ctx),
        "e": jnp.asarray(e),
        "t_end": jnp.asarray(1.0),
    }
    # dynamics use the lane-packed state convention: (BT, N*3) / (BT, N)
    state = (jnp.asarray(x).reshape(bt, n * 3), jnp.zeros((bt, n)))
    dx, neg_div = dyn(jnp.asarray(t_val), state, args)

    np.testing.assert_allclose(
        np.asarray(dx).reshape(bt, n, 3), dy_torch, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        -np.asarray(neg_div), div_torch[..., 0], rtol=1e-3, atol=1e-5
    )


def test_cnf_reverse_dynamics_is_time_reflected():
    cfg = CNFConfig(dims=(16,), zdim=6)
    params = odenet_init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    ctx = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    e = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
    t_end = jnp.asarray(0.5)
    args = {"params": params, "context": ctx, "e": e, "t_end": t_end}
    fwd = _make_dynamics(cfg, reverse=False)
    rev = _make_dynamics(cfg, reverse=True)
    s = jnp.asarray(0.2)
    state = (x.reshape(2, 15), jnp.zeros((2, 5)))
    dx_f, dlp_f = fwd(t_end - s, state, args)
    dx_r, dlp_r = rev(s, state, args)
    np.testing.assert_allclose(np.asarray(dx_r), -np.asarray(dx_f), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dlp_r), -np.asarray(dlp_f), rtol=1e-6)


def test_fused_jvp_matches_jax_jvp():
    """The stacked primal+tangent evaluation must equal jax.jvp exactly."""
    from caspr_tpu.models.cnf import odenet_apply, odenet_apply_with_jvp

    cfg = CNFConfig(dims=(32, 32, 32), zdim=16)
    params = odenet_init(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(6)
    y = jnp.asarray(rng.randn(2, 9, 3).astype(np.float32))
    e = jnp.asarray(rng.randn(2, 9, 3).astype(np.float32))
    tc = jnp.asarray(rng.randn(2, 17).astype(np.float32))

    want_p, want_t = jax.jvp(
        lambda y_: odenet_apply(params, cfg, tc, y_), (y,), (e,)
    )
    got_p, got_t = odenet_apply_with_jvp(params, cfg, tc, y, e)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-5, atol=1e-6)


def test_fused_jvp_gradients_flow():
    """The adjoint differentiates through the fused dynamics (vjp of the
    hand-fused forward must exist and be finite)."""
    from caspr_tpu.models.cnf import odenet_apply_with_jvp

    cfg = CNFConfig(dims=(16,), zdim=8)
    params = odenet_init(jax.random.PRNGKey(7), cfg)
    y = jax.random.normal(jax.random.PRNGKey(8), (1, 5, 3))
    e = jax.random.normal(jax.random.PRNGKey(9), (1, 5, 3))
    tc = jax.random.normal(jax.random.PRNGKey(10), (1, 9))

    def loss(p):
        dp, dt = odenet_apply_with_jvp(p, cfg, tc, y, e)
        return jnp.sum(dp * dp) + jnp.sum(dt * e)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
