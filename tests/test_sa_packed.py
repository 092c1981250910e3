"""Lanes-packed SA conv stack (ops/sa_packed.py) vs the row-form loop.

The packed form computes the same conv/GN/max math on a (BM, K*d)
lanes-folded view (block-diagonal kron conv weights, matmul GN stats) —
values must match the dispatch default up to f32 accumulation order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caspr_tpu.models.pointnet2 import _mini_pointnet_init
from caspr_tpu.ops.pointops import ball_query_xla
from caspr_tpu.ops.sa_fused2 import _xla_reference, sa_scale_factored
from caspr_tpu.ops.sa_packed import can_pack, sa_stack_packed


def _setup(key=0, b=2, n=64, m=16, k=8, c_feat=5, dims=(16, 16, 32),
           radius=0.4):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    xyz = jax.random.uniform(ks[0], (b, n, 3))
    feats = jax.random.normal(ks[1], (b, n, c_feat)) if c_feat else None
    new_xyz = xyz[:, :m]
    gidx = ball_query_xla(xyz, new_xyz, radius, k)
    sp = _mini_pointnet_init(ks[2], 3 + c_feat, dims)
    return sp, xyz, feats, new_xyz, gidx


def _h1(sp, xyz, feats, new_xyz, gidx):
    """The factored first-conv grouped input the stack consumes."""
    from caspr_tpu.ops.pointops import gather_points

    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    w1t = jnp.transpose(sp["convs"][0]["weight"])
    wx, wf = w1t[:3], w1t[3:]
    t = xyz.reshape(b * n, 3) @ wx + sp["convs"][0]["bias"]
    if feats is not None:
        t = t + feats.reshape(b * n, -1) @ wf
    t = t.reshape(b, n, -1)
    u = (new_xyz.reshape(b * m, 3) @ wx).reshape(b, m, -1)
    g = gather_points(t, gidx)
    return (g - u[:, :, None, :]).reshape(b * m, *g.shape[2:])


@pytest.mark.parametrize("dims,k", [((16, 16, 32), 8), ((32, 32, 64), 16)])
def test_packed_stack_matches_rows(dims, k):
    sp, xyz, feats, new_xyz, gidx = _setup(k=k, dims=dims)
    assert can_pack(sp)
    h = _h1(sp, xyz, feats, new_xyz, gidx)
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    got = np.asarray(
        sa_stack_packed(sp, h, 16).reshape(want.shape))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_packed_dispatch_in_sa_scale_factored(monkeypatch):
    monkeypatch.setenv("CASPR_TPU_SA_STACK", "packed")
    sp, xyz, feats, new_xyz, gidx = _setup(key=3)
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    got = np.asarray(sa_scale_factored(sp, xyz, feats, new_xyz, gidx, 16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_packed_gradients_match_rows():
    sp, xyz, feats, new_xyz, gidx = _setup(key=5)
    h = _h1(sp, xyz, feats, new_xyz, gidx)

    def loss_p(p, hh):
        return jnp.sum(sa_stack_packed(p, hh, 16) ** 2)

    def loss_r(p, x, f, nx):
        return jnp.sum(_xla_reference(p, x, f, nx, gidx, 16) ** 2)

    gp_sp, gp_h = jax.grad(loss_p, argnums=(0, 1))(sp, h)
    gx = jax.grad(loss_r, argnums=(0,))(sp, xyz, feats, new_xyz)[0]
    # conv1 weight grads flow through h here (not sp) — compare the rest
    for name in ("norms",):
        for a, b in zip(jax.tree_util.tree_leaves(gp_sp[name]),
                        jax.tree_util.tree_leaves(gx[name])):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)
    for i in (1, 2):
        for key in ("weight", "bias"):
            np.testing.assert_allclose(
                np.asarray(gp_sp["convs"][i][key]),
                np.asarray(gx["convs"][i][key]), rtol=1e-3, atol=1e-3)
    assert np.all(np.isfinite(np.asarray(gp_h)))


def test_can_pack_rejects_wide_stacks():
    sp = _mini_pointnet_init(jax.random.PRNGKey(0), 9, (256, 256, 512))
    assert not can_pack(sp)


@pytest.mark.parametrize("c,k", [(16, 16), (32, 32), (64, 8)])
def test_gather_packed_kernel_interpret(c, k):
    """The packed-emit shuf gather must equal the row gather reshaped —
    bit-exact (same f32 moves, different physical layout)."""
    from jax.experimental.pallas import tpu as pltpu

    from caspr_tpu.ops.pallas_kernels import _gather_rows_shuf_packed_call

    rng = np.random.RandomState(7)
    src = jnp.asarray(rng.randn(2, 200, c).astype(np.float32))
    idx_np = rng.randint(0, 200, size=(2, 8 * k)).astype(np.int32)
    idx = jnp.asarray(idx_np)
    want = np.asarray(
        jnp.take_along_axis(src, idx[:, :, None], axis=1)
    ).reshape(2, 8, k * c)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_gather_rows_shuf_packed_call(src, idx, k))
    np.testing.assert_array_equal(got, want)


def test_gather_points_packed_dispatch_and_vjp():
    """CPU dispatch path (XLA fallback) + the custom VJP's scatter-add
    against the differentiable take_along_axis composition."""
    from caspr_tpu.ops.pallas_kernels import gather_rows_shuf_packed
    from caspr_tpu.ops.pointops import gather_points, gather_points_packed

    rng = np.random.RandomState(9)
    src = jnp.asarray(rng.randn(2, 100, 16).astype(np.float32))
    gidx = jnp.asarray(rng.randint(0, 100, size=(2, 12, 8)).astype(np.int32))
    want = np.asarray(gather_points(src, gidx)).reshape(2, 12, 8 * 16)
    got = np.asarray(gather_points_packed(src, gidx))
    np.testing.assert_array_equal(got, want)

    # VJP of the Pallas wrapper (interpret mode) vs the XLA composition
    from jax.experimental.pallas import tpu as pltpu

    idx = gidx.reshape(2, -1)
    ct = jnp.asarray(rng.randn(2, 12, 8 * 16).astype(np.float32))

    def via_xla(s):
        out = jnp.take_along_axis(s, idx[:, :, None], axis=1)
        return jnp.sum(out.reshape(2, 12, 8 * 16) * ct)

    with pltpu.force_tpu_interpret_mode():
        def via_kernel(s):
            return jnp.sum(gather_rows_shuf_packed(s, idx, 8) * ct)

        gk = np.asarray(jax.grad(via_kernel)(src))
    gx = np.asarray(jax.grad(via_xla)(src))
    np.testing.assert_allclose(gk, gx, rtol=1e-6, atol=1e-6)
