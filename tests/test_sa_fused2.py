"""v2 fused SA-scale kernel (ops/sa_fused2.py) vs the XLA composition
(group_points + _mini_pointnet_apply), through the TPU interpreter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from caspr_tpu.models.pointnet2 import _mini_pointnet_init
from caspr_tpu.ops.pointops import ball_query_xla
from caspr_tpu.ops.sa_fused2 import (
    _split3,
    _xla_reference,
    can_fuse_sa2,
    fused_sa_scale2,
)


def _setup(key=0, b=2, n=64, m=16, k=8, c_feat=5, dims=(16, 16, 32),
           radius=0.4):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    xyz = jax.random.uniform(ks[0], (b, n, 3))
    feats = jax.random.normal(ks[1], (b, n, c_feat)) if c_feat else None
    new_xyz = xyz[:, :m]
    gidx = ball_query_xla(xyz, new_xyz, radius, k)
    sp = _mini_pointnet_init(ks[2], 3 + c_feat, dims)
    return sp, xyz, feats, new_xyz, gidx


def test_split3_exact():
    t = jnp.asarray(
        np.random.default_rng(0).standard_normal((64, 32)) * 100.0,
        jnp.float32,
    )
    hi, mid, lo = _split3(t)
    recon = (
        hi.astype(jnp.float32) + mid.astype(jnp.float32)
        + lo.astype(jnp.float32)
    )
    assert np.array_equal(np.asarray(recon), np.asarray(t))


def test_fused2_matches_xla_interpret():
    sp, xyz, feats, new_xyz, gidx = _setup()
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sa_scale2(sp, xyz, feats, new_xyz, gidx, 8, 16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused2_no_features_interpret():
    sp, xyz, _, new_xyz, gidx = _setup(key=1, c_feat=0)
    want = np.asarray(_xla_reference(sp, xyz, None, new_xyz, gidx, 16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sa_scale2(sp, xyz, None, new_xyz, gidx, 8, 16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused2_small_radius_interpret():
    # tight balls: the factored t[i] - u[m] must not lose the tiny
    # relative coordinates to rounding (HIGHEST-precision t/u matmuls)
    sp, xyz, feats, new_xyz, gidx = _setup(key=5, n=128, radius=0.05)
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sa_scale2(sp, xyz, feats, new_xyz, gidx, 8, 16))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_fused2_reference_shapes_interpret():
    # SA1 scale-2-like: K=32, dims (32, 32, 64), 9 input channels
    sp, xyz, feats, new_xyz, gidx = _setup(
        key=2, b=1, n=128, m=32, k=32, c_feat=6, dims=(32, 32, 64)
    )
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_sa_scale2(sp, xyz, feats, new_xyz, gidx, 32, 16)
        )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused2_gradients_match_xla():
    sp, xyz, feats, new_xyz, gidx = _setup(key=3)

    def loss_fused(p, x, f, nx):
        with pltpu.force_tpu_interpret_mode():
            h = fused_sa_scale2(p, x, f, nx, gidx, 8, 16)
        return jnp.sum(h * h)

    def loss_xla(p, x, f, nx):
        return jnp.sum(_xla_reference(p, x, f, nx, gidx, 16) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(sp, xyz, feats, new_xyz)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(sp, xyz, feats, new_xyz)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


def test_sa_scale_factored_matches_xla():
    from caspr_tpu.ops.sa_fused2 import sa_scale_factored

    sp, xyz, feats, new_xyz, gidx = _setup()
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    got = np.asarray(sa_scale_factored(sp, xyz, feats, new_xyz, gidx, 16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sa_scale_factored_no_features_small_radius():
    from caspr_tpu.ops.sa_fused2 import sa_scale_factored

    sp, xyz, _, new_xyz, gidx = _setup(key=8, n=128, c_feat=0, radius=0.05)
    want = np.asarray(_xla_reference(sp, xyz, None, new_xyz, gidx, 16))
    got = np.asarray(sa_scale_factored(sp, xyz, None, new_xyz, gidx, 16))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_sa_scale_factored_gradients_match_xla():
    """The factored path is pure XLA and differentiable; its gradients
    must match the unfactored composition (same math, refactored)."""
    from caspr_tpu.ops.sa_fused2 import sa_scale_factored

    sp, xyz, feats, new_xyz, gidx = _setup(key=9)

    def loss_f(p, x, f, nx):
        return jnp.sum(sa_scale_factored(p, x, f, nx, gidx, 16) ** 2)

    def loss_x(p, x, f, nx):
        return jnp.sum(_xla_reference(p, x, f, nx, gidx, 16) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(sp, xyz, feats, new_xyz)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(sp, xyz, feats, new_xyz)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


def test_pointnet2_apply_factored_vs_xla(monkeypatch):
    """CASPR_TPU_SA=auto on a Pallas-class backend dispatches the
    factored SA scale; the full backbone must match the plain XLA
    composition."""
    from caspr_tpu.models.pointnet2 import (
        PointNet2Config,
        pointnet2_apply,
        pointnet2_init,
    )

    cfg = PointNet2Config(
        in_features=6,
        num_classes=32,
        max_feat_prop_size=32,
        sa_points=(32, 16, 16, 8, 8),
        ball_samples=(4, 8),
    )
    key = jax.random.PRNGKey(10)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (2, 64, 9))

    monkeypatch.setenv("CASPR_TPU_KERNELS", "xla")
    want = np.asarray(pointnet2_apply(params, cfg, pts))
    monkeypatch.setenv("CASPR_TPU_KERNELS", "pallas")
    monkeypatch.setenv("CASPR_TPU_SA", "auto")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pointnet2_apply(params, cfg, pts))
    # factoring reassociates conv1 (t[i] - u[m] vs W(x_i - c_m)) and the
    # GroupNorm levels amplify the f32 rounding drift through 5 SA levels
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-3)


def test_can_fuse_sa2_guards():
    sp, *_ = _setup()
    assert can_fuse_sa2(sp, 64, 16, 8)
    sp_bad, *_ = _setup(dims=(24, 16, 32))
    assert not can_fuse_sa2(sp_bad, 64, 16, 8)


def test_pointnet2_apply_fused2_vs_xla(monkeypatch):
    from caspr_tpu.models.pointnet2 import (
        PointNet2Config,
        pointnet2_apply,
        pointnet2_init,
    )

    cfg = PointNet2Config(
        in_features=6,
        num_classes=32,
        max_feat_prop_size=32,
        sa_points=(32, 16, 16, 8, 8),
        ball_samples=(4, 8),
    )
    key = jax.random.PRNGKey(4)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (2, 64, 9))

    monkeypatch.setenv("CASPR_TPU_KERNELS", "xla")
    want = np.asarray(pointnet2_apply(params, cfg, pts))
    monkeypatch.setenv("CASPR_TPU_KERNELS", "pallas")
    monkeypatch.setenv("CASPR_TPU_SA", "fused2")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pointnet2_apply(params, cfg, pts))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_sa_factored_bf16_acts_close(monkeypatch):
    """CASPR_TPU_SA_BF16_ACTS stores post-ReLU activations in bf16.  On
    TPU the next matmul casts operands to bf16 anyway so results are
    bit-identical there; on CPU (full-f32 matmuls) this is a real
    precision change — check it stays within bf16-scale tolerance."""
    from caspr_tpu.ops.sa_fused2 import sa_scale_factored

    sp, xyz, feats, new_xyz, gidx = _setup()
    base = np.asarray(
        sa_scale_factored(sp, xyz, feats, new_xyz, gidx, 16)
    )
    monkeypatch.setenv("CASPR_TPU_SA_BF16_ACTS", "force")
    got = np.asarray(
        sa_scale_factored(sp, xyz, feats, new_xyz, gidx, 16)
    )
    np.testing.assert_allclose(got, base, rtol=0.06, atol=0.02)


# ------------------------------------------------------------------ v3


def test_fused3_matches_xla_interpret():
    from caspr_tpu.ops.sa_fused2 import can_fuse_sa3, fused_sa_scale3

    sp, xyz, feats, new_xyz, gidx = _setup()
    assert can_fuse_sa3(sp, 64, 16, 8)
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_sa_scale3(sp, xyz, feats, new_xyz, gidx, 8, 16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused3_small_radius_reference_shapes_interpret():
    from caspr_tpu.ops.sa_fused2 import fused_sa_scale3

    # SA1 scale-2-like: K=32, dims (32, 32, 64), tight balls
    sp, xyz, feats, new_xyz, gidx = _setup(
        key=2, b=1, n=128, m=32, k=32, c_feat=6, dims=(32, 32, 64),
        radius=0.05,
    )
    want = np.asarray(_xla_reference(sp, xyz, feats, new_xyz, gidx, 16))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_sa_scale3(sp, xyz, feats, new_xyz, gidx, 32, 16)
        )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_fused3_gradients_match_xla():
    from caspr_tpu.ops.sa_fused2 import fused_sa_scale3

    sp, xyz, feats, new_xyz, gidx = _setup(key=3)

    def loss_fused(p, x, f, nx):
        with pltpu.force_tpu_interpret_mode():
            h = fused_sa_scale3(p, x, f, nx, gidx, 8, 16)
        return jnp.sum(h * h)

    def loss_xla(p, x, f, nx):
        return jnp.sum(_xla_reference(p, x, f, nx, gidx, 16) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(sp, xyz, feats, new_xyz)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(sp, xyz, feats, new_xyz)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )


def test_pointnet2_apply_fused3_vs_xla(monkeypatch):
    from caspr_tpu.models.pointnet2 import (
        PointNet2Config,
        pointnet2_apply,
        pointnet2_init,
    )

    cfg = PointNet2Config(
        in_features=6,
        num_classes=32,
        max_feat_prop_size=32,
        sa_points=(32, 16, 16, 8, 8),
        ball_samples=(4, 8),
    )
    key = jax.random.PRNGKey(4)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (2, 64, 9))

    monkeypatch.setenv("CASPR_TPU_KERNELS", "xla")
    want = np.asarray(pointnet2_apply(params, cfg, pts))
    monkeypatch.setenv("CASPR_TPU_KERNELS", "pallas")
    monkeypatch.setenv("CASPR_TPU_SA", "fused3")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pointnet2_apply(params, cfg, pts))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
