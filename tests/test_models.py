"""Model-level tests: shapes, CNF invertibility, log-det consistency vs a
brute-force Jacobian on 3-D toy data, MovingBatchNorm inverse, and a full
CaSPR forward/reconstruct smoke test at toy scale (SURVEY.md §4 plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caspr_tpu.models.pointnet import pointnetfeat_init, pointnetfeat_apply
from caspr_tpu.models.pointnet2 import (
    PointNet2Config,
    pointnet2_init,
    pointnet2_apply,
)
from caspr_tpu.models.tpointnet2 import (
    TPointNet2Config,
    tpointnet2_init,
    tpointnet2_apply,
)
from caspr_tpu.models.latent_ode import (
    LatentODEConfig,
    dynamics_init,
    latent_ode_solve,
)
from caspr_tpu.models.cnf import (
    CNFConfig,
    cnf_block_init,
    cnf_block_apply,
    flow_init,
    flow_apply,
    mbn_init,
    mbn_init_state,
    mbn_apply,
    odenet_init,
    odenet_apply,
)
from caspr_tpu.models.caspr import CaSPRConfig, CaSPRModel, caspr_init

KEY = jax.random.PRNGKey(0)

TINY_SA = (16, 8, 8, 4, 4)
TINY_BALLS = (4, 8)


def small_cnf_cfg(**kw):
    kw.setdefault("dims", (16, 16))
    kw.setdefault("zdim", 8)
    return CNFConfig(**kw)


def test_pointnetfeat_shapes():
    p = pointnetfeat_init(KEY, input_dim=4, out_size=1024)
    x = jax.random.normal(KEY, (2, 50, 4))
    out = pointnetfeat_apply(p, x)
    assert out.shape == (2, 50, 1024 + 64)
    # global part is identical across points
    np.testing.assert_allclose(
        np.asarray(out[:, 0, :1024]), np.asarray(out[:, 10, :1024]), rtol=1e-6
    )


def test_pointnet2_shapes():
    cfg = PointNet2Config(sa_points=TINY_SA, ball_samples=TINY_BALLS)
    p = pointnet2_init(KEY, cfg)
    pts = jax.random.normal(KEY, (2, 32, 9)) * 0.3
    out = pointnet2_apply(p, cfg, pts)
    assert out.shape == (2, 32, 512)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("n_points", [32, 16])
def test_pointnet2_hier_fps_matches_per_level(monkeypatch, n_points):
    """Hierarchical FPS collapse (default) must reproduce the per-level
    FPS cascade exactly on tie-free data.  n_points=16 exercises the
    train-resolution case where the first level's M == N identity
    shortcut is NOT an FPS ordering and the flag must keep the second
    level on the real kernel."""
    cfg = PointNet2Config(sa_points=TINY_SA, ball_samples=TINY_BALLS)
    p = pointnet2_init(KEY, cfg)
    pts = jax.random.normal(jax.random.PRNGKey(3), (2, n_points, 9)) * 0.3

    monkeypatch.setenv("CASPR_TPU_FPS", "level")
    want = np.asarray(pointnet2_apply(p, cfg, pts))
    monkeypatch.setenv("CASPR_TPU_FPS", "hier")
    got = np.asarray(pointnet2_apply(p, cfg, pts))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tpointnet2_shapes_and_range():
    cfg = TPointNet2Config(sa_points=TINY_SA, ball_samples=TINY_BALLS)
    p = tpointnet2_init(KEY, cfg)
    x = jax.random.uniform(KEY, (2, 3, 32, 4))
    z0, tnocs = tpointnet2_apply(p, cfg, x)
    assert z0.shape == (2, 1600)
    assert tnocs.shape == (2, 3, 32, 4)
    t = np.asarray(tnocs)
    assert t.min() >= 0.0 and t.max() <= 1.0  # sigmoid head


def test_tpointnet2_factored_fusion_matches_dense(monkeypatch):
    """The factored fusion conv1 (global-weight block applied to the
    per-sequence vector instead of a broadcast over T*N points) must match
    the dense concat path up to f32 summation order."""
    cfg = TPointNet2Config(sa_points=TINY_SA, ball_samples=TINY_BALLS)
    p = tpointnet2_init(jax.random.PRNGKey(7), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 3, 32, 4))

    monkeypatch.setenv("CASPR_TPU_FACTORED_FUSION", "0")
    z0_d, tnocs_d = tpointnet2_apply(p, cfg, x)
    monkeypatch.setenv("CASPR_TPU_FACTORED_FUSION", "1")
    z0_f, tnocs_f = tpointnet2_apply(p, cfg, x)
    np.testing.assert_allclose(
        np.asarray(z0_f), np.asarray(z0_d), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tnocs_f), np.asarray(tnocs_d), rtol=2e-5, atol=2e-5
    )

    # gradients flow through all three weight blocks identically
    def loss(params, mode):
        monkeypatch.setenv("CASPR_TPU_FACTORED_FUSION", mode)
        z0, tn = tpointnet2_apply(params, cfg, x)
        return jnp.sum(z0 ** 2) + jnp.sum(tn)

    g_d = jax.grad(loss)(p, "0")["conv1"]["weight"]
    g_f = jax.grad(loss)(p, "1")["conv1"]["weight"]
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_d), rtol=3e-4, atol=3e-4
    )


def test_pointnet2_factored_fp_matches_dense(monkeypatch):
    """Factored FP conv1 (interp-channel weight block applied on the
    coarse level before the 3-NN interpolation — linearity of the
    weighted sum) must match the reference interp-then-concat-then-conv
    order up to f32 summation order, in values and gradients."""
    cfg = PointNet2Config(sa_points=TINY_SA, ball_samples=TINY_BALLS)
    p = pointnet2_init(jax.random.PRNGKey(11), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(12), (2, 32, 9)) * 0.3

    monkeypatch.setenv("CASPR_TPU_FACTORED_FP", "0")
    want = np.asarray(pointnet2_apply(p, cfg, pts))
    monkeypatch.setenv("CASPR_TPU_FACTORED_FP", "1")
    got = np.asarray(pointnet2_apply(p, cfg, pts))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def loss(params, mode):
        monkeypatch.setenv("CASPR_TPU_FACTORED_FP", mode)
        return jnp.sum(pointnet2_apply(params, cfg, pts) ** 2)

    g_d = jax.grad(loss)(p, "0")
    g_f = jax.grad(loss)(p, "1")
    for fp_d, fp_f in zip(g_d["feature_propagators"],
                          g_f["feature_propagators"]):
        np.testing.assert_allclose(
            np.asarray(fp_f["convs"][0]["weight"]),
            np.asarray(fp_d["convs"][0]["weight"]),
            rtol=5e-4, atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(fp_f["convs"][0]["bias"]),
            np.asarray(fp_d["convs"][0]["bias"]),
            rtol=5e-4, atol=5e-4,
        )


def test_latent_ode_identity_at_t0():
    cfg = LatentODEConfig(input_size=8, hidden_size=16)
    p = dynamics_init(KEY, cfg)
    z0 = jax.random.normal(KEY, (3, 8))
    t = jnp.array([0.2, 0.2, 0.5, 1.0])  # first time = init time (shifted)
    zs, nfe = latent_ode_solve(p, cfg, z0, t, adjoint=False)
    assert zs.shape == (3, 4, 8)
    np.testing.assert_allclose(np.asarray(zs[:, 0]), np.asarray(z0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(zs[:, 1]), np.asarray(zs[:, 0]), rtol=1e-5)
    assert float(nfe) >= 8


def test_cnf_forward_reverse_roundtrip():
    cfg = small_cnf_cfg(train_T=True)
    params = cnf_block_init(KEY, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    lp0 = jnp.zeros((2, 10, 1))
    y, lp_y, _ = cnf_block_apply(params, cfg, x, ctx, lp0, KEY, reverse=False)
    x_back, lp_back, _ = cnf_block_apply(
        params, cfg, y, ctx, lp_y, KEY, reverse=True
    )
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lp_back), np.asarray(lp0), atol=2e-4)


def test_cnf_logdet_vs_bruteforce_jacobian():
    """With exact divergence the CNF log-det must equal log|det J| of the
    transport map.  We get the exact divergence by running the Hutchinson
    estimator with the 3 canonical basis vectors and summing e_i^T J e_i
    manually through the same dynamics, on a tiny flow with loose sampling
    error removed."""
    cfg = small_cnf_cfg(train_T=False, time_length=0.3, rtol=1e-7, atol=1e-9)
    params = cnf_block_init(KEY, cfg)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 8))

    from caspr_tpu.ops import odeint

    def exact_dynamics(t, states, args):
        x, logp = states
        tc = jnp.concatenate(
            [jnp.full((x.shape[0], 1), 1.0) * t, args["context"]], axis=1
        )

        def f(x_):
            return odenet_apply(args["params"], cfg, tc, x_)

        dx = f(x)
        div = jnp.zeros(x.shape[:-1] + (1,))
        for i in range(3):
            e = jnp.zeros_like(x).at[..., i].set(1.0)
            _, jv = jax.jvp(f, (x,), (e,))
            div = div + jv[..., i : i + 1]
        return dx, -div

    x0 = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 3)) * 0.5
    lp0 = jnp.zeros((1, 4, 1))
    ts = jnp.array([0.0, cfg.time_length])
    args = {"params": params["odenet"], "context": ctx}
    (ys, lps), _ = odeint(
        exact_dynamics, (x0, lp0), ts, args, rtol=1e-8, atol=1e-10
    )
    y, dlp = ys[1], lps[1]

    # brute force: jacobian of the full transport map x0 -> y per point
    def transport(pt):
        x_in = pt.reshape(1, 1, 3)
        (ys2, _), _ = odeint(
            exact_dynamics,
            (x_in, jnp.zeros((1, 1, 1))),
            ts,
            args,
            rtol=1e-8,
            atol=1e-10,
        )
        return ys2[1].reshape(3)

    for p_idx in range(4):
        J = jax.jacfwd(transport)(x0[0, p_idx])
        logdet = np.log(abs(np.linalg.det(np.asarray(J))))
        # logp(T) accumulates -div; det relation: log|det J| = int div dt
        np.testing.assert_allclose(
            -float(dlp[0, p_idx, 0]), logdet, rtol=1e-3, atol=1e-4
        )


def test_mbn_forward_reverse_and_stats():
    cfg = small_cnf_cfg()
    params = mbn_init(KEY, 3)
    params = {
        "weight": jnp.array([0.1, -0.2, 0.0]),
        "bias": jnp.array([0.5, 0.0, -0.3]),
    }
    state = mbn_init_state(3)
    state = {
        "running_mean": jnp.array([0.2, -0.1, 0.0]),
        "running_var": jnp.array([1.5, 0.7, 1.0]),
        "step": jnp.zeros((1,)),
    }
    x = jax.random.normal(KEY, (4, 7, 3))
    lp = jnp.zeros((4, 7, 1))
    y, lp_y, new_state = mbn_apply(params, state, cfg, x, lp, False, True)
    x_back, lp_back, _ = mbn_apply(params, state, cfg, y, lp_y, True, False)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lp_back), np.asarray(lp), atol=1e-6)
    assert float(new_state["step"][0]) == 1.0
    assert not np.allclose(
        np.asarray(new_state["running_mean"]), np.asarray(state["running_mean"])
    )


def test_mbn_stats_match_torch_quirk():
    """The reference computes batch stats via transpose(0,1).reshape(C,-1)
    (normalization.py:46-48) which is NOT per-channel; verify we reproduce
    the exact (quirky) numbers torch would produce."""
    from caspr_tpu.models.cnf import _mbn_batch_stats

    rng = np.random.RandomState(0)
    x = rng.randn(5, 6, 3).astype(np.float32)
    xt = np.ascontiguousarray(np.transpose(x, (1, 0, 2))).reshape(3, -1)
    want_mean = xt.mean(1)
    want_var = xt.var(1, ddof=1)
    got_mean, got_var = _mbn_batch_stats(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_mean), want_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_var), want_var, rtol=1e-5)


def test_flow_chain_roundtrip():
    cfg = small_cnf_cfg()
    params, state = flow_init(KEY, cfg)
    assert cfg.chain() == ("mbn", "cnf", "mbn")
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 3))
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 8))
    lp0 = jnp.zeros((2, 6, 1))
    y, lp, _, nfe = flow_apply(
        params, state, cfg, x, ctx, lp0, KEY, reverse=False, training=False
    )
    x_back, lp_back, _, _ = flow_apply(
        params, state, cfg, y, ctx, lp, KEY, reverse=True, training=False
    )
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=3e-4)
    np.testing.assert_allclose(np.asarray(lp_back), np.asarray(lp0), atol=3e-4)
    assert float(nfe) > 0


def tiny_caspr_cfg(**kw):
    return CaSPRConfig(
        sa_points=TINY_SA,
        ball_samples=TINY_BALLS,
        local_feat_size=64,
        latent_feat_size=160,
        ode_hidden_size=32,
        motion_feat_size=16,
        global_feat_size=128,
        space_time_pt_feat=64,
        cnf_dims=(32, 32),
        **kw,
    )


def test_caspr_forward_full():
    cfg = tiny_caspr_cfg()
    params, state = caspr_init(KEY, cfg)
    model = CaSPRModel(cfg)
    b, t, n = 2, 3, 32
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (b, t, n, 4))
    times = jnp.broadcast_to(jnp.array([0.0, 0.4, 1.0]), (b, t))
    x = x.at[..., 3].set(times[:, :, None])
    nocs = jax.random.uniform(jax.random.PRNGKey(8), (b, t, n, 4))
    nocs = nocs.at[..., 3].set(times[:, :, None])

    out, new_state = model.forward(params, state, x, nocs, key, training=False)
    assert out["tnocs_loss"].shape == (b, t, n, 4)
    assert out["nll"].shape == (b, t, n)
    assert np.all(np.isfinite(np.asarray(out["nll"])))
    ode_nfe, cnf_nfe = out["nfe"]
    assert float(ode_nfe) > 0 and float(cnf_nfe) > 0


def test_caspr_pretrain_tnocs_mode():
    cfg = tiny_caspr_cfg(pretrain_tnocs=True)
    params, state = caspr_init(KEY, cfg)
    assert "latent_ode" not in params and "point_cnf" not in params
    model = CaSPRModel(cfg)
    x = jax.random.uniform(KEY, (1, 2, 32, 4))
    out, _ = model.forward(params, state, x, x, KEY, training=True)
    assert "nll" not in out
    assert out["tnocs_loss"].shape == (1, 2, 32, 4)


def test_caspr_reconstruct():
    cfg = tiny_caspr_cfg()
    params, state = caspr_init(KEY, cfg)
    model = CaSPRModel(cfg)
    b, t, n = 1, 3, 32
    x = jax.random.uniform(KEY, (b, t, n, 4))
    x = x.at[..., 3].set(jnp.array([0.0, 2.5, 5.0])[None, :, None])
    y, logp_y, x_rec, tnocs, nfe = model.reconstruct(
        params, state, x, jax.random.PRNGKey(9), num_points=16
    )
    assert y.shape == (b, t, 16, 3)
    assert logp_y.shape == (b, t, 16)
    assert x_rec.shape == (b, t, 16, 3)
    assert tnocs.shape == (b, t, n, 4)
    assert np.all(np.isfinite(np.asarray(x_rec)))


def test_caspr_reconstruct_constant_in_time_shares_base():
    cfg = tiny_caspr_cfg()
    params, state = caspr_init(KEY, cfg)
    model = CaSPRModel(cfg)
    x = jax.random.uniform(KEY, (1, 2, 32, 4))
    x = x.at[..., 3].set(jnp.array([0.0, 5.0])[None, :, None])
    y, _, _, _, _ = model.reconstruct(
        params, state, x, KEY, num_points=8, constant_in_time=True
    )
    np.testing.assert_allclose(np.asarray(y[0, 0]), np.asarray(y[0, 1]))


def test_caspr_grad_flows_everywhere():
    cfg = tiny_caspr_cfg()
    params, state = caspr_init(KEY, cfg)
    model = CaSPRModel(cfg)
    b, t, n = 1, 2, 32
    x = jax.random.uniform(KEY, (b, t, n, 4))
    x = x.at[..., 3].set(jnp.array([0.0, 1.0])[None, :, None])

    def loss_fn(p):
        out, _ = model.forward(p, state, x, x, jax.random.PRNGKey(1), training=True)
        cnf_l = 0.01 * jnp.mean(jnp.sum(out["nll"], axis=2))
        tnocs_l = 100.0 * jnp.mean(out["tnocs_loss"])
        return cnf_l + tnocs_l

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # key parameters must receive nonzero gradient signal
    assert float(jnp.sum(jnp.abs(grads["latent_ode"]["layer0"]["weight"]))) > 0
    assert (
        float(
            jnp.sum(
                jnp.abs(
                    grads["point_cnf"][1]["odenet"]["layers"][0]["_layer"]["weight"]
                )
            )
        )
        > 0
    )
    assert float(jnp.abs(grads["point_cnf"][1]["sqrt_end_time"])) > 0
    assert (
        float(jnp.sum(jnp.abs(grads["encoder"]["conv1"]["weight"]))) > 0
    )


def test_latent_ode_augment_size():
    """ANODE-style zero augmentation (reference latent_ode_model.py:60-65):
    output carries input+augment dims, starts at [z0, 0]."""
    cfg = LatentODEConfig(input_size=6, hidden_size=16, augment_size=4)
    p = dynamics_init(KEY, cfg)
    z0 = jax.random.normal(KEY, (2, 6))
    t = jnp.array([0.0, 0.5])
    zs, _ = latent_ode_solve(p, cfg, z0, t, adjoint=False)
    assert zs.shape == (2, 2, 10)
    np.testing.assert_allclose(np.asarray(zs[:, 0, :6]), np.asarray(z0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(zs[:, 0, 6:]), 0.0, atol=1e-6)


def test_shared_times_solve_matches_general_path():
    """aggregate_and_solve_latent(shared_times=True) must reproduce the
    flattened-B*T path exactly when every batch row carries the same
    timestamps (the eval-protocol case: reference caspr.py:166 dedups with
    torch.unique; ours solves at the T shared request times)."""
    cfg = tiny_caspr_cfg()
    params, _ = caspr_init(KEY, cfg)
    model = CaSPRModel(cfg)
    b, t = 3, 5
    z0 = jax.random.normal(jax.random.PRNGKey(11), (b, cfg.latent_feat_size))
    row = jnp.array([0.0, 0.7, 0.2, 1.0, 0.4])  # unsorted on purpose
    times = jnp.broadcast_to(row, (b, t))

    feats_gen, _ = model.aggregate_and_solve_latent(
        params, z0, times, adjoint=False
    )
    feats_shared, _ = model.aggregate_and_solve_latent(
        params, z0, times, adjoint=False, shared_times=True
    )
    np.testing.assert_allclose(
        np.asarray(feats_shared), np.asarray(feats_gen), rtol=1e-6, atol=1e-6
    )


def test_export_roundtrip_cpu(tmp_path):
    """jax.export serving artifact: serialize reconstruct+encode for the
    CPU platform, deserialize, and reproduce the direct call's outputs."""
    import numpy as np
    from jax import export as jexp
    from tools.export_model import export_model

    cfg = tiny_caspr_cfg()
    model = CaSPRModel(cfg)
    params, state = caspr_init(jax.random.PRNGKey(0), cfg)
    paths = export_model(
        model, params, state, batch=1, steps=3, points=64,
        platform="cpu", out_dir=str(tmp_path),
    )
    key = jax.random.PRNGKey(7)
    observed = jax.random.uniform(key, (1, 3, 64, 4))
    timestamps = jnp.linspace(0.0, 1.0, 3)

    exp = jexp.deserialize(open(paths[0], "rb").read())
    pred, nfe = exp.call(params, state, observed, timestamps, key)
    _, _, want, _, want_nfe = model.reconstruct(
        params, state, observed, key, num_points=64,
        timestamps=timestamps, constant_in_time=False,
    )
    # the exported program recompiles with different fusion choices; the
    # adaptive solver amplifies the ~1e-7 arithmetic differences
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(want), rtol=1e-2, atol=1e-4
    )

    exp_enc = jexp.deserialize(open(paths[1], "rb").read())
    z, tnocs = exp_enc.call(params, observed)
    z2, tnocs2 = model.encode(params, observed)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), rtol=1e-2,
                               atol=1e-3)
