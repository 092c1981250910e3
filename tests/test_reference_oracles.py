"""Parity tests against the REFERENCE SOURCE ITSELF as the oracle.

Round-1 torch-parity tests hand-rolled their oracles (transcription risk);
here we import the reference modules from /root/reference (import, never
vendor) and assert our functional layers reproduce their outputs exactly:

  - all 7 diffeq conditioning layers (reference caspr/models/diffeq_layers.py)
  - MovingBatchNorm1d incl. the PointFlow transpose-reshape batch-stats
    quirk and log-det terms (reference caspr/models/normalization.py:12-128)
  - PointNetfeat (reference caspr/models/pointnet.py:18-46)
  - DynamicsNet / LatentODE's MLP (reference latent_ode_model.py:102-156)
  - ODEnet + ODEfunc full CNF dynamics with Hutchinson divergence
    (reference caspr/models/odefunc.py:62-141)

plus a converter test that builds the torch state dict from the REAL
reference modules (PointNetfeat / LatentODE / flow.build_model), converts
it, and checks our apply functions reproduce the torch modules' outputs —
so a misremembered reference attribute name fails mechanically.

The reference's kaolin-dependent modules (pointnet2/tpointnet2) cannot
import here; their key map keeps the hand-built coverage in
test_torch_parity.py.  torchdiffeq/open3d are absent from this
environment, so inert module stubs satisfy the reference's imports — the
oracles under test never call them.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

REFERENCE_ROOT = "/root/reference"


def _import_ref(modname):
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    for stub in ("torchdiffeq", "open3d"):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            mod.odeint_adjoint = lambda *a, **k: None
            mod.odeint = lambda *a, **k: None
            sys.modules[stub] = mod
    import importlib

    return importlib.import_module(modname)


def _t2n(t):
    # .copy(): torch .numpy() returns a VIEW of torch memory and jax CPU
    # arrays can alias it zero-copy — reference in-place buffer updates
    # (MovingBatchNorm running stats) would otherwise leak into our inputs
    return t.detach().cpu().numpy().copy()


def _copy_linear(torch_linear):
    p = {"weight": jnp.asarray(_t2n(torch_linear.weight))}
    if torch_linear.bias is not None:
        p["bias"] = jnp.asarray(_t2n(torch_linear.bias))
    return p


# ------------------------- diffeq layer types -------------------------------


LAYER_CASES = [
    ("ignore", "IgnoreLinear"),
    ("concat", "ConcatLinear"),
    ("concat_v2", "ConcatLinear_v2"),
    ("squash", "SquashLinear"),
    ("scale", "ScaleLinear"),
    ("concatsquash", "ConcatSquashLinear"),
    ("concatscale", "ConcatScaleLinear"),
]


@pytest.mark.parametrize("ours,theirs", LAYER_CASES)
def test_diffeq_layer_matches_reference(ours, theirs):
    dl = _import_ref("caspr.models.diffeq_layers")
    from caspr_tpu.models.cnf import _layer_apply

    torch.manual_seed(7)
    dim_in, dim_out, dim_c = 3, 16, 8
    ref = getattr(dl, theirs)(dim_in, dim_out, dim_c)
    # reference init is default torch (weights_init is never applied by
    # CaSPR's build path) — random weights are a stronger value test anyway
    rng = np.random.RandomState(5)
    x = rng.randn(2, 10, dim_in).astype(np.float32)
    ctx = rng.randn(2, 1 + dim_c).astype(np.float32)

    tx, tctx = torch.from_numpy(x), torch.from_numpy(ctx)
    if ours == "concat":
        want = ref(tctx, tx, None)  # reference signature has a dead 3rd arg
    else:
        want = ref(tctx, tx)
    want = _t2n(want)

    params = {}
    for name in ("_layer", "_hyper_bias", "_hyper_gate", "_hyper"):
        if hasattr(ref, name):
            params[name] = _copy_linear(getattr(ref, name))
    got = _layer_apply(params, ours, jnp.asarray(ctx), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


# --------------------------- MovingBatchNorm --------------------------------


def _make_ref_mbn(num_features=3, seed=3):
    norm = _import_ref("caspr.models.normalization")
    torch.manual_seed(seed)
    ref = norm.MovingBatchNorm1d(num_features)
    with torch.no_grad():
        ref.weight.copy_(torch.randn(num_features) * 0.3)
        ref.bias.copy_(torch.randn(num_features) * 0.3)
        ref.running_mean.copy_(torch.randn(num_features) * 0.1)
        ref.running_var.copy_(torch.rand(num_features) + 0.5)
    return ref


def _our_mbn_params_state(ref):
    params = {
        "weight": jnp.asarray(_t2n(ref.weight)),
        "bias": jnp.asarray(_t2n(ref.bias)),
    }
    state = {
        "running_mean": jnp.asarray(_t2n(ref.running_mean)),
        "running_var": jnp.asarray(_t2n(ref.running_var)),
        "step": jnp.asarray(_t2n(ref.step)),
    }
    return params, state


@pytest.mark.parametrize("training", [True, False])
def test_mbn_forward_matches_reference(training):
    from caspr_tpu.models.cnf import CNFConfig, mbn_apply

    ref = _make_ref_mbn()
    params, state = _our_mbn_params_state(ref)
    rng = np.random.RandomState(11)
    x = rng.randn(4, 10, 3).astype(np.float32)
    logpx = rng.randn(4, 10, 1).astype(np.float32)

    ref.train(training)
    twant, lwant = ref(torch.from_numpy(x), None, torch.from_numpy(logpx))

    cfg = CNFConfig(input_dim=3)
    y, logp, new_state = mbn_apply(
        params, state, cfg, jnp.asarray(x), jnp.asarray(logpx),
        reverse=False, training=training,
    )
    np.testing.assert_allclose(np.asarray(y), _t2n(twant), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logp), _t2n(lwant), rtol=1e-4, atol=1e-5)
    # running-stat updates must track the reference's transpose-reshape
    # batch statistics (normalization.py:43-51) exactly
    np.testing.assert_allclose(
        np.asarray(new_state["running_mean"]), _t2n(ref.running_mean),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["running_var"]), _t2n(ref.running_var),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(new_state["step"]), _t2n(ref.step))


def test_mbn_reverse_matches_reference():
    from caspr_tpu.models.cnf import CNFConfig, mbn_apply

    ref = _make_ref_mbn(seed=4)
    params, state = _our_mbn_params_state(ref)
    rng = np.random.RandomState(12)
    y = rng.randn(4, 10, 3).astype(np.float32)
    logpy = rng.randn(4, 10, 1).astype(np.float32)

    ref.eval()
    twant, lwant = ref(
        torch.from_numpy(y), None, torch.from_numpy(logpy), reverse=True
    )
    x, logp, _ = mbn_apply(
        params, state, CNFConfig(input_dim=3), jnp.asarray(y),
        jnp.asarray(logpy), reverse=True, training=False,
    )
    np.testing.assert_allclose(np.asarray(x), _t2n(twant), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logp), _t2n(lwant), rtol=1e-4, atol=1e-5)


# ----------------------------- PointNetfeat ---------------------------------


def test_pointnetfeat_matches_reference_module():
    pn = _import_ref("caspr.models.pointnet")
    from caspr_tpu.models.pointnet import pointnetfeat_apply, pointnetfeat_init

    torch.manual_seed(9)
    ref = pn.PointNetfeat(input_dim=4, out_size=256)
    x = np.random.RandomState(2).randn(2, 4, 50).astype(np.float32)
    want = _t2n(ref(torch.from_numpy(x)))

    params = pointnetfeat_init(jax.random.PRNGKey(0), input_dim=4, out_size=256)
    for name in ("conv1", "conv2", "conv3"):
        tl = getattr(ref, name)
        params[name]["weight"] = jnp.asarray(_t2n(tl.weight)[..., 0])
        params[name]["bias"] = jnp.asarray(_t2n(tl.bias))
    for name in ("bn1", "bn2", "bn3"):
        tl = getattr(ref, name)
        params[name]["weight"] = jnp.asarray(_t2n(tl.weight))
        params[name]["bias"] = jnp.asarray(_t2n(tl.bias))

    got = pointnetfeat_apply(params, jnp.asarray(np.transpose(x, (0, 2, 1))))
    got = np.transpose(np.asarray(got), (0, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------ DynamicsNet ---------------------------------


def test_dynamics_net_matches_reference_module():
    lom = _import_ref("caspr.models.latent_ode_model")
    from caspr_tpu.models.latent_ode import LatentODEConfig, dynamics_apply

    torch.manual_seed(21)
    ref = lom.DynamicsNet(input_size=16, hidden_size=32, num_layers=2)
    lom.init_network_weights(ref)

    cfg = LatentODEConfig(input_size=16, hidden_size=32)
    params = {}
    for k in range(4):
        seq = ref.dynamics_net[2 * k]
        params[f"layer{k}"] = _copy_linear(seq)

    z = np.random.RandomState(6).randn(5, 16).astype(np.float32)
    want = _t2n(ref(torch.tensor(0.0), torch.from_numpy(z)))
    got = dynamics_apply(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    assert cfg.output_size == 16


# --------------------- full CNF dynamics (ODEfunc) --------------------------


def test_cnf_dynamics_matches_reference_odefunc():
    """Our lane-packed CNF dynamics (dx, -div) against the real reference
    ODEfunc (odefunc.py:108-141) with the same fixed Hutchinson noise —
    covers the conditioning layout [t, context], the ODEnet stack, and the
    divergence estimator (their vjp e^T J vs our jvp J e: same e^T J e)."""
    odefunc_mod = _import_ref("caspr.models.odefunc")
    from caspr_tpu.models.cnf import CNFConfig, _make_dynamics

    torch.manual_seed(31)
    zdim, d, n, bt = 8, 3, 6, 2
    dims = (16, 16)
    ref_net = odefunc_mod.ODEnet(
        hidden_dims=dims, input_shape=(d,), context_dim=zdim,
        layer_type="concatsquash", nonlinearity="softplus",
    )
    ref_f = odefunc_mod.ODEfunc(diffeq=ref_net)

    rng = np.random.RandomState(8)
    x = rng.randn(bt, n, d).astype(np.float32)
    ctx = rng.randn(bt, zdim).astype(np.float32)
    e = rng.randn(bt, n, d).astype(np.float32)
    logpx = np.zeros((bt, n, 1), np.float32)
    t_val = 0.37

    ref_f.before_odeint(e=torch.from_numpy(e))
    tx = torch.from_numpy(x).requires_grad_(True)
    tstates = (tx, torch.from_numpy(logpx), torch.from_numpy(ctx))
    dy_t, neg_div_t, _ = ref_f(torch.tensor(t_val), tstates)
    want_dx, want_neg_div = _t2n(dy_t), _t2n(neg_div_t)[..., 0]

    cfg = CNFConfig(input_dim=d, dims=dims, zdim=zdim)
    params = {
        "layers": [
            {
                name: _copy_linear(getattr(layer, name))
                for name in ("_layer", "_hyper_bias", "_hyper_gate")
            }
            for layer in ref_net.layers
        ]
    }
    dyn = _make_dynamics(cfg, reverse=False)
    args = {
        "params": params,
        "context": jnp.asarray(ctx),
        "e": jnp.asarray(e),
        "t_end": jnp.asarray(0.5),
    }
    state = (jnp.asarray(x.reshape(bt, n * d)), jnp.zeros((bt, n)))
    dx_flat, neg_div = dyn(jnp.asarray(t_val), state, args)
    np.testing.assert_allclose(
        np.asarray(dx_flat).reshape(bt, n, d), want_dx, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(neg_div), want_neg_div, rtol=1e-4, atol=1e-5
    )


# ------------------- converter vs REAL reference modules --------------------


def test_converter_reproduces_real_module_outputs():
    """Build the torch state dict from the real reference modules, convert,
    and require our apply functions to reproduce the torch outputs — the
    mechanical proof that the key map's attribute names and layouts match
    the reference source (VERDICT r1 item 2)."""
    pn = _import_ref("caspr.models.pointnet")
    lom = _import_ref("caspr.models.latent_ode_model")
    flow_mod = _import_ref("caspr.models.flow")

    from caspr_tpu.compat import convert_torch_state_dict
    from caspr_tpu.models.cnf import CNFConfig, mbn_apply, odenet_apply
    from caspr_tpu.models.latent_ode import dynamics_apply
    from caspr_tpu.models.pointnet import pointnetfeat_apply

    torch.manual_seed(42)
    zdim = 160
    ref_global = pn.PointNetfeat(input_dim=4, out_size=128)
    ref_latent = lom.LatentODE(input_size=16, hidden_size=32)

    args = flow_mod.PointCNFArgs()
    args.dims = "32-32"
    args.zdim = zdim
    ref_flow = flow_mod.build_model(args, 3, (32, 32), zdim, 1, True)
    # give the MBNs non-trivial weights/stats so value checks are meaningful
    with torch.no_grad():
        for mbn in (ref_flow.chain[0], ref_flow.chain[2]):
            mbn.weight.copy_(torch.randn(3) * 0.2)
            mbn.bias.copy_(torch.randn(3) * 0.2)
            mbn.running_mean.copy_(torch.randn(3) * 0.1)
            mbn.running_var.copy_(torch.rand(3) + 0.5)
        ref_flow.chain[1].sqrt_end_time.copy_(torch.tensor(0.81))

    sd = {}
    for prefix, module in (
        ("encoder.global_extract.", ref_global),
        ("latent_ode.", ref_latent),
        ("point_cnf.", ref_flow),
    ):
        for k, v in module.state_dict().items():
            sd["module." + prefix + k] = v

    params, state = convert_torch_state_dict(sd)

    # ---- global PointNet ----
    x = np.random.RandomState(1).randn(2, 4, 30).astype(np.float32)
    want = _t2n(ref_global(torch.from_numpy(x)))
    got = pointnetfeat_apply(
        params["encoder"]["global_extract"],
        jnp.asarray(np.transpose(x, (0, 2, 1))),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 2, 1)), want, rtol=1e-4, atol=1e-4
    )

    # ---- latent ODE dynamics ----
    z = np.random.RandomState(2).randn(4, 16).astype(np.float32)
    want = _t2n(ref_latent.ode_func(torch.tensor(0.0), torch.from_numpy(z)))
    got = dynamics_apply(params["latent_ode"], jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    # ---- flow: MBN ends + CNF odenet + trainable end time ----
    cfg = CNFConfig(input_dim=3, dims=(32, 32), zdim=zdim)
    assert cfg.chain() == ("mbn", "cnf", "mbn")
    pts = np.random.RandomState(3).randn(2, 7, 3).astype(np.float32)
    logp = np.zeros((2, 7, 1), np.float32)
    for c in (0, 2):
        ref_flow.chain[c].eval()
        twant, lwant = ref_flow.chain[c](
            torch.from_numpy(pts), None, torch.from_numpy(logp)
        )
        y, lgot, _ = mbn_apply(
            params["point_cnf"][c], state["point_cnf"][c], cfg,
            jnp.asarray(pts), jnp.asarray(logp), reverse=False, training=False,
        )
        np.testing.assert_allclose(np.asarray(y), _t2n(twant), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lgot), _t2n(lwant), rtol=1e-4, atol=1e-5)

    ctx = np.random.RandomState(4).randn(2, 1 + zdim).astype(np.float32)
    want = _t2n(
        ref_flow.chain[1].odefunc.diffeq(
            torch.from_numpy(ctx), torch.from_numpy(pts)
        )
    )
    got = odenet_apply(
        params["point_cnf"][1]["odenet"], cfg, jnp.asarray(ctx), jnp.asarray(pts)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(params["point_cnf"][1]["sqrt_end_time"]), 0.81
    )

    # every real-module buffer/parameter was consumed or knowingly dropped:
    # the converted trees merge cleanly into a matching init (no missing)
    from caspr_tpu.models.caspr import CaSPRConfig, caspr_init
    from caspr_tpu.train.checkpoint import load_weights

    init_params, init_state = caspr_init(
        jax.random.PRNGKey(0),
        CaSPRConfig(
            sa_points=(16, 8, 8, 4, 4),
            ball_samples=(4, 8),
            local_feat_size=64,
            latent_feat_size=zdim,
            ode_hidden_size=32,
            motion_feat_size=16,
            global_feat_size=128,
            cnf_dims=(32, 32),
        ),
    )
    merged = load_weights(init_params, params)
    got_ode = np.asarray(merged["latent_ode"]["layer0"]["weight"])
    np.testing.assert_array_equal(
        got_ode, _t2n(ref_latent.ode_func.dynamics_net[0].weight)
    )
