"""Numerical parity of our functional layers against PyTorch semantics and
round-trip tests for the reference-checkpoint converter.

These are the layer-level guarantees behind "released .pth weights load and
reproduce" (BASELINE.md): GroupNorm, 1x1 conv, the PointNet feature
extractor, ConcatSquash conditioning, and the checkpoint key mapping."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from caspr_tpu.nn import group_norm, linear
from caspr_tpu.models.cnf import (
    CNFConfig,
    _layer_apply,
    odenet_apply,
    odenet_init,
)
from caspr_tpu.models.pointnet import pointnetfeat_apply, pointnetfeat_init

KEY = jax.random.PRNGKey(0)


def test_group_norm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 32, 17).astype(np.float32)  # (B, C, L) torch layout
    w = rng.randn(32).astype(np.float32)
    b = rng.randn(32).astype(np.float32)

    tg = torch.nn.GroupNorm(16, 32)
    with torch.no_grad():
        tg.weight.copy_(torch.from_numpy(w))
        tg.bias.copy_(torch.from_numpy(b))
    want = tg(torch.from_numpy(x)).detach().numpy()

    got = group_norm(
        {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
        jnp.asarray(np.transpose(x, (0, 2, 1))),  # ours: channels-last
        16,
    )
    got = np.transpose(np.asarray(got), (0, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_linear_matches_torch_conv1x1():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 40).astype(np.float32)  # (B, C_in, L)
    tc = torch.nn.Conv1d(8, 24, 1)
    want = tc(torch.from_numpy(x)).detach().numpy()

    params = {
        "weight": jnp.asarray(tc.weight.detach().numpy()[..., 0]),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }
    got = linear(params, jnp.asarray(np.transpose(x, (0, 2, 1))))
    got = np.transpose(np.asarray(got), (0, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class _TorchPointNetFeat(torch.nn.Module):
    """Torch oracle with the reference PointNetfeat architecture
    (reference caspr/models/pointnet.py:18-46)."""

    def __init__(self, input_dim=4, out_size=256, layer_sizes=(64, 128)):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(input_dim, layer_sizes[0], 1)
        self.conv2 = torch.nn.Conv1d(layer_sizes[0], layer_sizes[1], 1)
        self.conv3 = torch.nn.Conv1d(layer_sizes[1], out_size, 1)
        self.bn1 = torch.nn.GroupNorm(16, layer_sizes[0])
        self.bn2 = torch.nn.GroupNorm(16, layer_sizes[1])
        self.bn3 = torch.nn.GroupNorm(16, out_size)
        self.out_size = out_size

    def forward(self, x):
        n_pts = x.shape[2]
        h = torch.relu(self.bn1(self.conv1(x)))
        point_feat = h
        h = torch.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        g = torch.max(h, 2, keepdim=True)[0]
        g = g.expand(-1, self.out_size, n_pts)
        return torch.cat([g, point_feat], dim=1)


def test_pointnetfeat_matches_torch():
    tm = _TorchPointNetFeat(input_dim=4, out_size=256)
    x = np.random.RandomState(2).randn(2, 4, 50).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()

    params = pointnetfeat_init(KEY, input_dim=4, out_size=256)
    for name in ("conv1", "conv2", "conv3"):
        tl = getattr(tm, name)
        params[name]["weight"] = jnp.asarray(tl.weight.detach().numpy()[..., 0])
        params[name]["bias"] = jnp.asarray(tl.bias.detach().numpy())
    for name in ("bn1", "bn2", "bn3"):
        tl = getattr(tm, name)
        params[name]["weight"] = jnp.asarray(tl.weight.detach().numpy())
        params[name]["bias"] = jnp.asarray(tl.bias.detach().numpy())

    got = pointnetfeat_apply(params, jnp.asarray(np.transpose(x, (0, 2, 1))))
    got = np.transpose(np.asarray(got), (0, 2, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_concatsquash_matches_torch():
    """ConcatSquashLinear semantics (reference diffeq_layers.py:76-90)."""
    rng = np.random.RandomState(3)
    dim_in, dim_out, dim_c = 3, 16, 8
    x = rng.randn(2, 10, dim_in).astype(np.float32)
    ctx = rng.randn(2, 1 + dim_c).astype(np.float32)

    t_layer = torch.nn.Linear(dim_in, dim_out)
    t_hb = torch.nn.Linear(1 + dim_c, dim_out, bias=False)
    t_hg = torch.nn.Linear(1 + dim_c, dim_out)
    tx = torch.from_numpy(x)
    tctx = torch.from_numpy(ctx)
    want = (
        t_layer(tx) * torch.sigmoid(t_hg(tctx)).unsqueeze(1)
        + t_hb(tctx).unsqueeze(1)
    ).detach().numpy()

    params = {
        "_layer": {
            "weight": jnp.asarray(t_layer.weight.detach().numpy()),
            "bias": jnp.asarray(t_layer.bias.detach().numpy()),
        },
        "_hyper_bias": {"weight": jnp.asarray(t_hb.weight.detach().numpy())},
        "_hyper_gate": {
            "weight": jnp.asarray(t_hg.weight.detach().numpy()),
            "bias": jnp.asarray(t_hg.bias.detach().numpy()),
        },
    }
    got = _layer_apply(params, "concatsquash", jnp.asarray(ctx), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# --------------------------- converter tests -------------------------------


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _reference_key_for(ours: str):
    """Map our flattened param path to the reference state-dict key."""
    p = ours.split(".")
    if p[0] == "encoder":
        if p[1] == "local_extract":
            if p[2] == "set_abstractions":
                i, _, s, group, j, leaf = p[3], p[4], p[5], p[6], p[7], p[8]
                kind = "conv_layers" if group == "convs" else "bn_layers"
                return (
                    f"encoder.local_extract.set_abstractions.{i}."
                    f"pointnet_modules.{s}.{kind}.{j}.{leaf}"
                ), group == "convs" and leaf == "weight"
            if p[2] == "feature_propagators":
                i, group, j, leaf = p[3], p[4], p[5], p[6]
                seq = int(j) * 3 + (0 if group == "convs" else 1)
                return (
                    f"encoder.local_extract.feature_propagators.{i}."
                    f"unit_pointnet.{seq}.{leaf}"
                ), group == "convs" and leaf == "weight"
            if p[2] in ("final_conv1", "final_norm", "final_conv2"):
                seq = {"final_conv1": 0, "final_norm": 1, "final_conv2": 3}[p[2]]
                return (
                    f"encoder.local_extract.final_layers.{seq}.{p[3]}"
                ), p[2].startswith("final_conv") and p[3] == "weight"
        if p[1] == "global_extract":
            return f"encoder.global_extract.{p[2]}.{p[3]}", p[2].startswith(
                "conv"
            ) and p[3] == "weight"
        return f"encoder.{p[1]}.{p[2]}", p[1].startswith("conv") and p[2] == "weight"
    if p[0] == "latent_ode":
        k = int(p[1][len("layer"):])
        return f"latent_ode.ode_func.dynamics_net.{2 * k}.{p[2]}", False
    if p[0] == "point_cnf":
        c = p[1]
        if p[2] in ("weight", "bias"):
            return f"point_cnf.chain.{c}.{p[2]}", False
        if p[2] == "sqrt_end_time":
            return f"point_cnf.chain.{c}.sqrt_end_time", False
        if p[2] == "odenet":
            j, sub, leaf = p[4], p[5], p[6]
            return (
                f"point_cnf.chain.{c}.odefunc.diffeq.layers.{j}.{sub}.{leaf}"
            ), False
    raise KeyError(ours)


def test_converter_round_trip():
    """Generate params, rename to reference keys (+ conv unsqueeze,
    DataParallel prefix), convert back, and require exact equality for
    every leaf — proves the key map is a bijection over the full model."""
    from caspr_tpu.compat import convert_torch_state_dict
    from caspr_tpu.models.caspr import CaSPRConfig, caspr_init
    from caspr_tpu.train.checkpoint import load_weights

    cfg = CaSPRConfig(
        sa_points=(16, 8, 8, 4, 4),
        ball_samples=(4, 8),
        local_feat_size=64,
        latent_feat_size=160,
        ode_hidden_size=32,
        motion_feat_size=16,
        global_feat_size=128,
        cnf_dims=(32, 32),
    )
    params, state = caspr_init(jax.random.PRNGKey(3), cfg)
    flat = _flatten(params)

    sd = {}
    for ours, val in flat.items():
        ref_key, is_conv = _reference_key_for(ours)
        v = torch.from_numpy(np.asarray(val))
        if is_conv:
            v = v.unsqueeze(-1)
        sd["module." + ref_key] = v
    # MBN buffers -> reference buffer names
    for c, st in enumerate(state["point_cnf"]):
        for name, v in st.items():
            sd[f"module.point_cnf.chain.{c}.{name}"] = torch.from_numpy(
                np.asarray(v)
            )
    # buffers that must be skipped
    sd["module.latent_ode.ode_func._num_evals"] = torch.tensor(0.0)
    sd["module.point_cnf.chain.1.odefunc._num_evals"] = torch.tensor(0.0)

    conv_params, conv_state = convert_torch_state_dict(sd)
    got = _flatten(conv_params)
    assert set(got) == set(flat), (
        set(flat) - set(got),
        set(got) - set(flat),
    )
    for k in flat:
        np.testing.assert_array_equal(got[k], flat[k], err_msg=k)

    got_state = _flatten(conv_state)
    want_state = _flatten(state)
    assert set(got_state) == set(want_state)

    # merging through load_weights keeps everything (no missing keys)
    merged = load_weights(params, conv_params)
    for k, v in _flatten(merged).items():
        np.testing.assert_array_equal(v, flat[k], err_msg=k)
