"""Evaluation-protocol tests on CPU with a tiny model and synthetic
protocol-shaped data: metric math, artifact files (txt/npz/csv), and the
RANSAC pose pipeline end to end."""

import csv
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caspr_tpu.models.caspr import CaSPRConfig, CaSPRModel, caspr_init
from caspr_tpu.utils import evaluations as ev

TINY = dict(
    sa_points=(16, 8, 8, 4, 4),
    ball_samples=(4, 8),
    local_feat_size=64,
    latent_feat_size=160,
    ode_hidden_size=32,
    motion_feat_size=16,
    global_feat_size=128,
    cnf_dims=(32, 32),
)


class _FakeLoader:
    """One protocol-shaped batch (B=2, T=10, N=2048) with pose data."""

    def __init__(self, with_pose=False):
        rng = np.random.RandomState(0)
        t = np.linspace(0, 1, ev.PROTOCOL_NUM_STEPS, dtype=np.float32)
        nocs = rng.rand(2, 10, ev.PROTOCOL_NUM_PTS, 4).astype(np.float32)
        nocs[..., 3] = t[None, :, None]
        world = nocs.copy()
        world[..., 3] = t[None, :, None] * 5.0
        self.batch = {
            "input": world,
            "target": nocs,
            "model_id": ["m0", "m1"],
            "seq_id": ["s0", "s0"],
        }
        if with_pose:
            pose = np.tile(np.eye(4, dtype=np.float32), (2, 10, 1, 1))
            self.batch["pose"] = pose

        class _DS:
            def set_return_pose_data(self, flag):
                pass

        self.dataset = _DS()

    def __iter__(self):
        return iter([self.batch])

    def __len__(self):
        return 1


@pytest.fixture(scope="module")
def tiny_model():
    cfg = CaSPRConfig(**TINY)
    params, state = caspr_init(jax.random.PRNGKey(0), cfg)
    return CaSPRModel(cfg), params, state


def test_eval_reconstr_frames_math():
    rng = np.random.RandomState(1)
    gt = rng.rand(3, 64, 3).astype(np.float32)
    chamfer, emd = ev.eval_reconstr_frames(gt, gt)
    assert np.all(chamfer < 1e-8)
    assert np.all(emd < 1e-3)
    shifted = gt + np.array([0.2, 0, 0], np.float32)
    chamfer2, emd2 = ev.eval_reconstr_frames(shifted, gt)
    assert np.all(chamfer2 > 1e-4) and np.all(emd2 > 0.1)


def test_shape_recon_artifacts(tmp_path, tiny_model):
    model, params, state = tiny_model
    log_out = os.path.join(tmp_path, "recon_log.txt")
    ev.test_shape_recon(
        model, params, state, _FakeLoader(), log_out,
        ev.SPLIT_OBSERVED_STEPS, ev.SPLIT_UNOBSERVED_STEPS,
        key=jax.random.PRNGKey(1),
    )
    assert os.path.exists(log_out)
    data = np.load(os.path.join(tmp_path, "recon_log.npz"))
    assert len(data["observed_chamfer"]) == 2 * 3  # B * T_observed
    assert len(data["unobserved_chamfer"]) == 2 * 7
    with open(os.path.join(tmp_path, "recon_log.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["type", "model_id", "seq_id", "chamfer", "emd"]
    assert len(rows) == 1 + 2 * 2  # header + (obs + unobs) x 2 seqs
    txt = open(log_out).read()
    assert "OBSERVED SAMPLING RECONSTR EVAL" in txt
    assert "UNOBSERVED SAMPLING RECONSTR EVAL" in txt


def test_tnocs_regression_artifacts(tmp_path, tiny_model):
    model, params, state = tiny_model
    log_out = os.path.join(tmp_path, "tnocs_log.txt")
    mean_space, mean_time = ev.test_tnocs_regression(
        model, params, state, _FakeLoader(), log_out
    )
    assert 0 <= mean_space < 2.0 and 0 <= mean_time < 1.0
    data = np.load(os.path.join(tmp_path, "tnocs_log.npz"))
    assert len(data["space"]) == 2 * 10
    with open(os.path.join(tmp_path, "tnocs_log.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 3  # header + 2 seqs


def test_pose_ransac_artifacts(tmp_path, tiny_model):
    model, params, state = tiny_model
    log_out = os.path.join(tmp_path, "pose_log.txt")
    ev.test_observed_camera_pose_ransac(
        model, params, state, _FakeLoader(with_pose=True), log_out
    )
    data = np.load(os.path.join(tmp_path, "pose_log_RANSAC.npz"))
    assert len(data["trans"]) == 2 * 10
    assert np.all(np.isfinite(data["rot"]))
    with open(os.path.join(tmp_path, "pose_log_RANSAC.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 3


def test_protocol_violation_raises(tiny_model):
    model, params, state = tiny_model

    class _BadLoader(_FakeLoader):
        def __init__(self):
            super().__init__()
            self.batch["input"] = self.batch["input"][:, :5]
            self.batch["target"] = self.batch["target"][:, :5]

    with pytest.raises(ValueError, match="protocol requires"):
        ev.test_tnocs_regression(
            model, params, state, _BadLoader(), "/tmp/unused_log.txt"
        )


def test_pose_ransac_show_exports_scene(tmp_path, tiny_model):
    model, params, state = tiny_model
    log_out = os.path.join(tmp_path, "poseviz_log.txt")
    ev.test_observed_camera_pose_ransac(
        model, params, state, _FakeLoader(with_pose=True), log_out, show=True
    )
    scenes = [d for d in os.listdir(tmp_path) if d.startswith("pose_m")]
    assert len(scenes) == 2
    files = os.listdir(os.path.join(tmp_path, scenes[0]))
    assert "viewer.html" in files and "frame_0000.ply" in files


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shape_recon_on_dp_sp_mesh(tmp_path, tiny_model):
    """The sharded eval (batch over dp, points over sp) must reproduce the
    single-device protocol metrics."""
    from caspr_tpu.parallel import make_mesh, replicate

    model, params, state = tiny_model
    base = os.path.join(tmp_path, "base_log.txt")
    ev.test_shape_recon(
        model, params, state, _FakeLoader(), base,
        ev.SPLIT_OBSERVED_STEPS, ev.SPLIT_UNOBSERVED_STEPS,
        key=jax.random.PRNGKey(1),
    )
    mesh = make_mesh(jax.devices()[:8], sp_size=4)
    sharded = os.path.join(tmp_path, "mesh_log.txt")
    ev.test_shape_recon(
        model, replicate(mesh, params), replicate(mesh, state),
        _FakeLoader(), sharded,
        ev.SPLIT_OBSERVED_STEPS, ev.SPLIT_UNOBSERVED_STEPS,
        key=jax.random.PRNGKey(1), mesh=mesh,
    )
    a = np.load(os.path.join(tmp_path, "base_log.npz"))
    b = np.load(os.path.join(tmp_path, "mesh_log.npz"))
    for k in ("observed_chamfer", "unobserved_chamfer", "observed_emd"):
        np.testing.assert_allclose(b[k], a[k], rtol=2e-3, atol=1e-7)
