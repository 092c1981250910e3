"""Static-shape eval batching: the loader's pad_last fills a short final
batch (one XLA compile for the whole eval) and every eval consumer masks
the padding out of its statistics.

The reference iterates a dynamic final batch (caspr/test.py:112-115) —
free in eager torch, a multi-minute recompile under jit; pad-and-mask is
the TPU-native redesign with identical observable statistics."""

import os

import numpy as np
import jax
import pytest

from caspr_tpu.data import DynamicPCLDataset, SequenceLoader
from caspr_tpu.models.caspr import CaSPRConfig, CaSPRModel, caspr_init
from caspr_tpu.train.loop import run_one_epoch
from caspr_tpu.train.trackers import TestStatTracker
from caspr_tpu.utils import evaluations as ev

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_CFG = os.path.join(REPO, "data", "configs", "demo.cfg")

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


def _demo_dataset():
    return DynamicPCLDataset(
        DEMO_CFG,
        split="test",
        num_pts=ev.PROTOCOL_NUM_PTS,
        seq_len=ev.PROTOCOL_NUM_STEPS,
        shift_time_to_zero=True,
        random_point_sample=False,
    )


def test_pad_last_static_shapes_and_valid_counts():
    ds = _demo_dataset()
    assert len(ds) == 3
    loader = SequenceLoader(ds, batch_size=2, pad_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == 2
    shapes = [b["input"].shape for b in batches]
    assert shapes[0] == shapes[1]  # static: no recompiles
    valids = [b["valid"] for b in batches]
    assert valids == [2, 1]
    assert sum(valids) == len(ds)
    # padding row repeats the batch's own items cyclically
    np.testing.assert_array_equal(
        batches[1]["input"][1], batches[1]["input"][0]
    )


def test_pad_last_exclusive_with_drop_last():
    ds = _demo_dataset()
    with pytest.raises(ValueError):
        SequenceLoader(ds, batch_size=2, drop_last=True, pad_last=True)


def test_tnocs_regression_stats_invariant_to_padding(tmp_path):
    """Batch 2 (padded final batch) must produce exactly the statistics of
    batch 3 (one full batch) — the padding contributes nothing."""
    cfg = CaSPRConfig(**TINY)
    params, state = caspr_init(jax.random.PRNGKey(0), cfg)
    model = CaSPRModel(cfg)
    ds = _demo_dataset()

    outs = {}
    for bs in (3, 2):
        log_out = os.path.join(tmp_path, f"tnocs_bs{bs}_log.txt")
        loader = SequenceLoader(ds, batch_size=bs, pad_last=True, seed=0)
        ev.test_tnocs_regression(model, params, state, loader, log_out)
        outs[bs] = np.load(log_out[: -len("txt")] + "npz")

    assert outs[2]["space"].shape == outs[3]["space"].shape == (3 * 10,)
    np.testing.assert_allclose(
        outs[2]["space"], outs[3]["space"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        outs[2]["time"], outs[3]["time"], rtol=1e-4, atol=1e-5
    )


def test_run_one_epoch_masks_padding(tmp_path):
    """The epoch runner's eval branch must drop padded rows from every
    tracked statistic (checked with a stub step so the masking logic is
    isolated from model randomness)."""

    b, t, n = 2, 3, 4
    rng = np.random.RandomState(0)
    nll = rng.rand(b, t, n).astype(np.float32)
    pos = rng.rand(b, t, n).astype(np.float32)
    tim = rng.rand(b, t, n).astype(np.float32)
    loss_items = np.array([1.5, 99.0], np.float32)  # row 1 is padding

    def stub_step(params, mbn_state, x, target, key):
        return {
            "loss_per_item": loss_items,
            "nll": nll,
            "tnocs_pos_err": pos,
            "tnocs_time_err": tim,
            "nfe": np.array([5.0, 7.0], np.float32),
        }

    batch = {
        "input": np.zeros((b, t, n, 4), np.float32),
        "target": np.zeros((b, t, n, 4), np.float32),
        "model_id": ["m", "m"],
        "seq_id": ["s", "s"],
        "valid": 1,
    }

    class _Loader:
        def __iter__(self):
            return iter([batch])

        def __len__(self):
            return 1

    tracker = TestStatTracker()
    run_one_epoch(
        stub_step, None, None, None, _Loader(), jax.random.PRNGKey(0), 0,
        tracker, os.path.join(tmp_path, "log.txt"), mode="test",
        print_stats_every=10,
    )
    loss, cnf, pos_m, time_m, nfe = tracker.get_mean_stats()
    assert loss == pytest.approx(1.5)  # padded row's 99.0 excluded
    assert cnf == pytest.approx(float(nll[0].mean()))
    assert pos_m == pytest.approx(float(pos[0].mean()), rel=1e-6)
    assert time_m == pytest.approx(float(tim[0].mean()), rel=1e-6)
    np.testing.assert_allclose(nfe, [5.0, 7.0])
