"""Dataset/loader tests against the in-repo demo sequences (the
reference's own smoke-test data, reference README.md:57-63)."""

import os

import numpy as np
import pytest

from caspr_tpu.data import (
    DynamicPCLDataset,
    SequenceLoader,
    load_seq_path,
    parse_dataset_cfg,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO_CFG = os.path.join(REPO, "data", "configs", "demo.cfg")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REPO, "data", "demo")),
    reason="demo data not present",
)


def test_parse_cfg_resolves_paths():
    args = parse_dataset_cfg(DEMO_CFG)
    assert args.max_timestamp == 5.0
    assert args.expected_num_pts == 4096
    assert args.expected_seq_len == 10
    assert all(os.path.exists(p) for p in args.data)
    assert all(os.path.exists(p) for p in args.splits)


def test_load_seq_timestamps():
    args = parse_dataset_cfg(DEMO_CFG)
    model = sorted(os.listdir(args.data[0]))[0]
    seq_dir = os.path.join(args.data[0], model, "seq_00000000")
    frames = sorted(
        os.path.join(seq_dir, f) for f in os.listdir(seq_dir) if "frame" in f
    )
    nocs, depth, pose = load_seq_path(frames, max_timestamp=5.0, expected_num_pts=4096)
    assert nocs.shape == (10, 4096, 4)
    assert depth.shape == (10, 4096, 4)
    # NOCS time in [0,1]; world time in [0, 5]
    np.testing.assert_allclose(nocs[:, 0, 3], np.linspace(0, 1, 10), atol=1e-8)
    np.testing.assert_allclose(depth[:, 0, 3], np.linspace(0, 5, 10), atol=1e-7)
    # NOCS coordinates live in the unit cube
    assert nocs[..., :3].min() >= 0.0 and nocs[..., :3].max() <= 1.0


def test_dataset_item_semantics():
    ds = DynamicPCLDataset(
        DEMO_CFG, split="test", num_pts=512, seq_len=5, shift_time_to_zero=True
    )
    assert len(ds) == 3  # demo splits list all 3 models in every split
    rng = np.random.default_rng(0)
    item = ds.get_item(0, rng)
    assert item["input"].shape == (5, 512, 4)
    assert item["target"].shape == (5, 512, 4)
    # shift-to-zero puts the first sampled timestamp at 0
    assert item["input"][..., 3].min() == 0.0
    assert item["target"][..., 3].min() == 0.0
    # timestamps non-decreasing (steps sorted)
    t = item["input"][:, 0, 3]
    assert np.all(np.diff(t) >= 0)
    # same rng seed -> same sample
    item2 = ds.get_item(0, np.random.default_rng(0))
    np.testing.assert_array_equal(item["input"], item2["input"])


def test_dataset_first_steps_protocol():
    ds = DynamicPCLDataset(
        DEMO_CFG, split="test", num_pts=2048, seq_len=10, random_point_sample=False
    )
    rng = np.random.default_rng(1)
    item = ds.get_item(0, rng)
    assert item["input"].shape == (10, 2048, 4)
    np.testing.assert_allclose(
        item["target"][:, 0, 3], np.linspace(0, 1, 10), atol=1e-6
    )


def test_loader_batching_and_determinism():
    ds = DynamicPCLDataset(DEMO_CFG, split="test", num_pts=64, seq_len=3)
    loader = SequenceLoader(ds, batch_size=2, shuffle=True, seed=7)
    batches1 = list(loader)
    batches2 = list(loader)
    assert batches1[0]["input"].shape == (2, 3, 64, 4)
    assert len(batches1[0]["model_id"]) == 2
    np.testing.assert_array_equal(batches1[0]["input"], batches2[0]["input"])
    loader.set_epoch(1)
    batches3 = list(loader)
    assert not np.array_equal(batches1[0]["input"], batches3[0]["input"])


def test_loader_pose_data():
    ds = DynamicPCLDataset(DEMO_CFG, split="test", num_pts=32, seq_len=2)
    ds.set_return_pose_data(True)
    loader = SequenceLoader(ds, batch_size=3, shuffle=False)
    batch = next(iter(loader))
    assert batch["pose"].shape == (3, 2, 4, 4)
