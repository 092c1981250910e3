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


def test_native_loader_matches_numpy():
    """The C++ loader must be bit-identical to the numpy reference path."""
    from caspr_tpu.data.native_loader import (
        load_seq_path_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native loader not built")
    args = parse_dataset_cfg(DEMO_CFG)
    for model in sorted(os.listdir(args.data[0]))[:2]:
        seq_dir = os.path.join(args.data[0], model, "seq_00000000")
        frames = sorted(
            os.path.join(seq_dir, f)
            for f in os.listdir(seq_dir)
            if "frame" in f
        )
        a = load_seq_path(frames, 5.0, 4096)
        b = load_seq_path_native(frames, 5.0, 4096)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_native_loader_blank_and_padding(tmp_path):
    """Synthetic archives: short frames repeat-pad; a blank frame truncates
    the remainder of the sequence (caspr_dataset.py:183-195 semantics)."""
    from caspr_tpu.data.native_loader import (
        load_seq_path_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native loader not built")
    rng = np.random.RandomState(0)
    paths = []
    datas = []
    for i, n in enumerate([5, 3, 0]):  # third frame blank
        nocs = rng.rand(n, 3) if n else np.zeros((4, 3))
        depth = rng.rand(n, 3) if n else np.zeros((4, 3))
        pose = np.eye(4)
        p = os.path.join(tmp_path, f"frame_{i}.npz")
        np.savez(p, nocs_data=nocs, depth_data=depth, obj_T=pose)
        paths.append(p)
        datas.append((nocs, depth))
    nocs, depth, pose = load_seq_path_native(paths, 2.0, 8)
    want_nocs, want_depth, want_pose = load_seq_path(paths, 2.0, 8)
    np.testing.assert_array_equal(nocs, want_nocs)
    np.testing.assert_array_equal(depth, want_depth)
    np.testing.assert_array_equal(pose, want_pose)
    # padding repeats source points cyclically
    np.testing.assert_array_equal(nocs[0, 5, :3], datas[0][0][0])
    # blank frame zeroes the tail
    assert np.count_nonzero(nocs[2]) == 0


def test_all_dataset_cfgs_resolve():
    """Every shipped .cfg parses and its split dirs resolve to real split
    files (reference data/configs/*.cfg + data/splits/*), so the full
    cars/chairs/airplanes recipes fail only on absent DATA, never on
    missing split membership lists."""
    cfg_dir = os.path.join(REPO, "data", "configs")
    expected_splits = {
        "demo.cfg": "demo_splits",
        "cars.cfg": "car_splits",
        "chairs.cfg": "chair_splits",
        "airplanes.cfg": "airplane_splits",
    }
    for cfg_name, split_dir in expected_splits.items():
        args = parse_dataset_cfg(os.path.join(cfg_dir, cfg_name))
        assert args.splits is not None and len(args.splits) == 1
        resolved = args.splits[0]
        assert os.path.isdir(resolved), (cfg_name, resolved)
        assert os.path.basename(resolved) == split_dir
        for split in ("train", "val", "test"):
            split_file = os.path.join(resolved, f"{split}_split.txt")
            assert os.path.exists(split_file), split_file
            with open(split_file) as f:
                names = [s for s in f.read().split("\n") if s]
            assert len(names) > 0
    # warping_cars has no split dir by design (frac-based splits)
    args = parse_dataset_cfg(os.path.join(cfg_dir, "warping_cars.cfg"))
    assert args.splits is None


def test_loader_process_sharding():
    """Shard loaders (same seed) must partition each global batch: the
    per-shard rows concatenate to the unsharded loader's batch, and each
    process fetches only its own rows."""
    from caspr_tpu.data import DynamicPCLDataset, SequenceLoader

    ds = DynamicPCLDataset(DEMO_CFG, split="test", train_frac=0.0,
                           val_frac=0.0, num_pts=16, seq_len=2)
    full = SequenceLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                          seed=3)
    s0 = SequenceLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        seed=3, num_shards=2, shard_index=0)
    s1 = SequenceLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                        seed=3, num_shards=2, shard_index=1)
    for epoch in (0, 1):
        for ld in (full, s0, s1):
            ld.set_epoch(epoch)
        for bf, b0, b1 in zip(iter(full), iter(s0), iter(s1)):
            assert b0["input"].shape[0] == 1 and b1["input"].shape[0] == 1
            np.testing.assert_array_equal(
                np.concatenate([b0["input"], b1["input"]]), bf["input"]
            )
            assert b0["model_id"] + b1["model_id"] == bf["model_id"]

    with pytest.raises(ValueError):
        SequenceLoader(ds, batch_size=2, shuffle=True, seed=3,
                       num_shards=2, shard_index=0)  # needs drop/pad_last
    with pytest.raises(ValueError):
        SequenceLoader(ds, batch_size=5, drop_last=True, num_shards=2)
