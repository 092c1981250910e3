"""Dynamic point-cloud sequence dataset + loader.

Host-side numpy re-implementation of reference
caspr/data/caspr_dataset.py:1-349 with identical observable semantics:

  - ``@cfg``-file dataset options via a line-splitting argparse parser
    (caspr_dataset.py:22-34); relative paths resolve against the CWD like
    the reference, falling back to the cfg file's directory
  - split selection via split-file directories or train/val fractions
    (caspr_dataset.py:36-145), BAD_MODELS skip list (11-13), expected
    sequence-length filtering (94-97)
  - per-sequence lazy npz loading with blank-frame rejection, repeat
    padding of short frames, and NOCS [0,1] / world [0,max_timestamp]
    timestamp synthesis (caspr_dataset.py:148-208)
  - per-item random time-step subsampling (sorted) and random point
    subsampling, optional per-step sampling, shift-time-to-zero
    (caspr_dataset.py:277-343)

Differences (deliberate, TPU-first): randomness comes from an explicit
numpy Generator so loading is reproducible, and batching/prefetch is a
small thread-pool loader instead of torch DataLoader workers (npz decode
is numpy-bound and releases the GIL for I/O).
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence

import numpy as np

# Renders that are just spheres (reference caspr_dataset.py:10-13).
BAD_MODELS = [
    "93ce8e230939dfc230714334794526d4",
    "207e69af994efa9330714334794526d4",
    "2307b51ca7e4a03d30714334794526d4",
]

DEFAULT_MAX_TIMESTAMP = 5.0
DEFAULT_EXPECTED_SEQ_LEN = 10
DEFAULT_EXPECTED_NUM_PTS = 4096


class _SplitLineParser(argparse.ArgumentParser):
    def convert_arg_line_to_args(self, arg_line):
        return arg_line.split()


def parse_dataset_cfg(cfg_file_path: str):
    """Parse a dataset .cfg (same flag surface as caspr_dataset.py:26-34)."""
    parser = _SplitLineParser(fromfile_prefix_chars="@", allow_abbrev=False)
    parser.add_argument("--data", type=str, nargs="+", required=True)
    parser.add_argument("--splits", type=str, nargs="+", default=None)
    parser.add_argument("--max-timestamp", type=float, default=DEFAULT_MAX_TIMESTAMP)
    parser.add_argument(
        "--expected-num-pts", type=int, default=DEFAULT_EXPECTED_NUM_PTS
    )
    parser.add_argument(
        "--expected-seq-len", type=int, default=DEFAULT_EXPECTED_SEQ_LEN
    )
    args = parser.parse_args(["@" + cfg_file_path])

    # Resolve relative data/split paths: CWD first (reference behavior,
    # scripts are documented to run next to the data tree), else relative
    # to the cfg file so configs work from anywhere.
    cfg_dir = os.path.dirname(os.path.abspath(cfg_file_path))

    def _resolve(p):
        if p is None or os.path.isabs(p) or os.path.exists(p):
            return p
        # reference cfgs use paths like ../data/cars relative to a script
        # directory one level below the repo root; try the cfg file's dir
        # and its parent as anchors
        for anchor in (cfg_dir, os.path.join(cfg_dir, "..")):
            alt = os.path.normpath(os.path.join(anchor, p))
            if os.path.exists(alt):
                return alt
        return p

    args.data = [_resolve(p) for p in args.data]
    if args.splits is not None:
        args.splits = [_resolve(p) for p in args.splits]
    return args


def load_time_data(
    data_roots: Sequence[str],
    split: str,
    train_frac: float,
    val_frac: float,
    splits_dirs: Optional[Sequence[str]] = None,
    data_seq_len: int = DEFAULT_EXPECTED_SEQ_LEN,
) -> List[List[str]]:
    """Collect per-sequence frame-file lists for a split
    (reference caspr_dataset.py:36-145)."""
    all_seq_paths: List[List[str]] = []
    for src_idx, data_root in enumerate(data_roots):
        if not os.path.exists(data_root):
            raise FileNotFoundError(f"Could not find data root {data_root}")

        split_list = None
        cur_split_dir = None
        if splits_dirs is not None:
            cur_split_dir = splits_dirs[src_idx]
            split_file = os.path.join(cur_split_dir, split + "_split.txt")
            if not os.path.exists(split_file):
                raise FileNotFoundError(
                    f"No split file for requested split: {split_file}"
                )
            with open(split_file, "r") as f:
                split_list = [s for s in f.read().split("\n")]

        if split_list is None:
            model_dirs = [
                os.path.join(data_root, f)
                for f in sorted(os.listdir(data_root))
                if f[0] != "."
            ]
            model_dirs = [f for f in model_dirs if os.path.isdir(f)]
        else:
            model_dirs = [
                os.path.join(data_root, m) for m in split_list if m != ""
            ]

        seq_paths: List[List[List[str]]] = []
        for model_path in model_dirs:
            model_id = os.path.basename(model_path)
            if cur_split_dir is not None and not os.path.exists(model_path):
                print(f"WARNING: model {model_id} in split file missing; skipping")
                continue
            if model_id in BAD_MODELS:
                continue
            cur_model_paths = []
            seq_dirs = [
                os.path.join(model_path, f)
                for f in sorted(os.listdir(model_path))
                if f[0] != "."
            ]
            seq_dirs = [f for f in seq_dirs if os.path.isdir(f)]
            for seq_path in seq_dirs:
                frames = sorted(glob.glob(os.path.join(seq_path, "*frame*.npz")))
                if len(frames) != data_seq_len:
                    continue
                cur_model_paths.append(frames)
            seq_paths.append(cur_model_paths)

        num_models = len(seq_paths)
        if splits_dirs is None:
            if train_frac + val_frac > 1.0:
                raise ValueError("train_frac + val_frac must be <= 1.0")
            # same boundaries as the reference (caspr_dataset.py:118-122)
            # expressed without indexing into possibly-empty ranges
            n_train = int(train_frac * num_models)
            n_val = int(val_frac * num_models)
            train_inds = np.arange(n_train)
            val_inds = np.arange(n_train, n_train + n_val)
            test_inds = np.arange(n_train + n_val, num_models)
            split_inds = {"train": train_inds, "val": val_inds, "test": test_inds}[
                split
            ]
        else:
            split_inds = np.arange(num_models)

        for i in split_inds.tolist():
            all_seq_paths.extend(seq_paths[i])

    return all_seq_paths


def load_seq_path(
    seq_path_list: Sequence[str],
    max_timestamp: float = DEFAULT_MAX_TIMESTAMP,
    expected_num_pts: int = DEFAULT_EXPECTED_NUM_PTS,
):
    """Load one sequence (reference caspr_dataset.py:148-208).

    Returns (nocs_seq (T,N,4), depth_seq (T,N,4), pose_seq (T,4,4)); a blank
    frame aborts the fill like the reference (remaining steps stay zero).
    """
    seq_len = len(seq_path_list)
    step_size = 0.0 if seq_len == 1 else 1.0 / (seq_len - 1)

    nocs_seq = np.zeros((seq_len, expected_num_pts, 4))
    depth_seq = np.zeros((seq_len, expected_num_pts, 4))
    pose_seq = np.zeros((seq_len, 4, 4))
    for step_idx, pc_file in enumerate(seq_path_list):
        pc_data = np.load(pc_file)
        nocs_pc = pc_data["nocs_data"]
        depth_pc = pc_data["depth_data"]
        pose = pc_data["obj_T"]

        if depth_pc.size == 0:  # warping-cars style data: use NOCS as input
            depth_pc = nocs_pc
        if pose.size == 0:
            pose = np.zeros((4, 4))
        if np.count_nonzero(nocs_pc) == 0:  # blank frame: drop the tail
            break

        while nocs_pc.shape[0] < expected_num_pts:  # repeat-pad short frames
            pad = expected_num_pts - nocs_pc.shape[0]
            nocs_pc = np.concatenate([nocs_pc, nocs_pc[:pad]], axis=0)
            depth_pc = np.concatenate([depth_pc, depth_pc[:pad]], axis=0)

        pose_seq[step_idx] = pose
        t_nocs = np.full((nocs_pc.shape[0], 1), step_size * step_idx)
        nocs_seq[step_idx] = np.concatenate([nocs_pc, t_nocs], axis=1)
        t_world = max_timestamp * t_nocs
        depth_seq[step_idx] = np.concatenate([depth_pc, t_world], axis=1)

    return nocs_seq, depth_seq, pose_seq


class DynamicPCLDataset:
    """Sequence dataset with the reference's sampling semantics
    (caspr_dataset.py:211-349), reproducible via explicit numpy RNG."""

    def __init__(
        self,
        data_cfg: str,
        split: str = "train",
        train_frac: float = 0.8,
        val_frac: float = 0.1,
        num_pts: int = 1024,
        seq_len: int = 5,
        shift_time_to_zero: bool = False,
        random_point_sample: bool = True,
        random_point_sample_per_step: bool = False,
    ):
        if split not in ("train", "val", "test"):
            raise ValueError(f"invalid split {split!r}")
        data_args = parse_dataset_cfg(data_cfg)
        self.data_paths = data_args.data
        self.split_paths = data_args.splits
        self.data_seq_len = data_args.expected_seq_len
        self.expected_num_pts = data_args.expected_num_pts
        self.max_timestamp = data_args.max_timestamp

        self.split = split
        self.num_pts = num_pts
        self.seq_len = seq_len
        self.shift_time_to_zero = shift_time_to_zero
        self.random_point_sample = random_point_sample
        self.random_point_sample_per_step = random_point_sample_per_step
        self.return_pose_data = False
        self.return_first_steps = False
        # native C++ loader by default when it builds (identical output;
        # see native_loader); CASPR_TPU_NATIVE_LOADER=0 forces numpy
        if os.environ.get("CASPR_TPU_NATIVE_LOADER", "auto") == "0":
            self.use_native_loader = False
        else:
            from .native_loader import native_available

            self.use_native_loader = native_available()

        self.seq_data_paths = load_time_data(
            self.data_paths,
            split,
            train_frac,
            val_frac,
            self.split_paths,
            data_seq_len=self.data_seq_len,
        )

    def __len__(self):
        return len(self.seq_data_paths)

    def set_return_pose_data(self, flag: bool):
        self.return_pose_data = flag

    def set_return_first_steps(self, flag: bool):
        self.return_first_steps = flag

    def __getitem__(self, idx):
        return self.get_item(idx, np.random)

    def get_item(self, idx: int, rng):
        """Load + subsample one sequence.

        Returns dict with 'input' (T,N,4) world cloud, 'target' (T,N,4)
        T-NOCS cloud, optionally 'pose' (T,4,4), plus 'model_id'/'seq_id'.
        """
        frames = self.seq_data_paths[idx]
        model_id = frames[0].split("/")[-3]
        seq_id = frames[0].split("/")[-2]
        if self.use_native_loader:
            from .native_loader import load_seq_path_native

            nocs_seq, depth_seq, pose_seq = load_seq_path_native(
                frames,
                max_timestamp=self.max_timestamp,
                expected_num_pts=self.expected_num_pts,
            )
        else:
            nocs_seq, depth_seq, pose_seq = load_seq_path(
                frames,
                max_timestamp=self.max_timestamp,
                expected_num_pts=self.expected_num_pts,
            )

        if self.return_first_steps:
            steps = np.arange(self.seq_len)
        else:
            steps = np.sort(
                rng.choice(nocs_seq.shape[0], self.seq_len, replace=False)
            )

        if self.random_point_sample:
            pts = rng.choice(nocs_seq.shape[1], self.num_pts, replace=False)
            input_data = depth_seq[steps][:, pts].copy()
            output_data = nocs_seq[steps][:, pts].copy()
        elif self.random_point_sample_per_step:
            per_step = np.stack(
                [
                    rng.choice(nocs_seq.shape[1], self.num_pts, replace=False)
                    for _ in range(len(steps))
                ]
            )
            rows = np.repeat(np.arange(len(steps)), self.num_pts)
            cols = per_step.reshape(-1)
            input_data = depth_seq[steps][rows, cols].reshape(
                len(steps), self.num_pts, -1
            )
            output_data = nocs_seq[steps][rows, cols].reshape(
                len(steps), self.num_pts, -1
            )
        else:
            input_data = depth_seq[steps][:, : self.num_pts].copy()
            output_data = nocs_seq[steps][:, : self.num_pts].copy()

        if self.shift_time_to_zero:  # caspr_dataset.py:325-328
            input_data[:, :, -1] -= np.min(input_data[:, :, -1])
            output_data[:, :, -1] -= np.min(output_data[:, :, -1])

        item = {
            "input": input_data.astype(np.float32),
            "target": output_data.astype(np.float32),
            "model_id": model_id,
            "seq_id": seq_id,
        }
        if self.return_pose_data:
            item["pose"] = pose_seq[steps].astype(np.float32)
        return item


class SequenceLoader:
    """Minimal batching loader with thread-pool prefetch.

    Deterministic given ``seed``: the epoch ordering and every per-item
    subsampling RNG derive from it.  Batches are dicts of stacked numpy
    arrays plus 'model_id'/'seq_id' lists, ready for jnp.asarray/device_put.

    ``pad_last`` repeats items of a short final batch (cyclically) so every
    batch has exactly ``batch_size`` rows, and adds ``batch['valid']`` with
    the number of real rows.  Static batch shapes mean jit consumers
    compile exactly once — the reference's dynamic final batch is free in
    eager torch (caspr/test.py:112-115) but a multi-minute recompile under
    XLA; consumers mask the padding out of their statistics instead.
    """

    def __init__(
        self,
        dataset: DynamicPCLDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 2,
        pad_last: bool = False,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """``num_shards``/``shard_index``: multi-host data sharding — every
        process computes the same global epoch order (same seed) and
        fetches only its ``batch_size/num_shards`` rows of each global
        batch; jax.make_array_from_process_local_data reassembles the
        global batch on device (see parallel.mesh.global_batch_points)."""
        if drop_last and pad_last:
            raise ValueError("drop_last and pad_last are mutually exclusive")
        if num_shards > 1 and batch_size % num_shards:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {num_shards} shards"
            )
        if num_shards > 1 and not (drop_last or pad_last):
            raise ValueError(
                "multi-shard loading needs full-size batches: set "
                "drop_last or pad_last"
            )
        if not 0 <= shard_index < max(num_shards, 1):
            raise ValueError(f"shard_index {shard_index} out of range")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.num_shards = max(num_shards, 1)
        self.shard_index = shard_index
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        root = np.random.SeedSequence([self.seed, self.epoch])
        order_rng = np.random.default_rng(root.spawn(1)[0])
        order = np.arange(n)
        if self.shuffle:
            order_rng.shuffle(order)
        if self.drop_last:
            order = order[: (n // self.batch_size) * self.batch_size]

        item_seeds = root.spawn(len(order))

        def fetch(pos):
            rng = np.random.default_rng(item_seeds[pos])
            return self.dataset.get_item(int(order[pos]), rng)

        batches = [
            list(range(i, min(i + self.batch_size, len(order))))
            for i in range(0, len(order), self.batch_size)
        ]
        valid_counts = [len(b) for b in batches]
        if self.pad_last:
            batches = [
                [b[i % len(b)] for i in range(self.batch_size)] for b in batches
            ]
        if self.num_shards > 1:
            # this process's rows of each (full-size) global batch.
            # pad_last padding occupies the global tail, so this shard's
            # real-row count is the clipped remainder of the global one
            lbs = self.batch_size // self.num_shards
            local_valids = [
                min(max(v - self.shard_index * lbs, 0), lbs)
                for v in valid_counts
            ]
            batches = [
                b[self.shard_index * lbs:(self.shard_index + 1) * lbs]
                for b in batches
            ]
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # pipeline: submit next batch while current is consumed
            futures = [
                [pool.submit(fetch, p) for p in b] for b in batches[:2]
            ]
            for bi, batch_positions in enumerate(batches):
                if bi + 2 < len(batches):
                    futures.append(
                        [pool.submit(fetch, p) for p in batches[bi + 2]]
                    )
                items = [f.result() for f in futures[bi]]
                batch = {
                    "input": np.stack([it["input"] for it in items]),
                    "target": np.stack([it["target"] for it in items]),
                    "model_id": [it["model_id"] for it in items],
                    "seq_id": [it["seq_id"] for it in items],
                }
                if self.pad_last:
                    if self.num_shards > 1:
                        # local masking contract + the global count for
                        # consumers that gather the full batch
                        batch["valid"] = local_valids[bi]
                        batch["valid_global"] = valid_counts[bi]
                    else:
                        batch["valid"] = valid_counts[bi]
                if "pose" in items[0]:
                    batch["pose"] = np.stack([it["pose"] for it in items])
                yield batch
