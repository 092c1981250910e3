"""The paper evaluation protocols, on-device.

Re-implements reference caspr/utils/evaluations.py:1-514 with the CUDA
metric kernels replaced by caspr_tpu.ops (Chamfer, approx-EMD) and the
Open3D RANSAC registration replaced by caspr_tpu.utils.ransac (native C++
module with a numpy fallback).  Artifact surface is identical: running
logs, final mean/median/std x1000 summaries, .npz dumps, per-sequence CSVs.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import approx_match_emd, chamfer_distance
from ..train.trackers import log


def _mesh_shard(mesh, x):
    """Shard a (B, T, N, ...) eval input over the mesh (batch over the dp
    axes, points over sp when present); identity without a mesh.  Params
    must already be replicated by the caller (test.py does)."""
    if mesh is None:
        return x
    from ..parallel.mesh import shard_batch_points

    return shard_batch_points(mesh, x)

# protocol for evaluations in the paper (evaluations.py:26-34)
PROTOCOL_NUM_STEPS = 10
PROTOCOL_NUM_PTS = 2048

ALL_OBSERVED_STEPS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
ALL_UNOBSERVED_STEPS = []
SPLIT_OBSERVED_STEPS = [0, 5, 9]
SPLIT_UNOBSERVED_STEPS = [1, 2, 3, 4, 6, 7, 8]


@jax.jit
def _recon_metrics(pred, gt):
    """Chamfer (two-way squared NN means summed) and EMD/N per frame
    (reference evaluations.py:36-49)."""
    d1, d2 = chamfer_distance(pred, gt)
    chamfer = jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1)
    emd = approx_match_emd(pred, gt) / pred.shape[1]
    return chamfer, emd


def eval_reconstr_frames(pred, gt):
    """pred, gt: (F, N, 3) -> (chamfer (F,), emd (F,)) as numpy."""
    chamfer, emd = _recon_metrics(jnp.asarray(pred), jnp.asarray(gt))
    return np.asarray(chamfer), np.asarray(emd)


def _check_protocol(t, n):
    if t != PROTOCOL_NUM_STEPS:
        raise ValueError(
            f"Test protocol requires {PROTOCOL_NUM_STEPS} steps, got {t}"
        )
    if n != PROTOCOL_NUM_PTS:
        raise ValueError(
            f"Test protocol requires {PROTOCOL_NUM_PTS} points, got {n}"
        )


def test_shape_recon(
    model,
    params,
    state,
    loader,
    log_out,
    observed_steps: Sequence[int],
    unobserved_steps: Sequence[int],
    key=None,
    mesh=None,
):
    """Shape reconstruction eval (reference evaluations.py:51-201).

    ``mesh``: optional jax.sharding.Mesh — batches shard over its dp
    axes and each cloud's points over sp (multi-chip eval, beyond the
    reference)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    use_unobserved = len(unobserved_steps) > 0
    log(log_out, "Observed steps [%s]" % ",".join(str(i) for i in observed_steps))
    log(log_out, "Unobserved steps [%s]" % ",".join(str(i) for i in unobserved_steps))

    observed_steps = list(observed_steps)
    unobserved_steps = list(unobserved_steps)
    nfe_stats = []
    model_ids, seq_ids = [], []
    observed_stats = {"chamfer": [], "emd": [], "infer_time": []}
    unobserved_stats = {"chamfer": [], "emd": []}
    num_seqs_total = 0

    @jax.jit
    def recon(params, state, observed_in, timestamps, k):
        _, _, pred, _, nfe = model.reconstruct(
            params,
            state,
            observed_in,
            k,
            num_points=PROTOCOL_NUM_PTS,
            timestamps=timestamps,
            constant_in_time=False,
        )
        return pred, nfe

    metrics_j = jax.jit(_recon_metrics)
    t_obs, t_unobs = len(observed_steps), len(unobserved_steps)

    def dispatch(batch):
        """Enqueue one batch's full device program (reconstruct + both
        metric legs) WITHOUT any host synchronization, so batch i+1's
        reconstruction executes while batch i's results transfer out."""
        nonlocal key, num_seqs_total
        pcl_in = jnp.asarray(batch["input"])
        nocs_out = jnp.asarray(batch["target"])
        b, t, n, _ = pcl_in.shape
        valid = batch.get("valid", b)
        model_ids.extend(batch["model_id"][:valid])
        seq_ids.extend(batch["seq_id"][:valid])
        num_seqs_total += valid
        _check_protocol(t, n)
        observed_in = _mesh_shard(mesh, pcl_in[:, observed_steps])
        timestamps = nocs_out[0, :, 0, 3]
        key, sub = jax.random.split(key)
        pred_pcl, nfe = recon(params, state, observed_in, timestamps, sub)
        obs_gt = nocs_out[:, observed_steps, :, :3].reshape(b * t_obs, n, 3)
        obs_pred = pred_pcl[:, observed_steps].reshape(b * t_obs, n, 3)
        out = {"nfe": nfe, "valid": valid,
               "obs": metrics_j(obs_pred, obs_gt)}
        if use_unobserved:
            un_gt = nocs_out[:, unobserved_steps, :, :3].reshape(
                b * t_unobs, n, 3)
            un_pred = pred_pcl[:, unobserved_steps].reshape(
                b * t_unobs, n, 3)
            out["unobs"] = metrics_j(un_pred, un_gt)
        return out

    def drain(pend, elapsed):
        """Fetch a dispatched batch's results to host and fold into the
        running stats (the only synchronization point)."""
        valid = pend["valid"]
        nfe = np.asarray(pend["nfe"])
        nfe_stats.append([float(nfe[0]), float(nfe[1])])
        chamfer, emd = (np.asarray(x) for x in pend["obs"])
        observed_stats["chamfer"].extend(chamfer[: valid * t_obs].tolist())
        observed_stats["emd"].extend(emd[: valid * t_obs].tolist())
        observed_stats["infer_time"].append(elapsed)

        print("==== OBSERVED ====")
        print("Shape Recon Mean Chamfer: %f" % (np.mean(observed_stats["chamfer"]) * 1000))
        print("Shape Recon Median Chamfer: %f" % (np.median(observed_stats["chamfer"]) * 1000))
        print("Shape Recon Mean EMD: %f" % (np.mean(observed_stats["emd"]) * 1000))
        print("Shape Recon Median EMD: %f" % (np.median(observed_stats["emd"]) * 1000))
        print("NFE Mean: (%f, %f)" % tuple(np.mean(nfe_stats, axis=0).tolist()))
        print("Infer time mean: %f" % np.mean(observed_stats["infer_time"]))

        if use_unobserved:
            chamfer, emd = (np.asarray(x) for x in pend["unobs"])
            unobserved_stats["chamfer"].extend(chamfer[: valid * t_unobs].tolist())
            unobserved_stats["emd"].extend(emd[: valid * t_unobs].tolist())
            print("==== UNOBSERVED ====")
            print("Shape Recon Mean Chamfer: %f" % (np.mean(unobserved_stats["chamfer"]) * 1000))
            print("Shape Recon Mean EMD: %f" % (np.mean(unobserved_stats["emd"]) * 1000))

    # Depth-1 software pipeline (CASPR_TPU_EVAL_PIPELINE=0 restores the
    # serialized loop for A/B): batch i's recon+metrics are enqueued on
    # the device before batch i-1's results are pulled to host, so the
    # accelerator never idles on the host transfer/stat bookkeeping.
    # The reported per-batch infer_time is drain-to-drain wall clock —
    # with overlap it amortizes to the device-limited rate.
    pipeline = os.environ.get("CASPR_TPU_EVAL_PIPELINE", "1") != "0"
    pending = None
    t_mark = time.time()
    for i, batch in enumerate(loader):
        print("Batch: %d / %d" % (i, len(loader)))
        cur = dispatch(batch)
        if not pipeline:
            drain(cur, time.time() - t_mark)
            t_mark = time.time()
            continue
        if pending is not None:
            drain(pending, time.time() - t_mark)
            t_mark = time.time()
        pending = cur
    if pending is not None:
        drain(pending, time.time() - t_mark)

    stats_list = [observed_stats, unobserved_stats] if use_unobserved else [observed_stats]
    stats_names = ["OBSERVED", "UNOBSERVED"] if use_unobserved else ["OBSERVED"]
    for stat_dict, name in zip(stats_list, stats_names):
        log(log_out, "================  %s SAMPLING RECONSTR EVAL =====================" % name)
        log(log_out, "mean CHAMFER error (x1000): %f +- %f, median: %f" % (
            np.mean(stat_dict["chamfer"]) * 1000.0,
            np.std(stat_dict["chamfer"]) * 1000.0,
            np.median(stat_dict["chamfer"]) * 1000.0,
        ))
        log(log_out, "mean EMD error (x1000): %f +- %f, median: %f" % (
            np.mean(stat_dict["emd"]) * 1000.0,
            np.std(stat_dict["emd"]) * 1000.0,
            np.median(stat_dict["emd"]) * 1000.0,
        ))
    log(log_out, "NFE Mean: (%f, %f)" % tuple(np.mean(nfe_stats, axis=0).tolist()))
    log(log_out, "mean Inference time: %f" % np.mean(observed_stats["infer_time"]))

    np.savez(
        log_out[: -len("txt")] + "npz",
        observed_chamfer=observed_stats["chamfer"],
        observed_emd=observed_stats["emd"],
        unobserved_chamfer=unobserved_stats["chamfer"],
        unobserved_emd=unobserved_stats["emd"],
    )

    per_seq_log = log_out[: -len("txt")] + "csv"
    print("Per seq performance being saved to %s..." % per_seq_log)
    stats_steps = [len(observed_steps), len(unobserved_steps)]
    with open(per_seq_log, "w", newline="") as csvfile:
        w = csv.writer(csvfile, delimiter=",", quotechar="|", quoting=csv.QUOTE_MINIMAL)
        w.writerow(["type", "model_id", "seq_id", "chamfer", "emd"])
        for stat_dict, name, steps_t in zip(stats_list, stats_names, stats_steps):
            per_seq_chamfer = np.array(stat_dict["chamfer"]).reshape(
                num_seqs_total, steps_t
            ).mean(axis=1)
            per_seq_emd = np.array(stat_dict["emd"]).reshape(
                num_seqs_total, steps_t
            ).mean(axis=1)
            for li in range(len(model_ids)):
                w.writerow([name, model_ids[li], seq_ids[li],
                            per_seq_chamfer[li], per_seq_emd[li]])


def test_tnocs_regression(model, params, state, loader, log_out, mesh=None):
    """T-NOCS regression eval (reference evaluations.py:203-295)."""

    @jax.jit
    def encode(params, x):
        return model.encode(params, x)

    model_ids, seq_ids = [], []
    stat_dict = {"space": [], "time": []}
    num_seqs_total = 0
    last_t = PROTOCOL_NUM_STEPS
    for i, batch in enumerate(loader):
        print("Batch: %d / %d" % (i, len(loader)))
        pcl_in = jnp.asarray(batch["input"])
        nocs_out = jnp.asarray(batch["target"])
        b, t, n, _ = pcl_in.shape
        valid = batch.get("valid", b)
        model_ids.extend(batch["model_id"][:valid])
        seq_ids.extend(batch["seq_id"][:valid])
        num_seqs_total += valid
        last_t = t
        _check_protocol(t, n)

        _, pred_tnocs = encode(params, _mesh_shard(mesh, pcl_in))
        diff = pred_tnocs[..., :3] - nocs_out[..., :3]
        dist = jnp.mean(jnp.linalg.norm(diff, axis=3), axis=2)  # (B, T)
        stat_dict["space"].extend(np.asarray(dist)[:valid].reshape(-1).tolist())
        if pred_tnocs.shape[-1] > 3:
            tdiff = jnp.mean(
                jnp.abs(pred_tnocs[..., 3] - nocs_out[..., 3]), axis=2
            )
            stat_dict["time"].extend(np.asarray(tdiff)[:valid].reshape(-1).tolist())

        print("==== CURRENT ERROR ====")
        print("mean SPATIAL error (l2 distance) %f" % np.mean(stat_dict["space"]))
        print("mean TIME error (absolute diff): : %f" % np.mean(stat_dict["time"]))

    log(log_out, "================  TNOCS REGRESSION EVAL =====================")
    log(log_out, "mean SPATIAL error (l2 distance): %f +- %f, median: %f" % (
        np.mean(stat_dict["space"]), np.std(stat_dict["space"]),
        np.median(stat_dict["space"])
    ))
    log(log_out, "mean TIME error (absolute diff): %f +- %f, median: %f" % (
        np.mean(stat_dict["time"]), np.std(stat_dict["time"]),
        np.median(stat_dict["time"])
    ))
    np.savez(
        log_out[: -len("txt")] + "npz",
        space=stat_dict["space"],
        time=stat_dict["time"],
    )
    per_seq_log = log_out[: -len("txt")] + "csv"
    print("Per seq performance being saved to %s..." % per_seq_log)
    with open(per_seq_log, "w", newline="") as csvfile:
        w = csv.writer(csvfile, delimiter=",", quotechar="|", quoting=csv.QUOTE_MINIMAL)
        w.writerow(["model_id", "seq_id", "space", "time"])
        per_seq_space = np.array(stat_dict["space"]).reshape(
            num_seqs_total, last_t
        ).mean(axis=1)
        per_seq_time = np.array(stat_dict["time"]).reshape(
            num_seqs_total, last_t
        ).mean(axis=1)
        for li in range(len(model_ids)):
            w.writerow([model_ids[li], seq_ids[li], per_seq_space[li], per_seq_time[li]])
    return np.mean(stat_dict["space"]), np.mean(stat_dict["time"])


def _camera_frustum_points(transform, scale=0.1, color=(0.0, 1.0, 0.0)):
    """Point-sampled camera frustum + trajectory marker for a 4x4 camera
    pose (headless analogue of pcl_viewer.py:193-206)."""
    apex = np.zeros(3)
    corners = (
        np.array(
            [[-1, -0.75, 1.5], [1, -0.75, 1.5], [1, 0.75, 1.5], [-1, 0.75, 1.5]]
        )
        * scale
    )
    t = np.linspace(0, 1, 8)[:, None]
    segs = [apex * (1 - t) + c * t for c in corners]
    for a, b in zip(corners, np.roll(corners, 1, axis=0)):
        segs.append(a * (1 - t) + b * t)
    pts = np.concatenate(segs, axis=0)
    r, tr = transform[:3, :3], transform[:3, 3]
    world = pts @ r.T + tr
    return world, np.tile(np.asarray(color)[None], (world.shape[0], 1))


def _export_pose_scene(out_dir, name, pred_nocs, pred_nocs_rgb, pred_depth,
                       gt_depth, gt_nocs, gt_cams, pred_cams):
    """Headless stand-in for the reference's interactive pose visualization
    (evaluations.py:435-458): predicted NOCS in T-NOCS RGB, GT NOCS
    transformed by the predicted pose (blue), GT input/NOCS (green), plus
    green GT and red predicted camera frusta."""
    from ..viz.export import export_pcl_seq

    t = len(pred_nocs)
    blue = [np.tile([[0.0, 0.0, 1.0]], (p.shape[0], 1)) for p in pred_depth]
    green = [np.tile([[0.0, 1.0, 0.0]], (p.shape[0], 1)) for p in gt_depth]
    cam_tracks = []
    cam_rgbs = []
    for cams, color in ((gt_cams, (0.0, 1.0, 0.0)), (pred_cams, (1.0, 0.0, 0.0))):
        frames = [_camera_frustum_points(c, color=color) for c in cams]
        cam_tracks.append([f[0] for f in frames])
        cam_rgbs.append([f[1] for f in frames])
    return export_pcl_seq(
        out_dir,
        name,
        [pred_nocs, pred_depth, gt_depth, gt_nocs] + cam_tracks,
        [pred_nocs_rgb, blue, green, green] + cam_rgbs,
        fps=t,
    )


def test_observed_camera_pose_ransac(model, params, state, loader, log_out,
                                     show: bool = False, mesh=None):
    """Pose estimation from T-NOCS via correspondence RANSAC
    (reference evaluations.py:297-514).  Uses the native C++ RANSAC module
    (numpy fallback) with o3d-equivalent criteria: threshold 0.015,
    ransac_n=4, 50000 iterations / 5000 validations.  ``show`` exports the
    per-sequence pose scenes next to the log (headless)."""
    from .ransac import ransac_rigid_registration

    loader.dataset.set_return_pose_data(True)

    @jax.jit
    def encode(params, x):
        return model.encode(params, x)

    model_ids, seq_ids = [], []
    stat_dict = {
        "trans_RANSAC": [],
        "rot_RANSAC": [],
        "point_RANSAC": [],
        "point_mean_RANSAC": [],
    }
    num_seqs_total = 0
    num_steps = PROTOCOL_NUM_STEPS

    for i, batch in enumerate(loader):
        print("Batch: %d / %d" % (i, len(loader)))
        pcl_in = jnp.asarray(batch["input"])
        nocs_out = np.asarray(batch["target"])
        pose_data = np.asarray(batch["pose"])
        b, num_steps, n, _ = pcl_in.shape
        valid = batch.get("valid", b)
        model_ids.extend(batch["model_id"][:valid])
        seq_ids.extend(batch["seq_id"][:valid])
        num_seqs_total += valid
        _check_protocol(num_steps, n)

        _, pred_tnocs = encode(params, _mesh_shard(mesh, pcl_in))
        pred_tnocs = np.asarray(pred_tnocs)
        pcl_in = np.asarray(pcl_in)

        for bi in range(valid):
            norm_pred = pred_tnocs[bi, :, :, :3] - 0.5
            norm_gt = nocs_out[bi, :, :, :3] - 0.5
            inputs = pcl_in[bi, :, :, :3]
            scene = {"pred_depth": [], "gt_depth": [], "gt_cams": [],
                     "pred_cams": []}
            for si in range(num_steps):
                trans = ransac_rigid_registration(
                    norm_pred[si],
                    inputs[si],
                    max_corr_dist=0.015,
                    ransac_n=4,
                    max_iteration=50000,
                    max_validation=5000,
                    seed=i * 1000 + bi * num_steps + si,
                )
                r_pred = trans[:3, :3]
                t_pred = trans[:3, 3]

                r_gt = pose_data[bi, si, :3, :3]
                t_gt = pose_data[bi, si, :3, 3]
                # point errors computed from GT NOCS so NOCS-regression
                # error doesn't compound (evaluations.py:391-394)
                pred_depth = norm_gt[si] @ r_pred.T + t_pred
                diff = pred_depth - inputs[si]
                dists = np.linalg.norm(diff, axis=1)
                stat_dict["point_RANSAC"].append(float(np.median(dists)))
                stat_dict["point_mean_RANSAC"].append(float(np.mean(dists)))

                trans_err = np.linalg.norm(t_pred - t_gt)
                rot_diff = (np.trace(r_pred.T @ r_gt) - 1.0) / 2.0
                rot_err = np.degrees(np.arccos(np.clip(rot_diff, -1.0, 1.0)))
                stat_dict["trans_RANSAC"].append(float(trans_err))
                stat_dict["rot_RANSAC"].append(float(rot_err))

                if show:
                    scene["pred_depth"].append(pred_depth)
                    scene["gt_depth"].append(norm_gt[si] @ r_gt.T + t_gt)
                    for key_, r_, t_ in (
                        ("gt_cams", r_gt, t_gt),
                        ("pred_cams", r_pred, t_pred),
                    ):
                        cam = np.eye(4)
                        cam[:3, :3] = r_.T
                        cam[:3, 3] = r_.T @ -t_
                        scene[key_].append(cam)

            if show:
                out = _export_pose_scene(
                    os.path.dirname(log_out),
                    f"pose_{batch['model_id'][bi]}_{batch['seq_id'][bi]}",
                    [norm_pred[si] for si in range(num_steps)],
                    [pred_tnocs[bi, si, :, :3] for si in range(num_steps)],
                    scene["pred_depth"],
                    scene["gt_depth"],
                    [norm_gt[si] for si in range(num_steps)],
                    scene["gt_cams"],
                    scene["pred_cams"],
                )
                print("Exported pose viz to %s" % out)

        print("==== CURRENT ERROR ====")
        print("mean Pos error RANSAC (l2 distance) %f" % np.mean(stat_dict["trans_RANSAC"]))
        print("mean Rot error RANSAC (degrees): %f" % np.mean(stat_dict["rot_RANSAC"]))
        print("mean-median Point error RANSAC (L2 distance): %f" % np.mean(stat_dict["point_RANSAC"]))
        print("mean-mean Point error RANSAC (L2 distance): %f" % np.mean(stat_dict["point_mean_RANSAC"]))

    for label, key_ in [
        ("POS error RANSAC (l2 distance)", "trans_RANSAC"),
        ("ROT error RANSAC (degrees)", "rot_RANSAC"),
        ("POINT(median) error RANSAC (l2 distance)", "point_RANSAC"),
        ("POINT(mean) error RANSAC (l2 distance)", "point_mean_RANSAC"),
    ]:
        vals = stat_dict[key_]
        log(log_out, "mean %s: %f +- %f, median: %f" % (
            label, np.mean(vals), np.std(vals), np.median(vals)
        ))

    np.savez(
        log_out[: -len(".txt")] + "_RANSAC.npz",
        trans=stat_dict["trans_RANSAC"],
        rot=stat_dict["rot_RANSAC"],
        point=stat_dict["point_RANSAC"],
        point_mean=stat_dict["point_mean_RANSAC"],
    )
    per_seq_log = log_out[: -len(".txt")] + "_RANSAC.csv"
    print("Per seq performance of RANSAC being saved to %s..." % per_seq_log)
    with open(per_seq_log, "w", newline="") as csvfile:
        w = csv.writer(csvfile, delimiter=",", quotechar="|", quoting=csv.QUOTE_MINIMAL)
        w.writerow(["model_id", "seq_id", "pos", "rot", "point"])
        per_seq_pos = np.array(stat_dict["trans_RANSAC"]).reshape(
            num_seqs_total, num_steps
        ).mean(axis=1)
        per_seq_rot = np.array(stat_dict["rot_RANSAC"]).reshape(
            num_seqs_total, num_steps
        ).mean(axis=1)
        per_seq_point = np.array(stat_dict["point_RANSAC"]).reshape(
            num_seqs_total, num_steps
        ).mean(axis=1)
        for li in range(len(model_ids)):
            w.writerow([model_ids[li], seq_ids[li], per_seq_pos[li],
                        per_seq_rot[li], per_seq_point[li]])
