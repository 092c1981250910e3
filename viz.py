"""Visualize CaSPR results (headless export).

Same CLI and scene composition as the reference viz script (reference
caspr/viz.py + caspr/utils/viz_utils.py:43-216), but instead of the
interactive Qt/OpenGL viewer it exports each scene as per-frame PLY files
and an animation under --out (the TPU hosts are headless).

    python viz.py --data-cfg data/configs/demo.cfg --weights ckpt.pkl \
        --seq-len 10 --num-pts 2048 --viz-observed ...
"""

import argparse
import os
import sys

import jax

try:
    from caspr_tpu.utils.runtime import enable_compile_cache
except ImportError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from caspr_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from caspr_tpu.data import DynamicPCLDataset, SequenceLoader
from caspr_tpu.models import CaSPRModel, caspr_init
from caspr_tpu.train import load_checkpoint, load_weights, load_encoder_weights_from_full, log
from caspr_tpu.utils.config import (
    apply_runtime_flags,
    caspr_config_from_flags,
    get_general_options,
    get_viz_options,
)
from caspr_tpu.utils.evaluations import eval_reconstr_frames
from caspr_tpu.viz import (
    BASE_OFFSET,
    PRED_OFFSET,
    SAMPLE_CONTOURS_RADII,
    export_pcl_seq,
    get_error_colors,
    get_logprob_colors,
    get_sphere_samp_colors,
    np_to_list,
    shift_pcl_list,
)
from caspr_tpu.viz.export import nocs_cube_points


def _with_cubes(flags, seqs, rgbs, num_frames):
    """Append GT + prediction NOCS wire-cube tracks (pcl_viewer.py:174-180
    equivalent) unless --no-nocs-cubes."""
    if not flags.show_nocs_cubes:
        return seqs, rgbs
    gt_cube = nocs_cube_points()
    pred_cube = nocs_cube_points(PRED_OFFSET)
    cube_pts = np.concatenate([gt_cube, pred_cube], axis=0)
    cube_rgb = np.full_like(cube_pts, 0.35)
    seqs = seqs + [[cube_pts] * num_frames]
    rgbs = rgbs + [[cube_rgb] * num_frames]
    return seqs, rgbs


def parse_args(argv):
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser = get_general_options(parser)
    parser = get_viz_options(parser)
    flags, _ = parser.parse_known_args(argv)
    return flags


def viz(flags):
    os.makedirs(flags.out, exist_ok=True)
    log_out = os.path.join(flags.out, "viz_log.txt")
    log(log_out, flags)

    apply_runtime_flags(flags)
    cfg = caspr_config_from_flags(flags)
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(flags.seed)
    key, init_key = jax.random.split(key)
    params, mbn_state = caspr_init(init_key, cfg)
    if flags.weights != "":
        ckpt = load_checkpoint(flags.weights)
        if flags.pretrain_tnocs:
            params = load_encoder_weights_from_full(params, ckpt["params"])
        else:
            params = load_weights(params, ckpt["params"])
            if ckpt.get("state"):
                mbn_state = jax.tree_util.tree_map(
                    lambda a, b: jnp.asarray(b, a.dtype), mbn_state, ckpt["state"]
                )

    test_dataset = DynamicPCLDataset(
        flags.data_cfg,
        split="test",
        num_pts=flags.num_pts,
        seq_len=flags.seq_len,
        shift_time_to_zero=(not flags.pretrain_tnocs),
        random_point_sample=False,
    )
    # viz batch size is forced to 1 (reference viz.py:66-67)
    loader = SequenceLoader(test_dataset, batch_size=1, shuffle=flags.shuffle_test,
                            seed=flags.seed, num_workers=flags.num_workers)

    contours = SAMPLE_CONTOURS_RADII if flags.sample_contours else None

    for i, batch in enumerate(loader):
        print("Batch: %d / %d" % (i, len(loader)))
        pcl_in = jnp.asarray(batch["input"])
        nocs_out = np.asarray(batch["target"])
        model_id, seq_id = batch["model_id"][0], batch["seq_id"][0]
        print("Model %s" % model_id)
        print("Seq %s" % seq_id)
        b, t, n, _ = pcl_in.shape

        key, sub = jax.random.split(key)
        samp = logprob = pred = None
        if flags.viz_tnocs and not (flags.viz_observed or flags.viz_interpolated):
            _, pred_tnocs = model.encode(params, pcl_in)
        else:
            samp, logprob, pred, pred_tnocs, _ = model.reconstruct(
                params,
                mbn_state,
                pcl_in,
                sub,
                num_points=flags.num_sampled_pts,
                constant_in_time=flags.constant_in_time,
                max_timestamp=test_dataset.max_timestamp,
                sample_contours=contours,
            )
        pred_tnocs_np = np.asarray(pred_tnocs)

        if flags.viz_tnocs:
            nocs_err = float(
                np.mean(
                    np.linalg.norm(
                        pred_tnocs_np[..., :3] - nocs_out[..., :3], axis=3
                    )
                )
            )
            print("Cur L2 nocs spatial error: %f" % nocs_err)
        if flags.viz_observed or flags.viz_interpolated:
            qn = min(flags.num_sampled_pts, n)
            gt = nocs_out[:, :, :qn, :3].reshape(b * t, qn, 3)
            rec = np.asarray(pred)[:, :, :qn, :].reshape(b * t, qn, 3)
            chamfer, emd = eval_reconstr_frames(rec, gt)
            print("Cur Mean Chamfer: %f" % (np.mean(chamfer) * 1000))
            print("Cur Mean EMD: %f" % (np.mean(emd) * 1000))

        pcl_in_np = np.asarray(pcl_in)
        viz_gt_nocs = np_to_list(nocs_out)
        viz_pcl_in = np_to_list(pcl_in_np)
        gt_rgb = [p.copy() for p in viz_gt_nocs]

        base_seq = [viz_gt_nocs]
        base_rgb = [gt_rgb]
        if flags.show_input_seq:
            base_seq.append(viz_pcl_in)
            base_rgb.append(gt_rgb)

        scene_prefix = f"{model_id}_{seq_id}"
        if flags.viz_tnocs:
            viz_pred = np_to_list(pred_tnocs_np)
            if flags.tnocs_error_map:
                pred_rgb = [
                    get_error_colors(viz_pred[k], viz_gt_nocs[k])
                    for k in range(t)
                ]
            else:
                pred_rgb = [p.copy() for p in viz_pred]
            viz_pred = shift_pcl_list(viz_pred, PRED_OFFSET)
            seqs_c, rgbs_c = _with_cubes(
                flags, base_seq + [viz_pred], base_rgb + [pred_rgb], t
            )
            out = export_pcl_seq(
                flags.out, scene_prefix + "_tnocs", seqs_c, rgbs_c, fps=t
            )
            print("Exported TNOCS viz to %s" % out)

        if flags.viz_observed:
            out = _export_reconstruction(
                flags, samp, logprob, pred, base_seq, base_rgb,
                flags.out, scene_prefix + "_observed", t
            )
            print("Exported observed reconstruction viz to %s" % out)

        if flags.viz_interpolated:
            timestamps = jnp.linspace(0.0, 1.0, flags.num_sampled_steps)
            key, sub = jax.random.split(key)
            samp, logprob, pred, _, _ = model.reconstruct(
                params,
                mbn_state,
                pcl_in,
                sub,
                timestamps=timestamps,
                num_points=flags.num_sampled_pts,
                constant_in_time=flags.constant_in_time,
                sample_contours=contours,
            )
            # repeat observations to pace with interpolated steps
            # (viz_utils.py:150-174)
            reps = max(1, flags.num_sampled_steps // t)
            sub_gt, sub_in = [], []
            for ti in range(t):
                sub_gt.extend([nocs_out[0, ti, :, :3]] * reps)
                sub_in.extend([pcl_in_np[0, ti, :, :3]] * reps)
            while len(sub_gt) < flags.num_sampled_steps:
                sub_gt.append(nocs_out[0, t - 1, :, :3])
                sub_in.append(pcl_in_np[0, t - 1, :, :3])
            gt_rgb_i = [p.copy() for p in sub_gt]
            base_seq_i = [sub_gt] + ([sub_in] if flags.show_input_seq else [])
            base_rgb_i = [gt_rgb_i] * len(base_seq_i)
            out = _export_reconstruction(
                flags, samp, logprob, pred, base_seq_i, base_rgb_i,
                flags.out, scene_prefix + "_interpolated",
                flags.num_sampled_steps
            )
            print("Exported interpolated reconstruction viz to %s" % out)


def _export_reconstruction(flags, samp, logprob, pred, base_seq, base_rgb,
                           out_dir, name, fps):
    """Compose the reconstruction scene (viz_utils.py:179-216)."""
    samp_np = np.asarray(samp)
    logprob_np = np.asarray(logprob)
    pred_np = np.asarray(pred)

    viz_pred = np_to_list(pred_np)
    pred_rgb = [p.copy() for p in viz_pred]
    viz_samp = np_to_list(samp_np)
    samp_rgb = pred_rgb

    if flags.sample_contours:
        pred_rgb = samp_rgb = get_sphere_samp_colors(-logprob_np[0])
    elif flags.base_color_map:
        g = samp_np[0] / 4.5 + 0.5
        pred_rgb = samp_rgb = [g[i] for i in range(g.shape[0])]
    elif flags.prob_color_map:
        pred_rgb = samp_rgb = get_logprob_colors(-logprob_np[0])

    viz_pred = shift_pcl_list(viz_pred, PRED_OFFSET)
    viz_samp = [(v / 15.0) + np.array([BASE_OFFSET]) for v in viz_samp]

    seqs = base_seq + [viz_pred]
    rgbs = base_rgb + [pred_rgb]
    if flags.show_base_sampling:
        seqs.append(viz_samp)
        rgbs.append(samp_rgb)
    seqs, rgbs = _with_cubes(flags, seqs, rgbs, fps if fps > 1 else 1)
    return export_pcl_seq(out_dir, name, seqs, rgbs, fps=fps)


def main(flags):
    viz(flags)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))
