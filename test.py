"""Evaluate the TPU-native CaSPR model.

Same CLI surface and evaluation suite as the reference test script
(reference caspr/test.py:1-178): full-test metrics, observed/unobserved
shape reconstruction (Chamfer + EMD), T-NOCS regression, and RANSAC pose
estimation — all metric kernels on-device, RANSAC on the host in C++.

    python test.py --data-cfg data/configs/demo.cfg --weights ckpt.pkl \
        --seq-len 10 --num-pts 2048 --eval-tnocs-regression ...
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

from caspr_tpu.data import DynamicPCLDataset, SequenceLoader
from caspr_tpu.models import CaSPRModel, caspr_init
from caspr_tpu.train import (
    TestStatTracker,
    load_checkpoint,
    load_encoder_weights_from_full,
    load_weights,
    log,
    print_stats,
)
from caspr_tpu.train.loop import make_eval_step, run_one_epoch
import caspr_tpu.utils.evaluations as eval_utils
from caspr_tpu.utils.evaluations import (
    test_observed_camera_pose_ransac,
    test_shape_recon,
    test_tnocs_regression,
)
from caspr_tpu.utils.config import (
    apply_runtime_flags,
    caspr_config_from_flags,
    get_general_options,
    get_test_options,
)


def parse_args(argv):
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser = get_general_options(parser)
    parser = get_test_options(parser)
    flags, _ = parser.parse_known_args(argv)
    return flags


def test(flags):
    os.makedirs(flags.out, exist_ok=True)
    log_out = os.path.join(flags.out, flags.log)
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
            log(log_out, f"Loading pre-trained canonicalizer from {flags.weights}")
            params = load_encoder_weights_from_full(params, ckpt["params"])
        else:
            log(log_out, f"Loading model weights from {flags.weights}")
            params = load_weights(params, ckpt["params"])
            if ckpt.get("state"):
                mbn_state = jax.tree_util.tree_map(
                    lambda a, b: jax.numpy.asarray(b, a.dtype),
                    mbn_state,
                    ckpt["state"],
                )

    mesh = None
    if getattr(flags, "use_parallel", False):
        from caspr_tpu.parallel import make_mesh, replicate

        mesh = make_mesh(sp_size=getattr(flags, "sp_size", 1))
        log(
            log_out,
            f"Eval mesh over {mesh.devices.size} devices, axes "
            f"{mesh.axis_names} {tuple(mesh.devices.shape)}",
        )
        params = replicate(mesh, params)
        mbn_state = replicate(mesh, mbn_state)
        dp_size = mesh.devices.size // max(getattr(flags, "sp_size", 1), 1)
        if flags.batch_size % dp_size != 0:
            log(
                log_out,
                f"WARNING: batch size {flags.batch_size} not divisible by "
                f"dp size {dp_size}; sharded eval will fail — adjust "
                f"--batch-size or --sp-size",
            )

    test_dataset = DynamicPCLDataset(
        flags.data_cfg,
        split="test",
        train_frac=0.8,
        val_frac=0.1,
        num_pts=flags.num_pts,
        seq_len=flags.seq_len,
        shift_time_to_zero=(not flags.pretrain_tnocs),
        random_point_sample=False,
    )
    test_loader = SequenceLoader(
        test_dataset,
        batch_size=flags.batch_size,
        shuffle=flags.shuffle_test,
        seed=flags.seed,
        num_workers=flags.num_workers,
        # static batch shapes: a short final batch is padded (masked out of
        # all stats) instead of triggering a second multi-minute XLA
        # compile like the reference's dynamic batch would (test.py:112-115)
        pad_last=True,
    )

    if flags.eval_full_test:
        tracker = TestStatTracker()
        eval_step = make_eval_step(model, flags.cnf_loss, flags.tnocs_loss)
        run_one_epoch(
            eval_step,
            params,
            None,
            mbn_state,
            test_loader,
            key,
            0,
            tracker,
            log_out,
            mode="test",
            print_stats_every=1,
            mesh=mesh,
        )
        means = tracker.get_mean_stats()
        print_stats(
            log_out, 0, 0, 0, means[0], means[1], means[2], means[3],
            "TEST", means[4]
        )

    if flags.eval_shape_recon_observed:
        test_shape_recon(
            model,
            params,
            mbn_state,
            test_loader,
            log_out,
            eval_utils.ALL_OBSERVED_STEPS,
            eval_utils.ALL_UNOBSERVED_STEPS,
            key=key,
            mesh=mesh,
        )
    if flags.eval_shape_recon_unobserved:
        test_shape_recon(
            model,
            params,
            mbn_state,
            test_loader,
            log_out,
            eval_utils.SPLIT_OBSERVED_STEPS,
            eval_utils.SPLIT_UNOBSERVED_STEPS,
            key=key,
            mesh=mesh,
        )
    if flags.eval_tnocs_regression:
        test_tnocs_regression(
            model, params, mbn_state, test_loader, log_out, mesh=mesh
        )
    if flags.eval_pose_observed_ransac:
        test_observed_camera_pose_ransac(
            model, params, mbn_state, test_loader, log_out,
            show=flags.show_pose_viz, mesh=mesh,
        )


def main(flags):
    test(flags)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))
