"""CLI option groups — the same flag surface as the reference
(caspr/utils/config_utils.py:5-143), so every documented train/test/viz
recipe runs unchanged against the TPU build."""

from __future__ import annotations

import argparse


def get_general_options(parser: argparse.ArgumentParser):
    parser.add_argument("--num-workers", type=int, default=2, help="for data loaders")
    parser.add_argument("--out", type=str, default="./train_out",
                        help="Directory to save model weights and logs to.")
    parser.add_argument("--data-cfg", type=str, required=True,
                        help=".cfg for the dataset to use")
    parser.add_argument("--batch-size", type=int, default=5)
    parser.add_argument("--seq-len", type=int, default=5,
                        help="Number of time steps to sample in each sequence.")
    parser.add_argument("--num-pts", type=int, default=1024,
                        help="Points to sample per step.")
    parser.add_argument("--no-augment-quad", dest="augment_quad",
                        action="store_false")
    parser.set_defaults(augment_quad=True)
    parser.add_argument("--no-augment-pairs", dest="augment_pairs",
                        action="store_false")
    parser.set_defaults(augment_pairs=True)
    parser.add_argument("--pretrain-tnocs", dest="pretrain_tnocs",
                        action="store_true")
    parser.set_defaults(pretrain_tnocs=False)
    parser.add_argument("--weights", type=str, default="",
                        help="Path to model weights (.pkl checkpoint or "
                             "reference .pth to convert on the fly).")
    parser.add_argument("--radii", type=float, nargs="+",
                        default=[0.02, 0.05, 0.1, 0.2, 0.4, 0.8])
    parser.add_argument("--local-feat-size", type=int, default=512)
    parser.add_argument("--cnf-blocks", type=int, default=1)
    parser.add_argument("--latent-feat-size", type=int, default=1600)
    parser.add_argument("--ode-hidden-size", type=int, default=512)
    parser.add_argument("--motion-feat-size", type=int, default=64)
    parser.add_argument("--no-regress-tnocs", dest="regress_tnocs",
                        action="store_false")
    parser.set_defaults(regress_tnocs=True)
    parser.add_argument("--cnf-loss", type=float, default=0.01,
                        help="Weight for NLL loss")
    parser.add_argument("--tnocs-loss", type=float, default=100.0,
                        help="Weight for TNOCS regression loss")
    parser.add_argument("--matmul-precision", type=str, default="default",
                        choices=["default", "high", "highest"],
                        help="TPU matmul precision: 'highest' forces full "
                             "f32 for closest parity with the reference's "
                             "CUDA fp32 numerics; 'default' uses the fast "
                             "bf16-based passes (new flag).")
    return parser


def get_train_options(parser: argparse.ArgumentParser):
    parser.add_argument("--parallel", dest="use_parallel", action="store_true",
                        help="Shard the batch across all local devices "
                             "(pjit data parallelism over the ICI mesh).")
    parser.set_defaults(use_parallel=False)
    parser.add_argument("--sp-size", type=int, default=1,
                        help="Sequence/point-parallel mesh axis: shard each "
                             "cloud's POINT axis over this many devices "
                             "(inner mesh axis, with --parallel). Lets small "
                             "batches scale past the device count.")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--val-every", type=int, default=3)
    parser.add_argument("--save-every", type=int, default=10)
    parser.add_argument("--print-every", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--beta1", type=float, default=0.9)
    parser.add_argument("--beta2", type=float, default=0.999)
    parser.add_argument("--eps", type=float, default=1e-8)
    parser.add_argument("--decay", type=float, default=0.0)
    parser.add_argument("--seed", type=int, default=0,
                        help="Global PRNG seed (new: JAX uses explicit keys).")
    parser.add_argument("--multihost", dest="multihost", action="store_true",
                        help="Multi-process (pod) training: calls "
                             "jax.distributed.initialize() (coordinator "
                             "from the standard env vars), shards the data "
                             "loader per process, and builds global batches "
                             "across hosts. Use with --parallel.")
    parser.set_defaults(multihost=False)
    parser.add_argument("--grad-accum", type=int, default=1,
                        help="Gradient-accumulation microbatches per "
                             "optimizer step (batch must divide evenly). "
                             "Cuts peak activation memory ~N-fold for the "
                             "same effective batch.")
    parser.add_argument("--ode-backward", type=str, default="adjoint",
                        choices=["adjoint", "discrete"],
                        help="Training gradients through the ODE solves: "
                             "'adjoint' = continuous adjoint (reference "
                             "parity, O(1) memory); 'discrete' = backprop "
                             "through the solver (checkpointed scan, exact "
                             "discrete gradients).")
    return parser


def get_test_options(parser: argparse.ArgumentParser):
    parser.add_argument("--log", type=str, default="test_log.txt")
    parser.add_argument("--parallel", dest="use_parallel", action="store_true",
                        help="Shard eval batches across all local devices.")
    parser.set_defaults(use_parallel=False)
    parser.add_argument("--sp-size", type=int, default=1,
                        help="Sequence/point-parallel mesh axis for eval: "
                             "shard each cloud's POINT axis over this many "
                             "devices (inner axis, with --parallel).")
    parser.add_argument("--shuffle-test", dest="shuffle_test", action="store_true")
    parser.set_defaults(shuffle_test=False)
    parser.add_argument("--eval-test", dest="eval_full_test", action="store_true")
    parser.set_defaults(eval_full_test=False)
    parser.add_argument("--eval-shape-recon-observed",
                        dest="eval_shape_recon_observed", action="store_true")
    parser.set_defaults(eval_shape_recon_observed=False)
    parser.add_argument("--eval-shape-recon-unobserved",
                        dest="eval_shape_recon_unobserved", action="store_true")
    parser.set_defaults(eval_shape_recon_unobserved=False)
    parser.add_argument("--eval-tnocs-regression", dest="eval_tnocs_regression",
                        action="store_true")
    parser.set_defaults(eval_tnocs_regression=False)
    parser.add_argument("--eval-pose-observed-ransac",
                        dest="eval_pose_observed_ransac", action="store_true")
    parser.set_defaults(eval_pose_observed_ransac=False)
    parser.add_argument("--show-pose-viz", dest="show_pose_viz",
                        action="store_true")
    parser.set_defaults(show_pose_viz=False)
    parser.add_argument("--seed", type=int, default=0)
    return parser


def get_viz_options(parser: argparse.ArgumentParser):
    parser.add_argument("--shuffle-test", dest="shuffle_test", action="store_true")
    parser.set_defaults(shuffle_test=False)
    parser.add_argument("--viz-tnocs", dest="viz_tnocs", action="store_true")
    parser.set_defaults(viz_tnocs=False)
    parser.add_argument("--viz-observed", dest="viz_observed", action="store_true")
    parser.set_defaults(viz_observed=False)
    parser.add_argument("--viz-interpolated", dest="viz_interpolated",
                        action="store_true")
    parser.set_defaults(viz_interpolated=False)
    parser.add_argument("--no-input-seq", dest="show_input_seq",
                        action="store_false")
    parser.set_defaults(show_input_seq=True)
    parser.add_argument("--no-nocs-cubes", dest="show_nocs_cubes",
                        action="store_false")
    parser.set_defaults(show_nocs_cubes=True)
    parser.add_argument("--tnocs-err-map", dest="tnocs_error_map",
                        action="store_true")
    parser.set_defaults(tnocs_error_map=False)
    parser.add_argument("--num-sampled-pts", type=int, default=2048)
    parser.add_argument("--num-sampled-steps", type=int, default=30)
    parser.add_argument("--no-constant", dest="constant_in_time",
                        action="store_false")
    parser.set_defaults(constant_in_time=True)
    parser.add_argument("--no-base-samples", dest="show_base_sampling",
                        action="store_false")
    parser.set_defaults(show_base_sampling=True)
    parser.add_argument("--sample-contours", dest="sample_contours",
                        action="store_true")
    parser.set_defaults(sample_contours=False)
    parser.add_argument("--base-color-map", dest="base_color_map",
                        action="store_true")
    parser.set_defaults(base_color_map=False)
    parser.add_argument("--prob-color-map", dest="prob_color_map",
                        action="store_true")
    parser.set_defaults(prob_color_map=False)
    parser.add_argument("--seed", type=int, default=0)
    return parser


def apply_runtime_flags(flags):
    """Apply global runtime knobs picked via CLI."""
    import os

    import jax

    if getattr(flags, "matmul_precision", "default") != "default":
        jax.config.update("jax_default_matmul_precision", flags.matmul_precision)
    if hasattr(flags, "ode_backward"):
        # the solver dispatch reads this at trace time (ops/odeint.py);
        # set unconditionally so an explicit --ode-backward adjoint also
        # overrides an inherited CASPR_TPU_ODE_BWD env
        os.environ["CASPR_TPU_ODE_BWD"] = flags.ode_backward


def caspr_config_from_flags(flags):
    """Build a CaSPRConfig from parsed CLI flags."""
    from ..models import CaSPRConfig

    return CaSPRConfig(
        radii_list=tuple(flags.radii),
        local_feat_size=flags.local_feat_size,
        latent_feat_size=flags.latent_feat_size,
        ode_hidden_size=flags.ode_hidden_size,
        motion_feat_size=flags.motion_feat_size,
        pretrain_tnocs=flags.pretrain_tnocs,
        augment_quad=flags.augment_quad,
        augment_pairs=flags.augment_pairs,
        cnf_blocks=flags.cnf_blocks,
        regress_tnocs=flags.regress_tnocs,
    )
