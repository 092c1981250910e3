"""Train the TPU-native CaSPR model.

Same CLI surface and training semantics as the reference train script
(reference caspr/train.py:1-198): epoch loop, periodic validation with
best-checkpoint early-stop saving, periodic checkpointing, txt + PNG logs.

    python train.py --data-cfg data/configs/demo.cfg --out ./train_out ...
"""

import argparse
import math
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
import numpy as np

from caspr_tpu.data import DynamicPCLDataset, SequenceLoader
from caspr_tpu.models import CaSPRModel, caspr_init
from caspr_tpu.nn import count_params
from caspr_tpu.parallel import make_mesh, replicate
from caspr_tpu.train import (
    TestStatTracker,
    TrainLossTracker,
    load_checkpoint,
    load_encoder_weights_from_full,
    load_weights,
    log,
    print_stats,
    save_checkpoint,
)
from caspr_tpu.train.loop import (
    make_eval_step,
    make_optimizer,
    make_train_step,
    run_one_epoch,
)
from caspr_tpu.utils.config import (
    apply_runtime_flags,
    caspr_config_from_flags,
    get_general_options,
    get_train_options,
)


def parse_args(argv):
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser = get_general_options(parser)
    parser = get_train_options(parser)
    flags, _ = parser.parse_known_args(argv)
    return flags


def train(flags):
    multihost = getattr(flags, "multihost", False)
    if multihost:
        if not flags.use_parallel:
            # sharded loaders without the mesh would train N divergent
            # models with no gradient sync — refuse early
            raise ValueError("--multihost requires --parallel")
        # coordinator address/process id come from the standard TPU pod
        # env; must run before any backend/device use
        jax.distributed.initialize()
    os.makedirs(flags.out, exist_ok=True)
    # non-zero processes log to their own file and never write shared
    # artifacts (checkpoints/curves) — concurrent writers would corrupt
    # them on shared storage
    is_lead = (not multihost) or jax.process_index() == 0
    log_name = (
        "train_log.txt" if is_lead
        else f"rank{jax.process_index()}_train_log.txt"
    )
    log_out = os.path.join(flags.out, log_name)
    log(log_out, flags)
    if multihost:
        log(
            log_out,
            f"Multihost: process {jax.process_index()}/"
            f"{jax.process_count()}",
        )

    train_dataset = DynamicPCLDataset(
        flags.data_cfg,
        split="train",
        train_frac=0.8,
        val_frac=0.1,
        num_pts=flags.num_pts,
        seq_len=flags.seq_len,
        shift_time_to_zero=(not flags.pretrain_tnocs),
        random_point_sample=True,
    )
    val_dataset = DynamicPCLDataset(
        flags.data_cfg,
        split="val",
        train_frac=0.8,
        val_frac=0.1,
        num_pts=flags.num_pts,
        seq_len=flags.seq_len,
        shift_time_to_zero=(not flags.pretrain_tnocs),
        random_point_sample=False,
    )
    num_shards = (
        jax.process_count() if getattr(flags, "multihost", False) else 1
    )
    shard_index = (
        jax.process_index() if getattr(flags, "multihost", False) else 0
    )
    train_loader = SequenceLoader(
        train_dataset,
        batch_size=flags.batch_size,
        shuffle=True,
        drop_last=True,
        seed=flags.seed,
        num_workers=flags.num_workers,
        num_shards=num_shards,
        shard_index=shard_index,
    )
    val_loader = SequenceLoader(
        val_dataset,
        batch_size=flags.batch_size,
        shuffle=False,
        drop_last=True,
        seed=flags.seed,
        num_workers=flags.num_workers,
        num_shards=num_shards,
        shard_index=shard_index,
    )

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
            if "state" in ckpt and ckpt["state"]:
                mbn_state = jax.tree_util.tree_map(
                    lambda a, b: jax.numpy.asarray(b, a.dtype),
                    mbn_state,
                    ckpt["state"],
                )

    mesh = None
    if flags.use_parallel:
        mesh = make_mesh(sp_size=getattr(flags, "sp_size", 1))
        log(
            log_out,
            f"Parallel mesh over {mesh.devices.size} devices, axes "
            f"{mesh.axis_names} {tuple(mesh.devices.shape)}",
        )
        dp_size = mesh.devices.size // max(getattr(flags, "sp_size", 1), 1)
        if flags.batch_size % dp_size != 0:
            log(log_out, "WARNING: batch size not divisible by dp size")
        params = replicate(mesh, params)
        mbn_state = replicate(mesh, mbn_state)

    tx = make_optimizer(
        flags.lr, (flags.beta1, flags.beta2), flags.eps, flags.decay
    )
    opt_state = tx.init(params)
    # resume optimizer moments when available: restarting Adam with zero
    # moments kicks the model off its optimum (the reference never saves
    # optimizer state, train.py:186-190 — this is an improvement, not a
    # behavior change; fresh runs and reference .pth loads are unaffected)
    if flags.weights != "" and not flags.pretrain_tnocs:
        ckpt_opt = ckpt.get("opt_state")
        if ckpt_opt is not None:
            try:
                opt_state = jax.tree_util.tree_map(
                    lambda a, b: jax.numpy.asarray(b, a.dtype).reshape(a.shape),
                    opt_state,
                    ckpt_opt,
                )
                log(log_out, "Restored optimizer state from checkpoint")
            except Exception as exc:
                log(log_out, f"Optimizer state in checkpoint incompatible ({exc}); "
                             "starting Adam fresh")
    if mesh is not None:
        opt_state = replicate(mesh, opt_state)

    log(log_out, "Num model params: " + str(count_params(params)))

    train_step = make_train_step(
        model, tx, flags.cnf_loss, flags.tnocs_loss,
        accum_steps=getattr(flags, 'grad_accum', 1),
    )
    eval_step = make_eval_step(model, flags.cnf_loss, flags.tnocs_loss)
    loss_tracker = TrainLossTracker()

    for epoch in range(flags.epochs):
        train_loader.set_epoch(epoch)
        params, opt_state, mbn_state, key = run_one_epoch(
            train_step,
            params,
            opt_state,
            mbn_state,
            train_loader,
            key,
            epoch,
            loss_tracker,
            log_out,
            mode="train",
            print_stats_every=flags.print_every,
            mesh=mesh,
        )

        if epoch % flags.val_every == 0:
            val_tracker = TestStatTracker()
            _, _, _, key = run_one_epoch(
                eval_step,
                params,
                None,
                mbn_state,
                val_loader,
                key,
                epoch,
                val_tracker,
                log_out,
                mode="val",
                print_stats_every=flags.print_every,
                mesh=mesh,
            )
            total_loss, cnf_err, pos_err, time_err, nfe = (
                val_tracker.get_mean_stats()
            )
            if not math.isnan(total_loss):
                best = (
                    len(loss_tracker.val_losses) == 0
                    or total_loss < min(loss_tracker.val_losses)
                )
                loss_tracker.record_val_step(total_loss, epoch * len(train_loader))
                print_stats(
                    log_out, epoch, 0, 0, total_loss, cnf_err, pos_err,
                    time_err, "VAL", nfe
                )
                if best and is_lead:
                    log(log_out, "BEST Val loss so far! Saving checkpoint...")
                    save_checkpoint(
                        os.path.join(flags.out, "BEST_time_model.pkl"),
                        params,
                        mbn_state,
                        opt_state,
                        epoch,
                    )
            if is_lead:
                loss_tracker.plot_cur_loss_curves(flags.out)

        if epoch % flags.save_every == 0 and is_lead:
            save_checkpoint(
                os.path.join(flags.out, "time_model_%d.pkl" % epoch),
                params,
                mbn_state,
                opt_state,
                epoch,
            )


def main(flags):
    train(flags)


if __name__ == "__main__":
    main(parse_args(sys.argv[1:]))
