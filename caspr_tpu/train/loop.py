"""jit-compiled train/eval steps and the epoch runner.

Loss semantics replicate reference caspr/utils/train_utils.py:82-233:
  - CNF loss: weight * mean over (B,T) of the per-step NLL summed over
    points (train_utils.py:153-156)
  - TNOCS loss: weight * mean of the per-point L1 over all of B,T,N,4
    (train_utils.py:161-165)
Adam matches torch.optim.Adam including its additive weight decay
(gradient += wd * param before the moment updates).

The reference's DataParallel odd-batch skip (train_utils.py:116-118) has no
TPU analogue: GSPMD sharding requires the batch to divide the mesh, which
the loader guarantees with drop_last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..models import CaSPRModel
from ..ops.odeint import nfe_add, nfe_sum
from ..parallel.mesh import global_batch_points
from .trackers import TestStatTracker, log, print_stats


def _fetch(x):
    """Host-fetch an array that may span non-addressable devices
    (multihost): all-gather it across processes first.  Single-process
    this is a plain np.asarray."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def make_optimizer(lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0):
    """torch.optim.Adam equivalent (reference caspr/train.py:135-136)."""
    chain = []
    if weight_decay > 0.0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def compute_losses(out, cnf_loss_weight, tnocs_loss_weight):
    """Weighted scalar loss + components from the model's unreduced output."""
    zero = jnp.zeros((), jnp.float32)
    cnf_loss = zero
    tnocs_loss = zero
    if "nll" in out:
        per_step_nll = jnp.sum(out["nll"], axis=2)  # (B, T)
        cnf_loss = cnf_loss_weight * jnp.mean(per_step_nll)
    if "tnocs_loss" in out:
        tnocs_loss = tnocs_loss_weight * jnp.mean(out["tnocs_loss"][..., :4])
    return cnf_loss + tnocs_loss, cnf_loss, tnocs_loss


def make_train_step(model: CaSPRModel, tx, cnf_loss_weight, tnocs_loss_weight,
                    accum_steps: int = 1):
    """Returns jitted step(params, opt_state, mbn_state, x, target, key).

    ``accum_steps > 1`` splits the batch into that many microbatches,
    accumulates averaged gradients over a lax.scan, and applies ONE
    optimizer update — peak activation memory drops ~accum_steps-fold
    for the same effective batch (the reference is pinned to batch 5 by
    16GB V100s; this is the TPU-native way past the same wall).  Note
    the usual batch-norm caveat: MovingBatchNorm normalizes each
    microbatch by its own stats and its running stats advance per
    microbatch, so losses match the unaccumulated step exactly only for
    MBN-free configs (e.g. T-NOCS pretraining).
    """

    def loss_fn(p, sink, mbn_state, x, target, key):
        out, new_state = model.forward(
            p, mbn_state, x, target, key, training=True, nfe_sink=sink
        )
        loss, cnf_loss, tnocs_loss = compute_losses(
            out, cnf_loss_weight, tnocs_loss_weight
        )
        aux = {
            "cnf_loss": cnf_loss,
            "tnocs_loss": tnocs_loss,
            "nfe": out["nfe"],
            "mean_nll": jnp.mean(out["nll"]) if "nll" in out else 0.0,
            "tnocs_per_point": (
                out["tnocs_loss"] if "tnocs_loss" in out else None
            ),
            "new_state": new_state,
        }
        return loss, aux

    sink0 = {
        "latent": jnp.zeros((), jnp.float32),
        "cnf": jnp.zeros((), jnp.float32),
    }

    def grads_of(params, mbn_state, x, target, key):
        return jax.value_and_grad(loss_fn, has_aux=True, argnums=(0, 1))(
            params, sink0, mbn_state, x, target, key
        )

    def step(params, opt_state, mbn_state, x, target, key):
        if accum_steps == 1:
            (loss, aux), (grads, nfe_bwd) = grads_of(
                params, mbn_state, x, target, key
            )
        else:
            b = x.shape[0]
            if b % accum_steps:
                raise ValueError(
                    f"batch {b} not divisible by accum_steps {accum_steps}"
                )
            xm = x.reshape(accum_steps, b // accum_steps, *x.shape[1:])
            tm = target.reshape(accum_steps, b // accum_steps,
                                *target.shape[1:])
            keys = jax.random.split(key, accum_steps)

            def micro(carry, inp):
                g_acc, nfe_acc, state = carry
                xi, ti, ki = inp
                (loss_i, aux_i), (g_i, nfe_i) = grads_of(
                    params, state, xi, ti, ki
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_i)
                nfe_acc = jax.tree_util.tree_map(nfe_add, nfe_acc, nfe_i)
                scalars = {
                    "loss": loss_i,
                    "cnf_loss": aux_i["cnf_loss"],
                    "tnocs_loss": aux_i["tnocs_loss"],
                    "mean_nll": aux_i["mean_nll"],
                    "nfe": jnp.stack([
                        aux_i["nfe"][0].astype(jnp.float32),
                        aux_i["nfe"][1].astype(jnp.float32),
                    ]),
                }
                if aux_i["tnocs_per_point"] is not None:
                    sp = aux_i["tnocs_per_point"]
                    scalars["tnocs_pos"] = jnp.mean(
                        jnp.linalg.norm(sp[..., :3], axis=-1)
                    )
                    scalars["tnocs_time"] = jnp.mean(sp[..., 3])
                return (g_acc, nfe_acc, aux_i["new_state"]), scalars

            g0 = jax.tree_util.tree_map(jnp.zeros_like, params)
            (g_sum, nfe_bwd, new_state), ms = lax.scan(
                micro,
                (g0, dict(sink0), mbn_state),
                (xm, tm, keys),
            )
            grads = jax.tree_util.tree_map(
                lambda g: g / accum_steps, g_sum
            )
            # microbatch means average to the full-batch mean (equal
            # sizes); NFE totals sum across the microbatch solves
            loss = jnp.mean(ms["loss"])
            aux = {
                "cnf_loss": jnp.mean(ms["cnf_loss"]),
                "tnocs_loss": jnp.mean(ms["tnocs_loss"]),
                "mean_nll": jnp.mean(ms["mean_nll"]),
                "nfe": (nfe_sum(ms["nfe"][:, 0]), nfe_sum(ms["nfe"][:, 1])),
                "tnocs_per_point": None,
                "new_state": new_state,
            }
            if "tnocs_pos" in ms:
                aux["tnocs_scalars"] = (
                    jnp.mean(ms["tnocs_pos"]), jnp.mean(ms["tnocs_time"])
                )

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = {
            "loss": loss,
            "cnf_loss": aux["cnf_loss"],
            "tnocs_loss": aux["tnocs_loss"],
            "mean_nll": aux["mean_nll"],
            # forward + adjoint evaluations, matching the reference's
            # read-NFE-after-backward accounting (train_utils.py:142-148)
            "nfe": jnp.stack(
                [
                    nfe_add(aux["nfe"][0].astype(jnp.float32),
                            nfe_bwd["latent"]),
                    nfe_add(aux["nfe"][1].astype(jnp.float32),
                            nfe_bwd["cnf"]),
                ]
            ),
            "nfe_forward": jnp.stack(
                [aux["nfe"][0].astype(jnp.float32), aux["nfe"][1].astype(jnp.float32)]
            ),
        }
        if aux["tnocs_per_point"] is not None:
            sp = aux["tnocs_per_point"]
            metrics["tnocs_pos_err"] = jnp.mean(
                jnp.linalg.norm(sp[..., :3], axis=-1)
            )
            metrics["tnocs_time_err"] = jnp.mean(sp[..., 3])
        elif "tnocs_scalars" in aux:  # accumulated path pre-reduces
            metrics["tnocs_pos_err"], metrics["tnocs_time_err"] = aux[
                "tnocs_scalars"
            ]
        return new_params, new_opt_state, aux["new_state"], metrics

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_eval_step(model: CaSPRModel, cnf_loss_weight, tnocs_loss_weight):
    """Returns jitted eval(params, mbn_state, x, target, key) -> metrics.

    Errors are returned unreduced and the loss additionally per batch item
    (the batch mean of ``loss_per_item`` equals ``compute_losses``'s scalar)
    so the host can mask loader padding out of every statistic."""

    def step(params, mbn_state, x, target, key):
        out, _ = model.forward(params, mbn_state, x, target, key, training=False)
        loss, cnf_loss, tnocs_loss = compute_losses(
            out, cnf_loss_weight, tnocs_loss_weight
        )
        b, t, n, _ = target.shape
        nll = out.get("nll", jnp.zeros((b, t, n), jnp.float32))
        tn = out.get("tnocs_loss", jnp.zeros((b, t, n, 4), jnp.float32))
        cnf_per_item = cnf_loss_weight * jnp.mean(jnp.sum(nll, axis=2), axis=1)
        tnocs_per_item = tnocs_loss_weight * jnp.mean(tn, axis=(1, 2, 3))
        return {
            "loss": loss,
            "cnf_loss": cnf_loss,
            "tnocs_loss": tnocs_loss,
            "loss_per_item": cnf_per_item + tnocs_per_item,  # (B,)
            "nll": nll,
            "tnocs_pos_err": jnp.linalg.norm(tn[..., :3], axis=-1),  # (B,T,N)
            "tnocs_time_err": tn[..., 3],  # (B, T, N)
            "nfe": jnp.stack(
                [out["nfe"][0].astype(jnp.float32), out["nfe"][1].astype(jnp.float32)]
            ),
        }

    return jax.jit(step)


def run_one_epoch(
    step_fn,
    params,
    opt_state,
    mbn_state,
    loader,
    key,
    epoch,
    loss_tracker,
    log_out,
    mode="train",
    print_stats_every=10,
    mesh=None,
):
    """Host-side epoch driver (reference train_utils.py:82-233).

    For mode='train', step_fn must be a train step; otherwise an eval step
    and loss_tracker a TestStatTracker.  Returns updated
    (params, opt_state, mbn_state, key).
    """
    num_batches = len(loader)
    batch_losses = []
    for i, batch in enumerate(loader):
        key, sub = jax.random.split(key)
        if mesh is not None:
            # batch over the dp axes; point axis over sp when present;
            # multi-host processes contribute their local loader rows
            # (numpy goes straight to the device — no default-device stop)
            x, target = global_batch_points(
                mesh, (batch["input"], batch["target"])
            )
        else:
            x = jnp.asarray(batch["input"])
            target = jnp.asarray(batch["target"])

        if mode == "train":
            params, opt_state, mbn_state, metrics = step_fn(
                params, opt_state, mbn_state, x, target, sub
            )
            batch_losses.append(float(metrics["loss"]))
            if i % print_stats_every == 0:
                loss_tracker.record_train_step(
                    float(np.mean(batch_losses)),
                    float(metrics["cnf_loss"]),
                    float(metrics["tnocs_loss"]),
                    epoch * num_batches + i,
                )
                nfe_arr = np.asarray(metrics["nfe"])  # incl. adjoint evals
                if (nfe_arr % 1.0 != 0.0).any():
                    # odeint_discrete's step-bound exhaustion marker (a
                    # +0.5 fraction on the NFE count — backend-safe, no
                    # host callback; see ops/odeint.py::nfe_exhausted)
                    log(
                        log_out,
                        "WARNING: a discrete-mode ODE solve hit its "
                        "attempted-step bound this step; outputs past the "
                        "bound hold the final integrator state. Raise "
                        "CASPR_TPU_ODE_STEPS.",
                    )
                print_stats(
                    log_out,
                    epoch,
                    i,
                    num_batches,
                    float(np.mean(batch_losses)),
                    float(metrics.get("mean_nll", 0.0)),
                    float(metrics.get("tnocs_pos_err", 0.0)),
                    float(metrics.get("tnocs_time_err", 0.0)),
                    "TRAIN",
                    nfe_arr,
                )
                batch_losses = []
        else:
            metrics = step_fn(params, mbn_state, x, target, sub)
            # loader padding (batch['valid'] < B): mask padded rows out of
            # every statistic; mean of per-item losses over the valid rows
            # equals the unpadded batch loss
            # statistics run over the (gathered) GLOBAL batch; sharded
            # loaders report the global real-row count separately
            valid = batch.get("valid_global", batch.get("valid", x.shape[0]))
            loss_tracker.record_stats(
                float(np.mean(_fetch(metrics["loss_per_item"])[:valid])),
                _fetch(metrics["nll"])[:valid],
                _fetch(metrics["tnocs_pos_err"])[:valid].reshape(-1),
                _fetch(metrics["tnocs_time_err"])[:valid].reshape(-1),
                _fetch(metrics["nfe"]),
            )
            if i % print_stats_every == 0:
                means = loss_tracker.get_mean_stats()
                print_stats(
                    log_out, epoch, i, num_batches, means[0], means[1],
                    means[2], means[3], mode.upper(), means[4]
                )
    return params, opt_state, mbn_state, key
