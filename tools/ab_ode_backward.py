"""A/B the two training backward modes through the ODE solves:
continuous adjoint (default) vs discrete backprop-through-the-solver
(CASPR_TPU_ODE_BWD=discrete, ops/odeint.py::odeint_discrete).

Overfits a fixed synthetic batch at tiny dims with BOTH modes from the
same init and prints the loss curves side by side — convergence-quality
evidence for the discrete mode beyond the one-step gradient-parity
tests.  Runs anywhere (CPU ok: tiny dims); env STEPS / SEED / LOG_EVERY
override the defaults.

The mode flag is read at trace time inside odeint_adjoint
(ops/odeint.py:470), so each arm builds a fresh train step after
setting the env var.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The container sitecustomize force-selects the remote axon TPU and
# overrides the JAX_PLATFORMS env var; CPU=1 forces the host backend
# the supported way (jax config update after import) so this tool can
# run during tunnel outages.
if os.environ.get("CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

STEPS = int(os.environ.get("STEPS", "100"))
LOG_EVERY = int(os.environ.get("LOG_EVERY", "5"))
SEED = int(os.environ.get("SEED", "0"))


def tiny_setup():
    from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init

    cfg = CaSPRConfig(
        sa_points=(16, 8, 8, 4, 4),
        ball_samples=(4, 8),
        local_feat_size=64,
        latent_feat_size=160,
        ode_hidden_size=32,
        motion_feat_size=16,
        global_feat_size=128,
        cnf_dims=(32, 32),
    )
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(SEED)
    params, state = caspr_init(key, cfg)
    b, t, n = 2, 3, 48
    kx, kt = jax.random.split(key)
    x = jax.random.uniform(kx, (b, t, n, 4))
    times = jnp.broadcast_to(jnp.linspace(0.0, 1.0, t), (b, t))
    x = x.at[..., 3].set(times[:, :, None])
    target = jax.random.uniform(kt, (b, t, n, 4))
    target = target.at[..., 3].set(times[:, :, None])
    return model, params, state, (x, target)


def run_arm(mode: str):
    os.environ["CASPR_TPU_ODE_BWD"] = mode
    from caspr_tpu.train.loop import make_optimizer, make_train_step

    model, params, state, (x, target) = tiny_setup()
    tx = make_optimizer(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(
        model, tx, cnf_loss_weight=0.01, tnocs_loss_weight=100.0
    )
    key = jax.random.PRNGKey(SEED + 1)
    losses = []
    t0 = time.time()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        params, opt_state, state, metrics = step(
            params, opt_state, state, x, target, sub
        )
        loss = float(np.asarray(metrics["loss"]))
        losses.append(loss)
        if i % LOG_EVERY == 0 or i == STEPS - 1:
            print(f"  [{mode}] step {i:4d} loss {loss:.4f}", flush=True)
    print(f"  [{mode}] {STEPS} steps in {time.time() - t0:.1f}s")
    return losses


def main():
    print(f"A/B ODE backward modes: {STEPS} overfit steps, tiny dims")
    adj = run_arm("adjoint")
    dis = run_arm("discrete")
    print("\nstep  adjoint  discrete")
    for i in range(0, STEPS, LOG_EVERY):
        print(f"{i:4d}  {adj[i]:8.4f}  {dis[i]:8.4f}")
    print(f"final {adj[-1]:8.4f}  {dis[-1]:8.4f}")


if __name__ == "__main__":
    main()
