"""Training-step throughput on the current default device.

Times the full jitted train step (forward + continuous-adjoint backward +
Adam) at the reference's full-pipeline recipe shapes: batch 5, seq-len 5,
1024 points (reference README.md:127-136).  The reference trains this
for ~5 days on 4x V100 (README.md:144) — this measures our step time on
one chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init
from caspr_tpu.train.loop import make_optimizer, make_train_step

import argparse
_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=5)
_args, _ = _ap.parse_known_args()
B, T, N = _args.batch, 5, 1024


def main():
    print(
        "backend:", jax.default_backend(),
        "ode_bwd:", os.environ.get("CASPR_TPU_ODE_BWD", "adjoint"),
        "ode_steps:", os.environ.get("CASPR_TPU_ODE_STEPS", "128"),
        "kernels:", os.environ.get("CASPR_TPU_KERNELS", "auto"),
    )
    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)
    tx = make_optimizer(1e-4)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, 0.01, 100.0)

    def batch(i):
        kx, kt = jax.random.split(jax.random.fold_in(key, i))
        x = jax.random.uniform(kx, (B, T, N, 4))
        times = jnp.sort(jax.random.uniform(kt, (B, T)), axis=1)
        times = times - times[:, :1]
        x = x.at[..., 3].set(times[:, :, None] * 5.0)
        tgt = jax.random.uniform(kt, (B, T, N, 4))
        tgt = tgt.at[..., 3].set(times[:, :, None])
        return x, tgt

    def sync(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "ndim"):
                np.asarray(leaf[(0,) * leaf.ndim])

    x, tgt = batch(0)
    params, opt_state, state, metrics = step(params, opt_state, state, x, tgt, key)
    sync(metrics["loss"])
    print("compiled; warm step metrics:", float(metrics["loss"]),
          np.asarray(metrics["nfe"]))

    iters = 5
    start = time.perf_counter()
    for i in range(1, iters + 1):
        x, tgt = batch(i)
        params, opt_state, state, metrics = step(
            params, opt_state, state, x, tgt, jax.random.fold_in(key, 100 + i)
        )
    sync(metrics["loss"])
    dt = (time.perf_counter() - start) / iters
    print(f"train step (B{B} T{T} N{N}): {dt*1000:.1f} ms "
          f"-> {B/dt:.2f} seqs/sec; nfe={np.asarray(metrics['nfe'])}")


if __name__ == "__main__":
    main()
