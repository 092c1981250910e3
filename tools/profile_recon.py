"""Clean end-to-end split of the reconstruct pipeline at the bench point
(batch 16, 10x2048 protocol, trained weights if present).

Methodology (remote-tunnel rules): every stage timed as chained dispatches
with varied inputs and ONE final 1-element sync (per-iteration syncs add a
7-35 ms RTT each and inflate small stages); two passes, trust pass 1.

Usage: python tools/profile_recon.py    [BATCH=16 ITERS=6]
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
from caspr_tpu.models.cnf import flow_apply
from caspr_tpu.ops.sampling import sample_gaussian

BATCH = int(os.environ.get("BATCH", "16"))
ITERS = int(os.environ.get("ITERS", "6"))
T, N = 10, 2048


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, vary=0):
    jfn = jax.jit(fn)
    out = jfn(*args)
    sync(out)
    start = time.perf_counter()
    for i in range(1, ITERS + 1):
        a = list(args)
        a[vary] = jax.tree_util.tree_map(
            lambda v: (v + i * 1e-6).astype(v.dtype)
            if jnp.issubdtype(v.dtype, jnp.floating) else v,
            a[vary])
        out = jfn(*a)
    sync(out)
    dt = (time.perf_counter() - start) / ITERS * 1e3
    print(f"  {name:44s}: {dt:8.1f} ms", flush=True)
    return dt


def main():
    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)
    wpath = os.environ.get("WEIGHTS", "artifacts/demo_trained.pkl")
    if os.path.exists(wpath):
        from caspr_tpu.train.checkpoint import load_checkpoint, load_weights

        ck = load_checkpoint(wpath)
        # device-resident pytrees: numpy leaves would re-upload the full
        # parameter set through the tunnel on EVERY dispatch
        params = jax.tree_util.tree_map(
            jnp.asarray, load_weights(params, ck["params"]))
        state = jax.tree_util.tree_map(jnp.asarray, ck["state"])
        print(f"loaded {wpath}")

    x = jax.random.uniform(key, (BATCH, T, N, 4))
    times = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (BATCH, T))
    x = x.at[..., 3].set(times[:, :, None])
    ts = jnp.linspace(0.0, 1.0, T)

    def recon(p, s, xx, k):
        return model.reconstruct(p, s, xx, k, num_points=N, timestamps=ts)

    r = jax.jit(recon)(params, state, x, key)
    nfe = jax.tree_util.tree_map(float, r[4])
    print(f"NFE (ode, cnf): {nfe}")

    z0, _ = jax.jit(model.encode)(params, x)
    z, _ = jax.jit(
        lambda p, zz, tt: model.aggregate_and_solve_latent(
            p, zz, tt, adjoint=False, shared_times=True)
    )(params, z0, times)
    y = sample_gaussian(key, (BATCH * T, N, 3), None)

    def flow_only(yy, p, s):
        return flow_apply(p["point_cnf"], s["point_cnf"], cfg.cnf_config(),
                          yy, z.reshape(BATCH * T, -1), None, key,
                          reverse=True, training=False)[0]

    def dec(zz, p, s, k):
        return model.decode(p, s, zz, k, num_points=N)

    for p in range(2):
        print(f"--- pass {p} (batch {BATCH}) ---")
        timeit("reconstruct e2e", recon, params, state, x, key, vary=2)
        timeit("encode", model.encode, params, x, vary=1)
        timeit("latent solve (shared times)",
               lambda p_, zz, tt: model.aggregate_and_solve_latent(
                   p_, zz, tt, adjoint=False, shared_times=True),
               params, z0, times, vary=1)
        timeit("flow_apply (sampling, presampled y)", flow_only, y, params,
               state, vary=0)
        timeit("decode (sampling + flow)", dec, z, params, state, key,
               vary=0)


if __name__ == "__main__":
    main()
