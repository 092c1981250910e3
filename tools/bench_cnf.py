"""Isolate CNF decode cost: raw dynamics evaluations vs the full adaptive
solve, to separate network cost from solver-loop overhead."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from caspr_tpu.models.cnf import CNFConfig, _make_dynamics, cnf_block_init, cnf_block_apply

BT, N = 20, 2048


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=3):
    out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    cfg = CNFConfig(zdim=1600)
    key = jax.random.PRNGKey(0)
    params = cnf_block_init(key, cfg)
    x = jax.random.normal(key, (BT, N, 3))
    ctx = jax.random.normal(key, (BT, 1600))
    e = jax.random.normal(jax.random.fold_in(key, 1), (BT, N, 3))
    lp = jnp.zeros((BT, N, 1))

    dyn = _make_dynamics(cfg, reverse=False)
    args = {
        "params": params["odenet"],
        "context": ctx,
        "e": e,
        "t_end": jnp.asarray(0.5),
    }
    state = (x.reshape(BT, -1), lp.reshape(BT, -1))

    reps = 24

    @jax.jit
    def dynamics_chain(state, args):
        # chain dependent evaluations so nothing can be elided/overlapped
        def body(i, s):
            dx, dlp = dyn(jnp.float32(0.3), s, args)
            return (s[0] + 1e-6 * dx, s[1] + 1e-6 * dlp)

        return jax.lax.fori_loop(0, reps, body, state)

    t_dyn = timeit(dynamics_chain, state, args)
    print(f"{reps} chained dynamics evals: {t_dyn*1000:.1f} ms "
          f"({t_dyn/reps*1000:.2f} ms/NFE)")

    @jax.jit
    def full_block(x, ctx, lp, k):
        return cnf_block_apply(params, cfg, x, ctx, lp, k, reverse=False)

    t_blk = timeit(full_block, x, ctx, lp, key)
    _, _, nfe = full_block(x, ctx, lp, key)
    print(f"full cnf block solve: {t_blk*1000:.1f} ms at NFE={float(nfe)} "
          f"({t_blk/float(nfe)*1000:.2f} ms/NFE incl solver overhead)")


if __name__ == "__main__":
    main()
