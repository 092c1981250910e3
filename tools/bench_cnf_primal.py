"""Isolate the primal-only sampling decode (r4): raw primal dynamics
evals and the full sampling solve (logpx=None) across implementations and
point-tile sizes, vs the stacked (dx, div) path for reference.

Env: BT, N override shapes (defaults BT=160 N=2048 — the eval point).
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

from caspr_tpu.models.cnf import (
    CNFConfig,
    _make_dynamics,
    cnf_block_apply,
    cnf_block_init,
)

BT = int(os.environ.get("BT", "160"))
N = int(os.environ.get("N", "2048"))

MODES = [
    ("xla primal", {"CASPR_TPU_CNF_KERNEL": "xla"}),
    ("primal t512", {"CASPR_TPU_CNF_KERNEL": "pallas",
                     "CASPR_TPU_CNF_PRIMAL_TILE": "512"}),
    ("primal t1024", {"CASPR_TPU_CNF_KERNEL": "pallas",
                      "CASPR_TPU_CNF_PRIMAL_TILE": "1024"}),
    ("primal t2048", {"CASPR_TPU_CNF_KERNEL": "pallas",
                      "CASPR_TPU_CNF_PRIMAL_TILE": "2048"}),
]


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
    return (time.perf_counter() - start) / iters, out


def main():
    cfg = CNFConfig(zdim=1600)
    key = jax.random.PRNGKey(0)
    params = cnf_block_init(key, cfg)
    x = jax.random.normal(key, (BT, N, 3))
    ctx = jax.random.normal(key, (BT, 1600))

    args = {
        "params": params["odenet"],
        "context": ctx,
        "t_end": jnp.asarray(0.5),
    }
    state = x.reshape(BT, -1)
    reps = 24
    results = {}

    for name, env in MODES:
        os.environ.update(env)
        dyn = _make_dynamics(cfg, reverse=True, with_div=False)

        @jax.jit
        def dynamics_chain(state, args, dyn=dyn):
            def body(i, s):
                dx = dyn(jnp.float32(0.3), s, args)
                return s + 1e-6 * dx

            return jax.lax.fori_loop(0, reps, body, state)

        t_dyn, _ = timeit(dynamics_chain, state, args)
        one = jax.jit(lambda s, a, dyn=dyn: dyn(jnp.float32(0.3), s, a))
        _, out1 = timeit(one, state, args, iters=1)
        results[name] = (t_dyn / reps, out1)
        print(f"[{name:12s}] {reps} chained primal evals: "
              f"{t_dyn*1000:.1f} ms ({t_dyn/reps*1000:.2f} ms/NFE)")

        @jax.jit
        def full_sample(x, ctx, k):
            return cnf_block_apply(params, cfg, x, ctx, None, k,
                                   reverse=True)

        t_blk, _ = timeit(full_sample, x, ctx, key)
        _, _, nfe = full_sample(x, ctx, key)
        print(f"[{name:12s}] full sampling solve: {t_blk*1000:.1f} ms at "
              f"NFE={float(nfe)} "
              f"({t_blk/float(nfe)*1000:.2f} ms/NFE incl solver overhead)",
              flush=True)

    ref = results["xla primal"][1]
    for name, _ in MODES[1:]:
        err = float(jnp.max(jnp.abs(results[name][1] - ref)))
        print(f"[{name:12s}] max |Δdx| vs xla = {err:.3e}")


if __name__ == "__main__":
    main()
