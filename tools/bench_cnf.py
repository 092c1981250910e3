"""Isolate CNF decode cost: raw dynamics evaluations vs the full adaptive
solve, across dynamics implementations (XLA jvp vs fused Pallas kernel vs
fused Pallas with bf16 matmuls).

Env: BT, N override shapes (defaults BT=20 N=2048; eval point is BT=160).
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

BT = int(os.environ.get("BT", "20"))
N = int(os.environ.get("N", "2048"))

MODES = [
    ("xla", {"CASPR_TPU_CNF_KERNEL": "xla", "CASPR_TPU_CNF_MATMUL": "f32"}),
    ("pallas", {"CASPR_TPU_CNF_KERNEL": "pallas",
                "CASPR_TPU_CNF_MATMUL": "f32"}),
    ("pallas+bf16", {"CASPR_TPU_CNF_KERNEL": "pallas",
                     "CASPR_TPU_CNF_MATMUL": "bf16"}),
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
    e = jax.random.normal(jax.random.fold_in(key, 1), (BT, N, 3))
    lp = jnp.zeros((BT, N, 1))

    args = {
        "params": params["odenet"],
        "context": ctx,
        "e": e,
        "t_end": jnp.asarray(0.5),
    }
    state = (x.reshape(BT, -1), lp.reshape(BT, -1))
    reps = 24
    results = {}

    for name, env in MODES:
        os.environ.update(env)
        dyn = _make_dynamics(cfg, reverse=False)  # traces env at call time

        @jax.jit
        def dynamics_chain(state, args, dyn=dyn):
            # chain dependent evaluations so nothing can be elided
            def body(i, s):
                dx, dlp = dyn(jnp.float32(0.3), s, args)
                return (s[0] + 1e-6 * dx, s[1] + 1e-6 * dlp)

            return jax.lax.fori_loop(0, reps, body, state)

        t_dyn, _ = timeit(dynamics_chain, state, args)
        one = jax.jit(lambda s, a, dyn=dyn: dyn(jnp.float32(0.3), s, a))
        _, out1 = timeit(one, state, args, iters=1)
        results[name] = (t_dyn / reps, out1)
        print(f"[{name:12s}] {reps} chained dynamics evals: "
              f"{t_dyn*1000:.1f} ms ({t_dyn/reps*1000:.2f} ms/NFE)")

        @jax.jit
        def full_block(x, ctx, lp, k):
            return cnf_block_apply(params, cfg, x, ctx, lp, k, reverse=False)

        t_blk, _ = timeit(full_block, x, ctx, lp, key)
        _, _, nfe = full_block(x, ctx, lp, key)
        print(f"[{name:12s}] full cnf block solve: {t_blk*1000:.1f} ms at "
              f"NFE={float(nfe)} "
              f"({t_blk/float(nfe)*1000:.2f} ms/NFE incl solver overhead)")

    # numeric cross-check vs the XLA path
    ref_dx, ref_dlp = results["xla"][1]
    for name in ("pallas", "pallas+bf16"):
        dx, dlp = results[name][1]
        err_dx = float(jnp.max(jnp.abs(dx - ref_dx)))
        err_lp = float(jnp.max(jnp.abs(dlp - ref_dlp)))
        print(f"[{name:12s}] max |Δdx|={err_dx:.3e}  max |Δdiv|={err_lp:.3e}")


if __name__ == "__main__":
    main()
