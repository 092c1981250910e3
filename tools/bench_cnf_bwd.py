"""Microbench: fused augmented-dynamics backward kernel vs the XLA
composition's vjp, at configurable (BT, N) shapes.

Usage: BT=25 N=1024 CASPR_TPU_CNF_BWD_TILE=256 python tools/bench_cnf_bwd.py
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

from caspr_tpu.models.cnf import CNFConfig, odenet_init
from caspr_tpu.ops import cnf_fused as cf

BT = int(os.environ.get("BT", "25"))
N = int(os.environ.get("N", "1024"))


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=10):
    out = fn(0.0, *args)
    sync(out)
    start = time.perf_counter()
    for i in range(iters):
        out = fn(i * 1e-6, *args)
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    cfg = CNFConfig(input_dim=3, dims=(512, 512, 512), zdim=1600 - 64)
    key = jax.random.PRNGKey(0)
    params = odenet_init(key, cfg)
    ks = jax.random.split(key, 4)
    tc = jnp.concatenate(
        [jnp.full((BT, 1), 0.5), jax.random.normal(ks[0], (BT, cfg.zdim))],
        axis=1,
    )
    y = jax.random.normal(ks[1], (BT, N, 3))
    e = jax.random.normal(ks[2], (BT, N, 3))
    ct_dx = jax.random.normal(ks[3], (BT, N, 3))
    ct_div = jnp.ones((BT, N))

    mode = os.environ.get("CASPR_TPU_CNF_BWD", "pallas")
    tile = os.environ.get("CASPR_TPU_CNF_BWD_TILE", "256")
    os.environ["CASPR_TPU_CNF_BWD"] = mode

    @jax.jit
    def bwd(eps, params, tc, y):
        _, vjp = jax.vjp(
            lambda p, c, yy: cf.fused_concatsquash_dynamics(
                p, c, yy + eps, e
            ),
            params,
            tc,
            y,
        )
        dp, dtc, dy = vjp((ct_dx, ct_div))
        return dy, dtc

    t = timeit(bwd, params, tc, y)
    # FLOP estimate: fwd recompute + ~2x for the reverse sweep
    dims = [(8, 512), (512, 512), (512, 512), (512, 8)]
    fl = 3 * 2 * 2 * BT * N * sum(a * b for a, b in dims)
    print(
        f"bwd mode={mode} tile={tile} BT={BT} N={N}: {t*1e3:.2f} ms "
        f"(~{fl/t/1e12:.1f} TFLOP/s est)"
    )


if __name__ == "__main__":
    main()
