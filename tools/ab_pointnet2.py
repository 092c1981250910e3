"""A/B the full pointnet2_apply at the eval point (B'=160, N=2048)
across SA implementations.  Usage: CASPR_TPU_SA=xla|auto python
tools/ab_pointnet2.py
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

from caspr_tpu.models.pointnet2 import (
    PointNet2Config,
    pointnet2_apply,
    pointnet2_init,
)

B = int(os.environ.get("B", "160"))
N = 2048


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def main():
    mode = os.environ.get("CASPR_TPU_SA", "auto")
    cfg = PointNet2Config()
    key = jax.random.PRNGKey(0)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (B, N, 3 + cfg.in_features)) * 0.8

    fn = jax.jit(lambda p, x: pointnet2_apply(p, cfg, x))
    out = fn(params, pts)
    sync(out)
    iters = 6
    # two timing rounds: the first timed loop in a process consistently
    # reads ~30-40% high on the remote axon backend (r4 battery:
    # ab_pointnet2 298.7 ms vs 209.7 for the identical program measured
    # later in profile_pn2's process) — report both, trust the warm one
    for tag in ("cold", "warm"):
        start = time.perf_counter()
        for i in range(iters):
            out = fn(params, (pts + i * 1e-6).astype(pts.dtype))
        sync(out)
        t = (time.perf_counter() - start) / iters
        leaf = jax.tree_util.tree_leaves(out)[0]
        print(f"pointnet2_apply CASPR_TPU_SA={mode} B={B} [{tag}]: "
              f"{t*1e3:.1f} ms  leaf0={float(leaf.reshape(-1)[0]):.5f}")


if __name__ == "__main__":
    main()
