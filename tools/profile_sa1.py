"""Component-level timing of the encoder's two hot stages at the eval
point (B'=160): SA level 1 (N=2048 -> M=1024, the ~125 ms stage) and FP
level 5 (the N=2048-wide interpolation, ~27 ms), each op timed as its own
jitted program with varied inputs (the remote backend memoizes bit-identical
dispatches) and a 1-element host transfer as the sync.

Usage: python tools/profile_sa1.py        (B=160)
       B=32 python tools/profile_sa1.py
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
    NUM_GROUPS,
    PointNet2Config,
    pointnet2_init,
)
from caspr_tpu.ops.pointops import (
    ball_query,
    farthest_point_sampling,
    gather_points,
    three_interpolate,
    three_nn,
)
from caspr_tpu.ops.sa_fused2 import sa_scale_factored

B = int(os.environ.get("B", "160"))
N = 2048
M = 1024
ITERS = 6


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, vary=0):
    """vary: index of a float array arg to perturb per iteration."""
    jfn = jax.jit(fn)
    out = jfn(*args)
    sync(out)
    start = time.perf_counter()
    for i in range(ITERS):
        a = list(args)
        if vary is not None:
            a[vary] = (a[vary] + (i + 1) * 1e-6).astype(a[vary].dtype)
        out = jfn(*a)
    sync(out)
    dt = (time.perf_counter() - start) / ITERS * 1e3
    print(f"  {name:34s}: {dt:8.2f} ms", flush=True)
    return dt


def main():
    cfg = PointNet2Config()
    key = jax.random.PRNGKey(0)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (B, N, 3 + cfg.in_features)) * 0.8
    xyz = pts[..., :3]
    features = pts[..., 3:]

    lvl = cfg.sa_levels()[0]
    sa1 = params["set_abstractions"][0]["scales"]

    # warm the dispatch pipeline (first timed loop in a process reads high)
    print("warming...", flush=True)
    idx = jax.jit(lambda x: farthest_point_sampling(x, M))(xyz)
    new_xyz = jax.jit(gather_points)(xyz, idx)
    sync(new_xyz)

    g1 = jax.jit(lambda a, b: ball_query(a, b, lvl.scales[0][0],
                                         lvl.scales[0][1]))(xyz, new_xyz)
    g2 = jax.jit(lambda a, b: ball_query(a, b, lvl.scales[1][0],
                                         lvl.scales[1][1]))(xyz, new_xyz)
    fp_feats = jax.random.normal(jax.random.PRNGKey(1), (B, M, 512)) * 0.3
    d2, nidx = jax.jit(three_nn)(xyz, new_xyz)

    def interp(f, d2, nidx):
        inv = 1.0 / (d2 + 1e-8)
        w = inv / jnp.sum(inv, axis=-1, keepdims=True)
        return three_interpolate(f, nidx, w)

    from caspr_tpu.models.pointnet2 import _unit_pointnet_apply

    fp5 = params["feature_propagators"][4]
    hin = jnp.concatenate(
        [interp(fp_feats, d2, nidx), features, xyz], axis=-1
    )[..., : cfg.fp_dims()[4][0]]

    # two passes: the remote backend's first timed loop of a fresh program
    # reads 30-40% high; the SECOND pass (every program compiled + driven
    # once already) is the number to trust
    for p in range(2):
        print(f"--- pass {p} ---  B={B} N={N} M={M}")
        timeit("fps 2048->1024", lambda x: farthest_point_sampling(x, M), xyz)
        timeit("gather new_xyz", gather_points, xyz, idx, vary=0)
        timeit(f"ball query r={lvl.scales[0][0]} K={lvl.scales[0][1]}",
               lambda a, b: ball_query(a, b, lvl.scales[0][0],
                                       lvl.scales[0][1]),
               xyz, new_xyz)
        timeit(f"ball query r={lvl.scales[1][0]} K={lvl.scales[1][1]}",
               lambda a, b: ball_query(a, b, lvl.scales[1][0],
                                       lvl.scales[1][1]),
               xyz, new_xyz)
        timeit("sa_scale_factored scale1 (K=16)",
               lambda x, f, nx, gi: sa_scale_factored(sa1[0], x, f, nx, gi,
                                                      NUM_GROUPS),
               xyz, features, new_xyz, g1)
        timeit("sa_scale_factored scale2 (K=32)",
               lambda x, f, nx, gi: sa_scale_factored(sa1[1], x, f, nx, gi,
                                                      NUM_GROUPS),
               xyz, features, new_xyz, g2)
        timeit("three_nn 2048 from 1024", three_nn, xyz, new_xyz)
        timeit("three_interpolate C=512", interp, fp_feats, d2, nidx,
               vary=0)
        timeit("FP5 conv stack [512,512]",
               lambda p_, h: _unit_pointnet_apply(p_, h), fp5, hin, vary=1)


if __name__ == "__main__":
    main()
