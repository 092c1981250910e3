"""Stage-level timing breakdown of the PointNet++ encoder at the eval
point (B'=160, N=2048): FPS/ball-query front end, each SA level, each FP
level, and the final head — measured as jitted prefix programs (stage i's
cost = time(prefix through i) - time(prefix through i-1)), which charges
each stage its real in-context cost including layout transitions.

Usage: python tools/profile_pn2.py            (defaults B=160)
       B=32 python tools/profile_pn2.py
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
    _hier_fps,
    _sa_impl,
    _unit_pointnet_apply,
    _mini_pointnet_apply,
    pointnet2_init,
)
from caspr_tpu.nn import conv1x1, group_norm
from caspr_tpu.ops.pointops import (
    ball_query,
    farthest_point_sampling,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)

B = int(os.environ.get("B", "160"))
N = 2048
ITERS = 6


def _prefix_fn(cfg, n_sa, n_fp, head):
    """Encoder prefix: first n_sa SA levels, then (if the SA cascade is
    complete) the first n_fp FP levels, then (optionally) the head."""

    def fn(params, points):
        xyz = points[..., :3]
        features = points[..., 3:] if points.shape[-1] > 3 else None
        xyz_list = [xyz]
        feat_list = [features]
        fps_ordered = False
        for li, (lvl, lvl_params) in enumerate(
            zip(cfg.sa_levels(), params["set_abstractions"])
        ):
            if li >= n_sa:
                break
            m, n = lvl.num_points_out, xyz.shape[1]
            if fps_ordered and m <= n and _hier_fps():
                new_xyz = xyz[:, :m]
            else:
                idx = farthest_point_sampling(xyz, m)
                new_xyz = gather_points(xyz, idx)
                if m < n:
                    fps_ordered = True
                elif m > n:
                    fps_ordered = False
            scale_feats = []
            for (radius, k, dims), sp in zip(lvl.scales, lvl_params["scales"]):
                gidx = ball_query(xyz, new_xyz, radius, k)
                impl = _sa_impl(cfg, sp, xyz, new_xyz, k)
                if impl == "factored":
                    from caspr_tpu.ops.sa_fused2 import sa_scale_factored

                    scale_feats.append(
                        sa_scale_factored(sp, xyz, features, new_xyz, gidx,
                                          NUM_GROUPS))
                else:
                    grouped = group_points(xyz, new_xyz, features, gidx, True)
                    b_, m_, kk, cin = grouped.shape
                    h = _mini_pointnet_apply(sp, grouped.reshape(b_ * m_, kk, cin))
                    scale_feats.append(h.reshape(b_, m_, -1))
            features = jnp.concatenate(scale_feats, axis=-1)
            xyz = new_xyz
            xyz_list.append(xyz)
            feat_list.append(features)
        if n_sa < len(cfg.sa_levels()):
            return features
        target = len(xyz_list) - 2
        for fi, fp_params in enumerate(params["feature_propagators"]):
            if fi >= n_fp:
                break
            q_xyz = xyz_list[target]
            s_xyz = xyz_list[target + 1]
            d2, idx = three_nn(q_xyz, s_xyz)
            inv = 1.0 / (d2 + 1e-8)
            w = inv / jnp.sum(inv, axis=-1, keepdims=True)
            interp = three_interpolate(feat_list[target + 1], idx, w)
            skip = feat_list[target]
            h = interp if skip is None else jnp.concatenate([interp, skip], -1)
            feat_list[target] = _unit_pointnet_apply(fp_params, h)
            target -= 1
        if not head:
            # last FP write lands at feat_list[5 - n_fp] (target counts
            # down from 4); with no FP levels return the SA5 output
            return feat_list[5 - n_fp] if n_fp else feat_list[-1]
        h = feat_list[0]
        h = jax.nn.relu(group_norm(
            params["final_norm"], conv1x1(params["final_conv1"], h),
            NUM_GROUPS))
        return conv1x1(params["final_conv2"], h)

    return fn


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, params, pts):
    jfn = jax.jit(fn)
    out = jfn(params, pts)
    sync(out)
    start = time.perf_counter()
    for i in range(ITERS):
        out = jfn(params, (pts + i * 1e-6).astype(pts.dtype))
    sync(out)
    return (time.perf_counter() - start) / ITERS * 1e3


def main():
    cfg = PointNet2Config()
    key = jax.random.PRNGKey(0)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (B, N, 3 + cfg.in_features)) * 0.8

    stages = [(f"SA1-{i}", i, 0, False) for i in range(1, 6)]
    stages += [(f"+FP1-{i}", 5, i, False) for i in range(1, 6)]
    stages += [("+head", 5, 5, True)]

    # warm the dispatch pipeline with the full program before any timed
    # loop: the first timed loop in a process reads ~30-40% high on the
    # remote backend (r4 battery: SA1-1 189.8 ms cold vs the SA1-2
    # cumulative 125.5 that contains it)
    t_full = timeit(_prefix_fn(cfg, 5, 5, True), params, pts)
    print(f"pipeline warmup (full program): {t_full:.1f} ms (discard)")

    prev = 0.0
    print(f"pointnet2 stage breakdown  B={B} N={N}  (cumulative / delta ms)")
    for name, n_sa, n_fp, head in stages:
        t = timeit(_prefix_fn(cfg, n_sa, n_fp, head), params, pts)
        print(f"  {name:8s}: {t:8.1f} ms   (+{t - prev:7.1f})", flush=True)
        prev = t


if __name__ == "__main__":
    main()
