"""Ablation profile of pointnet2 at the eval point (B'=160, N=2048).

Per-op isolation is useless on the remote TPU (each dispatch pays a
7-35 ms tunnel round trip that dwarfs most stages), so instead the FULL
jitted pointnet2_apply is timed with one stage at a time replaced by a
shape-preserving stub; cost(stage) ~= t(full) - t(ablated).
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

import caspr_tpu.models.pointnet2 as pn2
from caspr_tpu.models.pointnet2 import PointNet2Config, pointnet2_init

B = int(os.environ.get("B", "160"))
N = 2048


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=4):
    out = fn(*args)  # compile
    sync(out)
    start = time.perf_counter()
    for i in range(iters):
        a0 = (args[0] + i * 1e-6).astype(args[0].dtype)
        out = fn(a0, *args[1:])
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    cfg = PointNet2Config()
    key = jax.random.PRNGKey(0)
    params = pointnet2_init(key, cfg)
    pts = jax.random.uniform(key, (B, N, 3 + cfg.in_features)) * 0.8

    orig = {
        "fps": pn2.farthest_point_sampling,
        "bq": pn2.ball_query,
        "grp": pn2.group_points,
        "mini": pn2._mini_pointnet_apply,
        "nn3": pn2.three_nn,
        "interp": pn2.three_interpolate,
        "unit": pn2._unit_pointnet_apply,
    }

    def stub_fps(xyz, m):
        return jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32),
                                (xyz.shape[0], m))

    def stub_bq(xyz, new_xyz, radius, k):
        return jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32),
            (xyz.shape[0], new_xyz.shape[1], k),
        )

    # every stub keeps a cheap full-tensor dependency on its inputs so XLA
    # cannot dead-code-eliminate the upstream stage being measured
    def stub_grp(xyz, new_xyz, features, gidx, use_xyz):
        b, m, k = gidx.shape
        c = 3 * use_xyz + (0 if features is None else features.shape[-1])
        dep = 1e-9 * gidx.astype(xyz.dtype)[..., None]
        dep = dep + 1e-9 * jnp.mean(new_xyz, axis=-1)[:, :, None, None]
        if features is not None:
            dep = dep + 1e-9 * jnp.mean(features)
        return jnp.zeros((b, m, k, c), xyz.dtype) + dep

    def stub_mini(sp, x):
        d_out = sp["convs"][-1]["weight"].shape[0]
        dep = jnp.mean(x, axis=(1, 2), keepdims=False)[:, None] * 1e-9
        return jnp.zeros((x.shape[0], d_out), x.dtype) + dep

    def stub_nn3(q, s):
        b, nq, _ = q.shape
        dep = 1e-9 * (q[..., :1] + jnp.mean(s))
        d = jnp.ones((b, nq, 3), q.dtype) + dep
        i = jnp.zeros((b, nq, 3), jnp.int32)
        return d, i

    def stub_interp(f, idx, w):
        dep = jnp.mean(f, axis=1, keepdims=True)  # full dependency on f
        return (
            jnp.broadcast_to(dep, (f.shape[0], idx.shape[1], f.shape[-1]))
            * w[..., :1]
        )

    def stub_unit(up, x):
        d_out = up["convs"][-1]["weight"].shape[0]
        dep = jnp.mean(x, axis=-1, keepdims=True) * 1e-9
        return jnp.zeros(x.shape[:-1] + (d_out,), x.dtype) + dep

    ablations = [
        ("full", {}),
        ("no fps", {"fps": stub_fps}),
        ("no ball_query", {"bq": stub_bq}),
        ("no group_points", {"grp": stub_grp}),
        ("no SA convs", {"mini": stub_mini}),
        ("no three_nn", {"nn3": stub_nn3}),
        ("no interpolate", {"interp": stub_interp}),
        ("no FP convs", {"unit": stub_unit}),
    ]

    t_full = None
    for name, subs in ablations:
        pn2.farthest_point_sampling = subs.get("fps", orig["fps"])
        pn2.ball_query = subs.get("bq", orig["bq"])
        pn2.group_points = subs.get("grp", orig["grp"])
        pn2._mini_pointnet_apply = subs.get("mini", orig["mini"])
        pn2.three_nn = subs.get("nn3", orig["nn3"])
        pn2.three_interpolate = subs.get("interp", orig["interp"])
        pn2._unit_pointnet_apply = subs.get("unit", orig["unit"])

        fn = jax.jit(lambda x: pn2.pointnet2_apply(params, cfg, x))
        t = timeit(fn, pts)
        if t_full is None:
            t_full = t
            print(f"{name:16s}: {t*1000:7.1f} ms")
        else:
            print(f"{name:16s}: {t*1000:7.1f} ms  (stage ~ "
                  f"{(t_full-t)*1000:6.1f} ms)")


if __name__ == "__main__":
    main()
