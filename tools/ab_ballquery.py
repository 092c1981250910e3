"""Time all 10 SA ball queries (and all 5 FPS calls) at the eval point
shapes (B'=160, source sizes 2048..64), chained in one jit like the
backbone issues them.  Usage: B=160 python tools/ab_ballquery.py
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

from caspr_tpu.models.pointnet2 import PointNet2Config
from caspr_tpu.ops.pointops import ball_query, farthest_point_sampling

B = int(os.environ.get("B", "160"))
N = 2048


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=6):
    out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for i in range(iters):
        out = fn((args[0] + i * 1e-6).astype(args[0].dtype), *args[1:])
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    cfg = PointNet2Config()
    key = jax.random.PRNGKey(0)
    xyz0 = jax.random.uniform(key, (B, N, 3)) * 0.8

    def fps_chain(xyz):
        out = []
        cur = xyz
        for lvl in cfg.sa_levels():
            m = min(lvl.num_points_out, cur.shape[1])
            idx = farthest_point_sampling(cur, m)
            cur = jnp.take_along_axis(cur, idx[..., None], axis=1)
            out.append(cur)
        return out

    def bq_chain(xyz):
        cents = fps_chain(xyz)
        acc = []
        cur = xyz
        for lvl, c in zip(cfg.sa_levels(), cents):
            for radius, k, _ in lvl.scales:
                gidx = ball_query(cur, c, radius, k)
                acc.append(jnp.sum(gidx))
            cur = c
        return jnp.stack(acc), cents[-1]

    f_fps = jax.jit(lambda x: fps_chain(x)[-1])
    t_fps = timeit(f_fps, xyz0)
    print(f"5 FPS levels B={B}: {t_fps*1e3:.1f} ms")

    f_bq = jax.jit(bq_chain)
    t_all = timeit(f_bq, xyz0)
    print(f"5 FPS + 10 ball queries B={B}: {t_all*1e3:.1f} ms "
          f"(bq ~= {(t_all - t_fps)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
