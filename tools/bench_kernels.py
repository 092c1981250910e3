"""Kernel micro-benchmarks on the current default device (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np

from caspr_tpu.ops.pointops import ball_query_xla as ball_query_x, farthest_point_sampling_xla
from caspr_tpu.ops.pallas_kernels import (
    ball_query_pallas,
    farthest_point_sampling_pallas,
    three_nn_pallas,
)


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
    sync(out)  # FIFO device queue: last-result sync covers all iterations
    return (time.perf_counter() - start) / iters


def main():
    key = jax.random.PRNGKey(0)

    rtt = timeit(jax.jit(lambda x: x + 1.0), jnp.ones((8, 128)))
    print(f"tunnel round-trip floor: {rtt*1000:.1f} ms")

    for b, n, m in [(20, 2048, 1024), (20, 1024, 512), (160, 2048, 1024)]:
        xyz = jax.random.normal(key, (b, n, 3)) * 0.3
        t_x = timeit(
            jax.jit(lambda p: farthest_point_sampling_xla(p, m)), xyz
        )
        t_p = timeit(
            jax.jit(lambda p: farthest_point_sampling_pallas(p, m)), xyz
        )
        same = np.array_equal(
            np.asarray(farthest_point_sampling_xla(xyz, m)),
            np.asarray(farthest_point_sampling_pallas(xyz, m)),
        )
        print(
            f"fps B{b} N{n}->M{m}: xla {t_x*1000:.1f} ms, "
            f"pallas {t_p*1000:.1f} ms, match={same}"
        )

    # realistic full-eval batch: all SA-level queries in one jit

    levels = [(2048, 1024), (1024, 512), (512, 256), (256, 64), (64, 16)]

    def all_queries(pts):
        outs = []
        cur = pts
        for n_in, m in levels:
            cent = cur[:, :m]
            outs.append(bq(cur, cent, 0.05, 16))
            outs.append(bq(cur, cent, 0.1, 32))
            cur = cent
        return outs

    big = jax.random.normal(key, (80, 2048, 3)) * 0.3
    for name, bq_impl in [("xla", ball_query_x), ("pallas", ball_query_pallas)]:
        bq = bq_impl
        t_all = timeit(jax.jit(all_queries), big)
        print(f"all ball queries B80 (10 calls, {name}): {t_all*1000:.1f} ms")
    # cross-check on device
    a = np.asarray(ball_query_x(big[:2], big[:2, :256], 0.1, 32))
    b = np.asarray(ball_query_pallas(big[:2], big[:2, :256], 0.1, 32))
    print("ball query device match:", np.array_equal(a, b))

    def all_fps(pts):
        outs = []
        cur = pts
        for n_in, m in levels:
            idx = farthest_point_sampling_pallas(cur, m)
            cur = jnp.take_along_axis(cur, idx[..., None], axis=1)
            outs.append(idx)
        return outs

    t_fps_all = timeit(jax.jit(all_fps), big)
    print(f"all fps levels B80 (pallas): {t_fps_all*1000:.1f} ms")

    from caspr_tpu.ops.pointops import three_nn_xla

    def all_threenn(pts):
        outs = []
        cur = pts
        for n_in, m in levels:
            outs.append(nn3(cur, cur[:, :m]))
            cur = cur[:, :m]
        return outs

    for name, nn3_impl in [("xla", three_nn_xla), ("pallas", three_nn_pallas)]:
        nn3 = nn3_impl
        t_3nn = timeit(jax.jit(all_threenn), big)
        print(f"all three_nn B80 (5 calls, {name}): {t_3nn*1000:.1f} ms")


if __name__ == "__main__":
    main()
