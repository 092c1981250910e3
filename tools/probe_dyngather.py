"""Probe: speed of Mosaic tpu.dynamic_gather (sublane + lane dim) vs XLA
take_along_axis at SA-grouping shapes.

tpu.dynamic_gather is reached from inside a Pallas kernel via
jnp.take_along_axis(x, idx, axis=d) where idx has the SAME shape as x
(2-D only).  out[i,j] = x[idx[i,j], j] for axis=0.

If this is fast, it replaces the one-hot MXU gather inside a fused SA
kernel (BENCHMARKS.md conclusion: one-hot loses at SA density).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


# ---------------------------------------------------------------- sublane dim


def _sub_kernel(src_ref, idx_ref, out_ref):
    # src (N, L) f32, idx (N, L) int32 (row index broadcast over lanes)
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


def gather_sublane(src, idx):
    """src (N, L); idx (R, L) with R = G*N -> out (R, L), grid over G."""
    n, l = src.shape
    r = idx.shape[0]
    assert r % n == 0
    g = r // n
    return pl.pallas_call(
        _sub_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((n, l), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, l), src.dtype),
    )(src, idx)


# ------------------------------------------------------------------ lane dim


def _lane_kernel(src_ref, idx_ref, out_ref):
    # src (S, N) f32, idx (S, N) int32 (col index broadcast over sublanes)
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


def gather_lane(src, idx):
    """src (S, N); idx (S, R) with R = G*N -> out (S, R), grid over G."""
    s, n = src.shape
    r = idx.shape[1]
    assert r % n == 0
    g = r // n
    return pl.pallas_call(
        _lane_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((s, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, n), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, r), src.dtype),
    )(src, idx)


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), jax.devices())

    # SA1-ish per-batch shape: N=2048 source rows, R=1024*48 gathered rows.
    n, l = 2048, 128
    r = 49152  # 24*N
    src = jnp.asarray(rng.standard_normal((n, l)), jnp.float32)
    idx_rows = rng.integers(0, n, size=(r,)).astype(np.int32)
    idx = jnp.asarray(np.broadcast_to(idx_rows[:, None], (r, l)).copy())

    f_sub = jax.jit(gather_sublane)
    try:
        out = f_sub(src, idx)
        ref = np.asarray(src)[idx_rows]
        err = np.abs(np.asarray(out) - ref).max()
        t = timeit(f_sub, src, idx)
        print(f"sublane dynamic_gather (N={n},L={l},R={r}): {t*1e3:.3f} ms  maxerr={err}")
    except Exception as e:  # noqa: BLE001
        print("sublane dynamic_gather FAILED:", type(e).__name__, str(e)[:500])

    # lane-dim variant: table transposed (128, N), gather columns.
    srcT = src.T  # (L, N) -> treat as (S=128, N)
    idxT = jnp.asarray(np.broadcast_to(idx_rows[None, :], (l, r)).copy())
    f_lane = jax.jit(gather_lane)
    try:
        out = f_lane(srcT, idxT)
        ref = np.asarray(src)[idx_rows].T
        err = np.abs(np.asarray(out) - ref).max()
        t = timeit(f_lane, srcT, idxT)
        print(f"lane dynamic_gather (S={l},N={n},R={r}): {t*1e3:.3f} ms  maxerr={err}")
    except Exception as e:  # noqa: BLE001
        print("lane dynamic_gather FAILED:", type(e).__name__, str(e)[:500])

    # XLA baselines at the same shape
    def xla_gather(points, idx1d):
        return jnp.take_along_axis(points, idx1d[:, None], axis=0)

    f_xla = jax.jit(xla_gather)
    idx1 = jnp.asarray(idx_rows)
    t = timeit(f_xla, src, idx1)
    print(f"XLA take_along_axis same shape: {t*1e3:.3f} ms")

    # batched realistic SA1: B=160 batch, vmapped
    b = 160
    srcs = jnp.asarray(rng.standard_normal((b, n, l)), jnp.float32)
    idxs_rows = rng.integers(0, n, size=(b, r)).astype(np.int32)
    idxs = jnp.asarray(np.broadcast_to(idxs_rows[:, :, None], (b, r, l)).copy())
    f_sub_b = jax.jit(jax.vmap(gather_sublane))
    try:
        t = timeit(f_sub_b, srcs, idxs, iters=3)
        gb = b * r * l * 4 / 1e9
        print(f"vmapped sublane gather B={b}: {t*1e3:.1f} ms  ({gb/t:.0f} GB/s out)")
    except Exception as e:  # noqa: BLE001
        print("vmapped sublane FAILED:", type(e).__name__, str(e)[:500])

    f_xla_b = jax.jit(jax.vmap(xla_gather))
    idxs1 = jnp.asarray(idxs_rows)
    t = timeit(f_xla_b, srcs, idxs1, iters=3)
    gb = b * r * l * 4 / 1e9
    print(f"vmapped XLA take_along B={b}: {t*1e3:.1f} ms  ({gb/t:.0f} GB/s out)")


if __name__ == "__main__":
    main()
