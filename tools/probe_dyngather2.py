"""Probe 2: which Mosaic tpu.dynamic_gather shapes actually compile?

probe_dyngather.py showed the (2048, 128)-operand sublane/lane variants
die in the Mosaic backend (INTERNAL compile error).  This probes the
small per-vreg shapes a block-decomposed gather kernel would use:
lane-dim gathers with exactly 128 lanes (single-vreg shuffles) and
sublane gathers with <= 512 sublanes.

If a (d1p, 128) lane gather compiles, a 16-block decomposition replaces
the one-hot MXU gather: per 128-row output tile, 16 in-block vreg
shuffles + hi-block selects instead of a (rows, 2048) one-hot build.
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def _lane_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


def _sub_kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


def one_shot(kernel, src, idx):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(src.shape, memory_space=pltpu.VMEM),
            pl.BlockSpec(idx.shape, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(idx.shape, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(idx.shape, src.dtype),
    )(src, idx)


def try_variant(name, kernel, s, n, axis, rng):
    src = jnp.asarray(rng.standard_normal((s, n)), jnp.float32)
    hi = s if axis == 0 else n
    idxn = rng.integers(0, hi, size=(s, n)).astype(np.int32)
    idx = jnp.asarray(idxn)
    f = jax.jit(functools.partial(one_shot, kernel))
    try:
        out = np.asarray(f(src, idx))
        ref = np.take_along_axis(np.asarray(src), idxn, axis=axis)
        err = np.abs(out - ref).max()
        t = timeit(f, src, idx)
        print(f"{name} ({s},{n}): OK {t*1e6:.0f} us  maxerr={err}")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"{name} ({s},{n}): FAILED {type(e).__name__} {str(e)[:160]}")
        return False


# --------------------------------------------------------- block-decomposed


def _blockgather_kernel(nblk, tile, d1p, src_ref, idx_ref, out_ref):
    """src (d1p, N) f32 transposed table; idx (1, tile) int32 in [0, N);
    out (d1p, tile): out[:, r] = src[:, idx[r]] via per-128-block lane
    shuffles + hi-block selects."""
    idx = idx_ref[0]  # (tile,)
    lo = jax.lax.rem(idx, 128)
    hi = jax.lax.div(idx, 128)
    lo2 = jnp.broadcast_to(lo[None, :], (d1p, tile))
    hi2 = jnp.broadcast_to(hi[None, :], (d1p, tile))
    acc = jnp.zeros((d1p, tile), jnp.float32)
    for b in range(nblk):
        blk = src_ref[:, b * 128:(b + 1) * 128]            # (d1p, 128)
        # tile the 128-lane block across the tile width, then in-block
        # lane gather with the low bits
        rep = jnp.concatenate([blk] * (tile // 128), axis=1)
        g = jnp.take_along_axis(rep, lo2 + (
            jax.lax.broadcasted_iota(jnp.int32, (d1p, tile), 1) // 128
        ) * 128, axis=1)
        acc = jnp.where(hi2 == b, g, acc)
    out_ref[:] = acc


def blockgather(src_t, idx, tile):
    """src_t (d1p, N); idx (R,) -> out (d1p, R)."""
    d1p, n = src_t.shape
    r = idx.shape[0]
    nblk = n // 128
    kernel = functools.partial(_blockgather_kernel, nblk, tile, d1p)
    return pl.pallas_call(
        kernel,
        grid=(r // tile,),
        in_specs=[
            pl.BlockSpec((d1p, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d1p, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d1p, r), jnp.float32),
    )(src_t, idx.reshape(1, r))


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    ok_lane = {}
    for s, n in [(8, 128), (32, 128), (8, 256), (8, 512), (32, 512),
                 (8, 2048), (256, 128)]:
        ok_lane[(s, n)] = try_variant("lane", _lane_kernel, s, n, 1, rng)
    for s, n in [(8, 128), (32, 128), (512, 128), (2048, 128), (128, 512)]:
        try_variant("sublane", _sub_kernel, s, n, 0, rng)

    # block-decomposed gather at SA1-scale2 shape: N=2048, d1=32, R=32768
    n, d1p, r = 2048, 32, 32768
    src = jnp.asarray(rng.standard_normal((d1p, n)), jnp.float32)
    idxn = rng.integers(0, n, size=(r,)).astype(np.int32)
    idx = jnp.asarray(idxn)
    for tile in (128, 512, 1024, 2048):
        f = jax.jit(functools.partial(blockgather, tile=tile))
        try:
            out = np.asarray(f(src, idx))
            ref = np.asarray(src)[:, idxn]
            err = np.abs(out - ref).max()
            t = timeit(f, src, idx)
            print(f"blockgather tile={tile} (d1p={d1p},N={n},R={r}): "
                  f"OK {t*1e3:.3f} ms  maxerr={err}")
        except Exception as e:  # noqa: BLE001
            print(f"blockgather tile={tile}: FAILED {type(e).__name__} "
                  f"{str(e)[:160]}")

    # one-hot reference at the same shape (matches gather_rows_pallas cost)
    def onehot_ref(src_t, idx):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
              == idx[:, None]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, jnp.transpose(src_t).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    t = timeit(jax.jit(onehot_ref), src, idx, iters=5)
    print(f"XLA one-hot same shape: {t*1e3:.3f} ms")

    # batched comparison at the real SA1 call shape: B=160, N=2048, R=M*K
    from caspr_tpu.ops.pallas_kernels import gather_rows_pallas

    b = int(os.environ.get("B", "160"))
    for c, m, k in ((16, 1024, 16), (32, 1024, 32), (32, 512, 32)):
        rr = m * k
        srcb = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        idxb = jnp.asarray(
            rng.integers(0, n, size=(b, rr)).astype(np.int32))
        f_cur = jax.jit(gather_rows_pallas)
        t_cur = timeit(f_cur, srcb, idxb, iters=5)
        f_split = jax.jit(functools.partial(gather_split_call, tile=1024))
        try:
            out = np.asarray(f_split(srcb, idxb))
            ref = np.take_along_axis(
                np.asarray(srcb), np.asarray(idxb)[:, :, None], axis=1)
            err = np.abs(out - ref).max()
            t_sp = timeit(f_split, srcb, idxb, iters=5)
            print(f"B{b} C={c} R={rr}: HIGHEST-onehot {t_cur*1e3:.2f} ms"
                  f"  split-onehot {t_sp*1e3:.2f} ms  maxerr={err}")
        except Exception as e:  # noqa: BLE001
            print(f"split-onehot C={c}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}")


# ------------------------------------------- packed-split one-hot gather


def _gather_split_kernel(n, c, tile, tpack_ref, idx_ref, out_ref):
    """tpack (1, N, 3C) bf16 exact split; idx (1, tile, 1) int32;
    out (1, tile, C) f32 — one default bf16 MXU pass + [I;I;I] fold."""
    idx = idx_ref[0]  # (tile, 1)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    onehot = (iota_n == idx).astype(jnp.bfloat16)
    gp = jax.lax.dot_general(
        onehot, tpack_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (tile, 3C) bf16-exact comps
    f0 = jax.lax.broadcasted_iota(jnp.int32, (3 * c, c), 0)
    f1 = jax.lax.broadcasted_iota(jnp.int32, (3 * c, c), 1)
    fold = (f0 % c == f1).astype(jnp.bfloat16)
    out_ref[0] = jax.lax.dot_general(
        gp.astype(jnp.bfloat16), fold, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def gather_split_call(src, idx, tile=1024):
    b, n, c = src.shape
    r = idx.shape[1]
    hi = src.astype(jnp.bfloat16)
    r1 = src - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    tpack = jnp.concatenate([hi, mid, lo], axis=-1)  # (B, N, 3C)
    tile = min(tile, r)
    while r % tile:
        tile //= 2
    kernel = functools.partial(_gather_split_kernel, n, c, tile)
    return pl.pallas_call(
        kernel,
        grid=(b, r // tile),
        in_specs=[
            pl.BlockSpec((1, n, 3 * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, c), jnp.float32),
    )(tpack, idx.reshape(b, r, 1))


if __name__ == "__main__":
    main()
