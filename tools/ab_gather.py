"""A/B the row-gather implementations across channel widths at SA-like
density (B=160, N=2048, R=M*K), to place the gather_points dispatch
crossover.  Variants: XLA take_along_axis, HIGHEST one-hot (C, rows)
kernel, split-bf16 rows-major kernel.

Usage: B=160 python tools/ab_gather.py
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

from caspr_tpu.ops.pallas_kernels import (
    _gather_rows_call,
    _gather_rows_dma_call,
    _gather_rows_shuf_call,
    _gather_rows_split_call,
)

B = int(os.environ.get("B", "160"))
N = int(os.environ.get("N", "2048"))


def sync(o):
    np.asarray(o[(0,) * o.ndim])


def timeit(fn, src, idx, iters=5):
    out = fn(src, idx)
    sync(out)
    start = time.perf_counter()
    for i in range(iters):
        out = fn((src + np.float32(i * 1e-6)), idx)
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    print("backend:", jax.default_backend(), "B:", B, "N:", N)
    rng = np.random.default_rng(0)

    xla = jax.jit(
        lambda s, i: jnp.take_along_axis(s, i[:, :, None], axis=1))
    onehot = jax.jit(_gather_rows_call)
    split = jax.jit(_gather_rows_split_call)
    dma = jax.jit(_gather_rows_dma_call)
    shuf = jax.jit(_gather_rows_shuf_call)

    def bench_case(b, n, c, r, variants):
        src = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        idxn = rng.integers(0, n, size=(b, r)).astype(np.int32)
        idx = jnp.asarray(idxn)
        t_x = timeit(xla, src, idx)
        row = f"B={b:3d} N={n:4d} C={c:4d} R={r:6d}: xla {t_x*1e3:7.2f} ms"
        for name, fn in variants:
            try:
                out = np.asarray(fn(src, idx))
                ref = np.take_along_axis(
                    np.asarray(src), idxn[:, :, None], axis=1)
                ok = np.array_equal(out, ref)
                t = timeit(fn, src, idx)
                row += f"  {name} {t*1e3:7.2f} ms{'' if ok else ' WRONG'}"
            except Exception as e:  # noqa: BLE001
                row += f"  {name} FAIL({type(e).__name__})"
        print(row, flush=True)

    all_v = (("onehot", onehot), ("split", split), ("dma", dma),
             ("shuf", shuf))
    # SA grouping shapes (many rows, small C)
    for c in (3, 8, 16, 32, 64, 96, 128):
        for r in (16384, 32768):
            bench_case(B, N, c, r, all_v)
    # FP / skip-feature shapes (big C, fewer rows) — the regime XLA
    # currently keeps; only shuf and dma can reach it (one-hot tables
    # exceed VMEM)
    big_v = (("dma", dma), ("shuf", shuf))
    bench_case(B, 1024, 512, 6144, big_v)    # FP5 three_interpolate src
    bench_case(B, 512, 256, 3072, big_v)     # FP4
    bench_case(B, 2048, 512, 2048, big_v)    # hypothetical skip gather


if __name__ == "__main__":
    main()
