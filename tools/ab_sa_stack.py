"""A/B the post-gather SA conv stack (GN1 -> ReLU -> conv2 -> GN2 -> ReLU
-> conv3 -> GN3 -> ball max) at SA-level shapes: the row-form loop
(sa_scale_factored's default) vs the lanes-packed form (ops/sa_packed.py,
K folded into channels so the narrow intermediates skip XLA's 128-lane
minor-dim padding).

Times the stack in isolation from an HBM-resident h1 (the gather output),
which is exactly the boundary the dispatch flag cuts at.  Also checks
numeric agreement on device.

Usage: B=160 M=1024 python tools/ab_sa_stack.py
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

from caspr_tpu.models.pointnet2 import _mini_pointnet_init, group_norm
from caspr_tpu.ops.sa_packed import sa_stack_packed

B = int(os.environ.get("B", "160"))
M = int(os.environ.get("M", "1024"))
ITERS = int(os.environ.get("ITERS", "5"))


def sync(o):
    np.asarray(o[(0,) * o.ndim])


def sa_stack_rows(sp, h, num_groups=16):
    """The sa_scale_factored conv loop, lifted to take h1 directly."""
    num = len(sp["convs"])
    for i in range(num):
        if i > 0:
            w = jnp.transpose(sp["convs"][i]["weight"])
            h = jnp.matmul(
                h, w, preferred_element_type=jnp.float32
            ) + sp["convs"][i]["bias"]
        h = group_norm(sp["norms"][i], h, num_groups)
        if i < num - 1:
            h = jax.nn.relu(h)
    return jnp.max(h, axis=1)


def timeit(fn, sp, h, iters=ITERS):
    out = fn(sp, h)
    sync(out)
    start = time.perf_counter()
    for i in range(iters):
        out = fn(sp, h + np.float32(i * 1e-6))
    sync(out)
    return (time.perf_counter() - start) / iters


def full_rows(sp, t, u, gidx):
    """gather + subtract + row-form stack (the current default chain)."""
    from caspr_tpu.ops.pointops import gather_points

    b, m, _ = u.shape
    g = gather_points(t, gidx)
    h = (g - u[:, :, None, :]).reshape(b * m, *g.shape[2:])
    return sa_stack_rows(sp, h)


def full_packed(sp, t, u, gidx):
    """packed-layout gather + subtract + lanes-packed stack."""
    from caspr_tpu.ops.pointops import gather_points_packed
    from caspr_tpu.ops.sa_packed import sa_stack_packed_flat

    b, m, d1 = u.shape
    kk = gidx.shape[2]
    gp = gather_points_packed(t, gidx)
    hp = (gp - jnp.tile(u, (1, 1, kk))).reshape(b * m, kk * d1)
    return sa_stack_packed_flat(sp, hp, kk, d1)


def main():
    print("backend:", jax.default_backend(), "B:", B, "M:", M)
    rng = np.random.default_rng(0)
    rows_j = jax.jit(sa_stack_rows)
    packed_j = jax.jit(sa_stack_packed)
    frows_j = jax.jit(full_rows)
    fpacked_j = jax.jit(full_packed)

    # (level, N_src, K, mlp dims) — SA1 both scales, SA2 both scales
    cases = [
        ("SA1s1", 2048, 16, (16, 16, 32)),
        ("SA1s2", 2048, 32, (32, 32, 64)),
        ("SA2s1", 1024, 16, (64, 64, 128)),
        ("SA2s2", 1024, 32, (64, 96, 128)),
    ]
    for name, n, k, dims in cases:
        m = M if name.startswith("SA1") else M // 2
        sp = _mini_pointnet_init(jax.random.PRNGKey(1), 9, dims)
        h = jnp.asarray(
            rng.standard_normal((B * m, k, dims[0])), jnp.float32)
        want = np.asarray(rows_j(sp, h))
        got = np.asarray(packed_j(sp, h))
        err = float(np.max(np.abs(got - want)))
        scale = float(np.max(np.abs(want))) or 1.0
        t_rows = timeit(rows_j, sp, h)
        t_packed = timeit(packed_j, sp, h)
        print(
            f"{name} stack-only: K={k} dims={dims} rows(BM)={B * m}: "
            f"rows {t_rows * 1e3:7.2f} ms  packed {t_packed * 1e3:7.2f} ms "
            f"({t_rows / t_packed:4.2f}x)  maxrelerr {err / scale:.2e}",
            flush=True,
        )

        # full chain: gather (row-form vs packed-emit) + stack
        t_tab = jnp.asarray(
            rng.standard_normal((B, n, dims[0])), jnp.float32)
        u = jnp.asarray(
            rng.standard_normal((B, m, dims[0])) * 0.1, jnp.float32)
        gidx = jnp.asarray(
            rng.integers(0, n, size=(B, m, k)).astype(np.int32))
        wantf = np.asarray(frows_j(sp, t_tab, u, gidx))
        gotf = np.asarray(fpacked_j(sp, t_tab, u, gidx))
        errf = float(np.max(np.abs(gotf - wantf)))
        scalef = float(np.max(np.abs(wantf))) or 1.0

        def t_full(fn, i):
            return fn(sp, t_tab + np.float32(i * 1e-6), u, gidx)

        for fn in (frows_j, fpacked_j):
            sync(t_full(fn, 0))
        start = time.perf_counter()
        for i in range(ITERS):
            out = t_full(frows_j, i)
        sync(out)
        tf_rows = (time.perf_counter() - start) / ITERS
        start = time.perf_counter()
        for i in range(ITERS):
            out = t_full(fpacked_j, i)
        sync(out)
        tf_packed = (time.perf_counter() - start) / ITERS
        print(
            f"{name} full chain: "
            f"rows {tf_rows * 1e3:7.2f} ms  packed {tf_packed * 1e3:7.2f} ms "
            f"({tf_rows / tf_packed:4.2f}x)  maxrelerr {errf / scalef:.2e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
