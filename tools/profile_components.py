"""Component-level throughput profile on the current default device.

Times encode (TPointNet++), the latent ODE solve, and the CNF decode
separately on the 10x2048 eval protocol, plus encoder sub-stages, to steer
kernel optimization.  Usage: python tools/profile_components.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    from caspr_tpu.utils.runtime import enable_compile_cache
except ImportError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from caspr_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp

from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init

BATCH, T, N = int(__import__("os").environ.get("BATCH", "2")), 10, 2048


def timeit(fn, *args, iters=5, warmup=1, vary=0):
    """Times fn; ``vary`` names the positional arg to perturb per iteration
    (the remote backend appears to memoize identical dispatches)."""

    def call(i):
        a = list(args)
        a[vary] = jax.tree_util.tree_map(
            lambda v: (v + i * 1e-6).astype(v.dtype)
            if jnp.issubdtype(v.dtype, jnp.floating)
            else v,
            a[vary],
        )
        return fn(*a)

    def sync(o):
        # the remote axon backend does not reliably block in
        # block_until_ready; force a 1-element host transfer instead
        import numpy as _np
        for leaf in jax.tree_util.tree_leaves(o):
            _np.asarray(leaf[(0,) * leaf.ndim])

    for _ in range(warmup):
        out = call(0)
    sync(out)
    start = time.perf_counter()
    for i in range(1, iters + 1):
        out = call(i)
        sync(out)
    return (time.perf_counter() - start) / iters


def main():
    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)

    x = jax.random.uniform(key, (BATCH, T, N, 4))
    times = jnp.broadcast_to(jnp.linspace(0.0, 1.0, T), (BATCH, T))
    x = x.at[..., 3].set(times[:, :, None])

    encode = jax.jit(lambda p, xx: model.encode(p, xx))
    t_enc = timeit(encode, params, x, vary=1)
    print(f"encode (B{BATCH} T{T} N{N}): {t_enc*1000:.1f} ms")

    z0, _ = encode(params, x)

    solve = jax.jit(
        lambda p, z, tt: model.aggregate_and_solve_latent(p, z, tt, adjoint=False)
    )
    t_ode = timeit(solve, params, z0, times, vary=1)
    print(f"latent ODE solve ({BATCH*T} times): {t_ode*1000:.1f} ms")

    z, _ = solve(params, z0, times)

    def dec(p, s, zz, k):
        return model.decode(p, s, zz, k, num_points=N)

    decode = jax.jit(dec)
    t_dec = timeit(decode, params, state, z, key, vary=2)
    print(f"CNF decode ({BATCH*T}x{N}): {t_dec*1000:.1f} ms")

    _, _, _, nfe = decode(params, state, z, key)
    print(f"decode NFE: {float(nfe)}")

    total = t_enc + t_ode + t_dec
    print(
        f"total {total*1000:.1f} ms -> {BATCH/total:.2f} seqs/sec "
        f"(enc {100*t_enc/total:.0f}% ode {100*t_ode/total:.0f}% "
        f"dec {100*t_dec/total:.0f}%)"
    )

    # encoder sub-stages
    from caspr_tpu.models.pointnet import pointnetfeat_apply
    from caspr_tpu.models.pointnet2 import pointnet2_apply
    from caspr_tpu.models.tpointnet2 import augment_input
    from caspr_tpu.ops import ball_query, farthest_point_sampling

    enc_cfg = cfg.encoder_config()
    spatial = x.reshape(BATCH * T, N, 4)[..., :3]
    local_in = augment_input(spatial, True, True)

    pn2 = jax.jit(
        lambda p, pts: pointnet2_apply(p, enc_cfg.pointnet2_config(), pts)
    )
    t_pn2 = timeit(pn2, params["encoder"]["local_extract"], local_in, vary=1)
    print(f"  pointnet2 ({BATCH*T} frames of {N}): {t_pn2*1000:.1f} ms")

    glob = jax.jit(
        lambda p, xx: pointnetfeat_apply(p, xx.reshape(BATCH, T * N, 4))
    )
    t_glob = timeit(glob, params["encoder"]["global_extract"], x, vary=1)
    print(f"  global pointnet: {t_glob*1000:.1f} ms")

    fps = jax.jit(lambda pts: farthest_point_sampling(pts, 1024))
    t_fps = timeit(fps, spatial)
    print(f"  fps 2048->1024 x{BATCH*T}: {t_fps*1000:.1f} ms")

    bq = jax.jit(lambda pts: ball_query(pts, pts[:, :1024], 0.05, 32))
    t_bq = timeit(bq, spatial)
    print(f"  ball query 1024x{N} K=32 x{BATCH*T}: {t_bq*1000:.1f} ms")


if __name__ == "__main__":
    main()
