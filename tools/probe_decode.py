"""Where does model.decode spend time beyond the CNF solve itself?

Times: (a) full decode, (b) flow_apply alone on presampled y, (c) the
gaussian sampling + logprob prologue, (d) decode with SAMPLE_DIV=1
(stacked integration) for the in-context primal-vs-stacked delta.
Usage: BATCH=16 python tools/probe_decode.py
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

from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init
from caspr_tpu.models.cnf import flow_apply
from caspr_tpu.ops.sampling import sample_gaussian, standard_normal_logprob

BATCH, T, N = int(os.environ.get("BATCH", "16")), 10, 2048


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, iters=4, vary=0):
    out = fn(*args)
    sync(out)
    start = time.perf_counter()
    for i in range(1, iters + 1):
        a = list(args)
        a[vary] = jax.tree_util.tree_map(
            lambda v: (v + i * 1e-6).astype(v.dtype)
            if jnp.issubdtype(v.dtype, jnp.floating) else v,
            a[vary])
        out = fn(*a)
        sync(out)
    dt = (time.perf_counter() - start) / iters * 1e3
    print(f"  {name:40s}: {dt:8.1f} ms", flush=True)
    return dt


def main():
    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)
    z = jax.random.normal(key, (BATCH, T, cfg.latent_feat_size)) * 0.3

    def dec(p, s, zz, k):
        return model.decode(p, s, zz, k, num_points=N)

    decode = jax.jit(dec)
    nfe = float(decode(params, state, z, key)[3])
    print(f"decode NFE: {nfe}")

    y = sample_gaussian(key, (BATCH * T, N, 3), None)

    def flow_only(p, s, yy, zz, k):
        return flow_apply(p["point_cnf"], s["point_cnf"], cfg.cnf_config(),
                          yy, zz.reshape(BATCH * T, -1), None, k,
                          reverse=True, training=False)[0]

    def prologue(k):
        yy = sample_gaussian(k, (BATCH * T, N, 3), None)
        return jnp.sum(
            standard_normal_logprob(yy).reshape(BATCH * T, N, -1), axis=-1)

    # warm pipeline first (first timed loop reads high on the tunnel)
    timeit("[warmup] full decode", decode, params, state, z, key, vary=2,
           iters=2)

    timeit("full decode (primal)", decode, params, state, z, key, vary=2)
    timeit("flow_apply alone (primal)", jax.jit(flow_only), params, state,
           y, z, key, vary=3)
    # vary the key per iteration host-side (keys are uint32 — the float
    # perturbation in timeit would leave them bit-identical and memoized)
    jp = jax.jit(prologue)
    out = jp(key)
    sync(out)
    start = time.perf_counter()
    for i in range(1, 5):
        out = jp(jax.random.fold_in(key, i))
        sync(out)
    print(f"  {'sampling+logprob prologue':40s}: "
          f"{(time.perf_counter() - start) / 4 * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
