"""Where does the train step spend time at the reference recipe
(B5 T5 N1024)?  Times, as separate jitted programs with varied inputs and
one trailing sync each: loss forward only, loss value+grad (fwd + adjoint
backward), the full optimizer step, and value+grad of each loss leg in
isolation (CNF NLL leg / TNOCS leg) to split encoder vs decoder backward
cost.

Remote-tunnel rules: two passes, trust pass 1 (the first timed loop of a
fresh program reads 30-40% high); inputs varied per iteration to defeat
dispatch memoization.

Usage: python tools/profile_train.py   [B=5 T=5 N=1024 ITERS=4]
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
from caspr_tpu.train.loop import make_optimizer, make_train_step

B = int(os.environ.get("B", "5"))
T = int(os.environ.get("T", "5"))
N = int(os.environ.get("N", "1024"))
ITERS = int(os.environ.get("ITERS", "4"))


def sync(o):
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def batch(i):
    # Host-side numpy generation: eager jax.random ops (fold_in/uniform)
    # intermittently raise INVALID_ARGUMENT on the remote axon backend
    # (r4b battery stage 7 traceback) — keep the timing loop free of
    # eager device PRNG work.
    rng = np.random.default_rng(1000 + i)
    x = rng.uniform(size=(B, T, N, 4)).astype(np.float32)
    times = np.sort(rng.uniform(size=(B, T)).astype(np.float32), axis=1)
    times = times - times[:, :1]
    x[..., 3] = times[:, :, None] * 5.0
    tgt = rng.uniform(size=(B, T, N, 4)).astype(np.float32)
    tgt[..., 3] = times[:, :, None]
    return jnp.asarray(x), jnp.asarray(tgt)


def host_key(i):
    """PRNGKey-compatible uint32 pair derived host-side (no eager device
    PRNG dispatch; consumed only inside jitted programs)."""
    rng = np.random.default_rng(7 + i)
    return jnp.asarray(rng.integers(0, 2**32, size=(2,), dtype=np.uint32))


def timeit(name, fn, key, *args):
    """fn(x, tgt, k, *args); inputs regenerated per iteration."""
    del key
    x, tgt = batch(0)
    out = fn(x, tgt, host_key(0), *args)
    sync(out)
    start = time.perf_counter()
    for i in range(1, ITERS + 1):
        x, tgt = batch(i)
        out = fn(x, tgt, host_key(100 + i), *args)
    sync(out)
    dt = (time.perf_counter() - start) / ITERS * 1e3
    print(f"  {name:40s}: {dt:8.1f} ms", flush=True)
    return dt


def main():
    from dataclasses import replace

    from caspr_tpu.train.loop import compute_losses

    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    enc_model = CaSPRModel(replace(cfg, pretrain_tnocs=True))
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)
    tx = make_optimizer(1e-4)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, 0.01, 100.0)

    def loss_of(mdl, p, x, tgt, k):
        out, _ = mdl.forward(p, state, x, tgt, k, training=True)
        return compute_losses(out, 0.01, 100.0)[0]

    def grads_live(mdl):
        # Keep the gradients LIVE in the jitted output (fold them into one
        # scalar): returning value_and_grad(...)[0] lets XLA dead-code-
        # eliminate the whole backward pass, silently timing forward-only.
        def f(x, tgt, k):
            loss, g = jax.value_and_grad(
                lambda p: loss_of(mdl, p, x, tgt, k)
            )(params)
            gsum = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
            return loss, gsum  # both outputs live — backward can't be DCE'd
        return jax.jit(f)

    fwd = jax.jit(lambda x, tgt, k: loss_of(model, params, x, tgt, k))
    vg = grads_live(model)
    vg_enc = grads_live(enc_model)

    # step donates (params, opt_state, mbn_state) — calling it twice with
    # the same arrays dereferences deleted buffers (async INVALID_ARGUMENT
    # at the next sync on axon; r5b battery stage 49 traceback).  Chain the
    # donated carry through iterations, seeded from private copies so the
    # closure originals stay live for fwd/vg on the next pass.
    carry = {
        "v": (
            jax.tree_util.tree_map(jnp.copy, params),
            jax.tree_util.tree_map(jnp.copy, opt_state),
            jax.tree_util.tree_map(jnp.copy, state),
        )
    }

    def full(x, tgt, k):
        p, o, s = carry["v"]
        p2, o2, s2, m = step(p, o, s, x, tgt, k)
        carry["v"] = (p2, o2, s2)
        return m["loss"]

    for p in range(2):
        print(f"--- pass {p}  B={B} T={T} N={N} ---", flush=True)
        timeit("loss forward only", fwd, key)
        timeit("value+grad (full loss)", vg, key)
        timeit("value+grad (encoder/tnocs only)", vg_enc, key)
        timeit("full train step (+Adam)", full, key)


if __name__ == "__main__":
    main()
