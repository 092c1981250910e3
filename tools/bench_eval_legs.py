"""Per-leg wall-clock of the shape-recon eval protocol at batch scale:
reconstruct (encode + latent ODE + CNF decode), Chamfer, and EMD, each
timed separately at the shapes utils/evaluations.py issues them.

Usage: B=30 python tools/bench_eval_legs.py   (B = eval pair batch)
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

from caspr_tpu.ops.metrics import approx_match_emd, chamfer_distance

B = int(os.environ.get("B", "30"))  # cloud pairs per eval batch
T, N = 10, 2048


def sync(o):
    for leaf in jax.tree_util.tree_leaves(o):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, mk_args, iters=5):
    out = fn(*mk_args(0))
    sync(out)
    start = time.perf_counter()
    for i in range(1, iters + 1):
        out = fn(*mk_args(i))
    sync(out)
    return (time.perf_counter() - start) / iters


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    base1 = rng.standard_normal((B, N, 3)).astype(np.float32) * 0.3
    base2 = rng.standard_normal((B, N, 3)).astype(np.float32) * 0.3

    def mk(i):
        return (jnp.asarray(base1 + i * 1e-6), jnp.asarray(base2))

    t_cd = timeit(jax.jit(chamfer_distance), mk)
    print(f"chamfer  B={B} N={N}: {t_cd*1e3:8.1f} ms")
    t_emd = timeit(jax.jit(approx_match_emd), mk)
    print(f"emd      B={B} N={N}: {t_emd*1e3:8.1f} ms")

    # reconstruct leg at the matching number of sequences (the observed
    # eval reconstructs nseq sequences then scores their B = nseq*T
    # frame pairs)
    from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init
    from caspr_tpu.train.checkpoint import load_checkpoint, load_weights

    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "demo_trained.pkl")
    tag = "random-init"
    if os.path.exists(ckpt):
        ck = load_checkpoint(ckpt)
        params = load_weights(params, ck["params"])
        state = jax.tree_util.tree_map(jnp.asarray, ck["state"])
        tag = "trained"

    nseq = max(1, B // T)
    x = jax.random.uniform(key, (nseq, T, N, 4))
    times = jnp.broadcast_to(jnp.linspace(0.0, 5.0, T), (nseq, T))
    x = x.at[..., 3].set(times[:, :, None])
    timestamps = jnp.linspace(0.0, 1.0, T)

    @jax.jit
    def recon(p):
        _, _, pred, _, _ = model.reconstruct(
            params, state, p, key, num_points=N, timestamps=timestamps)
        return pred

    def mk_r(i):
        return (x + i * 1e-6,)

    t_rec = timeit(recon, mk_r)
    print(f"reconstruct {nseq} seqs x {T}x{N} ({tag}): {t_rec*1e3:8.1f} ms")
    print(f"per eval batch of {B} pairs: recon {t_rec*1e3:.1f} "
          f"cd {t_cd*1e3:.1f} emd {t_emd*1e3:.1f} ms")


if __name__ == "__main__":
    main()
