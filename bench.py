"""Benchmark: CaSPR inference throughput on the paper protocol.

Measures full reconstruct (encode -> latent ODE -> CNF decode) throughput
in 10-frame x 2048-point sequences/sec on one chip — the reference's
headline eval setting (reference README.md:84, caspr/utils/
evaluations.py:26-27,108-115).

The reference publishes no numbers (BASELINE.md); its executable baseline
is released weights on a 16GB V100 at eval batch 2.  ``VS_BASELINE_REF``
below is our recorded/estimated reference throughput in seqs/sec used for
the ``vs_baseline`` ratio; until a V100 measurement exists it is a
documented estimate (reference inference timing prints ~1-2 s per batch-2
eval step for the CNF-dominated pipeline => ~1 seq/sec).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax

try:
    from caspr_tpu.utils.runtime import enable_compile_cache
except ImportError:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from caspr_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp

VS_BASELINE_REF = 1.0  # estimated reference V100 seqs/sec (see docstring)

BATCH = 16  # throughput batch (saturation point; the reference protocol used 2 on a 16GB V100)
T, N = 10, 2048


def main():
    from caspr_tpu.models import CaSPRConfig, CaSPRModel, caspr_init

    cfg = CaSPRConfig()
    model = CaSPRModel(cfg)
    key = jax.random.PRNGKey(0)
    params, state = caspr_init(key, cfg)

    x = jax.random.uniform(key, (BATCH, T, N, 4))
    times = jnp.broadcast_to(jnp.linspace(0.0, 5.0, T), (BATCH, T))
    x = x.at[..., 3].set(times[:, :, None])
    timestamps = jnp.linspace(0.0, 1.0, T)

    @jax.jit
    def recon(params, state, x, k):
        _, _, pred, _, nfe = model.reconstruct(
            params, state, x, k, num_points=N, timestamps=timestamps
        )
        return pred, nfe

    def sync(arr):
        # 1-element host transfer: reliable sync on the remote TPU backend
        import numpy as _np
        _np.asarray(arr[(0,) * arr.ndim])

    # warmup / compile
    pred, nfe = recon(params, state, x, key)
    sync(pred)

    iters = 5
    start = time.perf_counter()
    for i in range(iters):
        pred, nfe = recon(params, state, x, jax.random.fold_in(key, i))
    sync(pred)  # FIFO device queue: last-result sync covers all iterations
    elapsed = time.perf_counter() - start

    seqs_per_sec = BATCH * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "reconstruct_throughput_10x2048",
                "value": round(seqs_per_sec, 4),
                "unit": "seqs/sec/chip",
                "vs_baseline": round(seqs_per_sec / VS_BASELINE_REF, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
