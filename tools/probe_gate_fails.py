"""Diagnose the two r5 exactness-gate failures.

1. EMD pallas-vs-XLA 1.04e-4 rel (tol was 2e-5, from the r3 'within
   5e-6' measurement): is it a kernel bug, or legitimate accumulation
   noise amplified by the annealed matching's iterative exp/rescale on
   AMBIGUOUS random-vs-random cloud pairs?  Decide by comparing BOTH
   device implementations to a float64 numpy oracle of the same
   algorithm: if their f64-errors are comparable, the divergence is
   noise, not a defect.

2. ball_query fused-d2 31 index mismatches vs the XLA path (r4: 0, but
   on a different RNG stream): are the disagreeing points at the radius
   boundary within f32 rounding (legitimate tie flips), or genuinely
   inside/outside?
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from caspr_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def emd_f64_oracle(x1, x2, num_iters_pow=7):
    """float64 numpy transcription of ops.metrics._approx_match +
    _match_cost (same annealing schedule / epsilons)."""
    n, m = x1.shape[0], x2.shape[0]
    d2 = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
    big = float(max(n, m))
    match = np.zeros((n, m))
    sat_l = np.full((n,), big / n)
    sat_r = np.full((m,), big / m)
    levels = np.concatenate(
        [-np.power(4.0, np.arange(num_iters_pow, -2, -1, dtype=np.float64)),
         np.zeros((1,))])
    for level in levels:
        w = np.exp(level * d2) * sat_r[None, :]
        w_sum = w.sum(1, keepdims=True) + 1e-9
        w = w * (sat_l[:, None] / w_sum)
        col = w.sum(0) + 1e-9
        scale = np.minimum(sat_r / col, 1.0)
        w = w * scale[None, :]
        match = match + w
        sat_l = np.maximum(sat_l - w.sum(1), 0.0)
        sat_r = np.maximum(sat_r - w.sum(0), 0.0)
    d = np.sqrt(np.maximum(d2, 1e-20))
    return (match * d).sum()


def main():
    rng = np.random.default_rng(42)

    # ---- EMD triangulation --------------------------------------------
    from jax import lax

    from caspr_tpu.ops.metrics import (_approx_match, _match_cost,
                                       _emd_fwd_impl)
    bb, n = 4, 2048
    a_np = rng.standard_normal((bb, n, 3)).astype(np.float32) * 0.3
    c_np = rng.standard_normal((bb, n, 3)).astype(np.float32) * 0.3
    a, c = jnp.asarray(a_np), jnp.asarray(c_np)
    got_pl = np.asarray(_emd_fwd_impl(a, c), np.float64)

    def one(args):
        x1, x2 = args
        return _match_cost(x1, x2, _approx_match(x1, x2))

    got_xla = np.asarray(jax.jit(lambda a, c: lax.map(one, (a, c)))(a, c),
                         np.float64)
    ref = np.array([
        emd_f64_oracle(a_np[i].astype(np.float64),
                       c_np[i].astype(np.float64)) for i in range(bb)])
    sc = np.abs(ref).max()
    print("EMD  pallas:", got_pl)
    print("EMD  xla   :", got_xla)
    print("EMD  f64   :", ref)
    print(f"rel(pallas-f64)={np.abs(got_pl - ref).max() / sc:.3e}  "
          f"rel(xla-f64)={np.abs(got_xla - ref).max() / sc:.3e}  "
          f"rel(pallas-xla)={np.abs(got_pl - got_xla).max() / sc:.3e}",
          flush=True)

    # same-cloud pairs (the protocol regime: pred vs gt of the SAME shape,
    # low matching ambiguity)
    c2_np = (a_np + rng.standard_normal(a_np.shape).astype(np.float32)
             * 0.01)
    c2 = jnp.asarray(c2_np)
    got_pl2 = np.asarray(_emd_fwd_impl(a, c2), np.float64)
    got_xla2 = np.asarray(jax.jit(lambda a, c: lax.map(one, (a, c)))(a, c2),
                          np.float64)
    ref2 = np.array([
        emd_f64_oracle(a_np[i].astype(np.float64),
                       c2_np[i].astype(np.float64)) for i in range(bb)])
    sc2 = np.abs(ref2).max()
    print(f"near-identical pairs: rel(pallas-f64)="
          f"{np.abs(got_pl2 - ref2).max() / sc2:.3e}  rel(xla-f64)="
          f"{np.abs(got_xla2 - ref2).max() / sc2:.3e}", flush=True)

    # ---- ball query boundary analysis ---------------------------------
    from caspr_tpu.ops.pointops import ball_query
    rng2 = np.random.default_rng(0)
    # reproduce the gate's stream position approximately: fresh draws are
    # fine — what matters is whether mismatches sit at the boundary
    xyz_np = rng2.random((8, 1024, 3)).astype(np.float32)
    xyz = jnp.asarray(xyz_np)
    qry = xyz[:, :256]
    radius, k = 0.2, 32
    os.environ["CASPR_TPU_FUSED_D2"] = "1"
    ia = np.asarray(ball_query(xyz, qry, radius, k))
    os.environ["CASPR_TPU_FUSED_D2"] = "0"
    ib = np.asarray(ball_query(xyz, qry, radius, k))
    os.environ.pop("CASPR_TPU_FUSED_D2")
    mism = np.argwhere(ia != ib)
    print(f"ball query mismatched slots: {len(mism)} / {ia.size}")
    qn = xyz_np[:, :256]
    worst = 0.0
    for b, m_, s in mism[:50]:
        for idx_val in (ia[b, m_, s], ib[b, m_, s]):
            d2v = ((xyz_np[b, idx_val].astype(np.float64)
                    - qn[b, m_].astype(np.float64)) ** 2).sum()
            gap = abs(d2v - radius * radius)
            worst = max(worst, gap)
            print(f"  b={b} m={m_} slot={s} idx={idx_val} d2={d2v:.9f} "
                  f"r2={radius*radius:.9f} |gap|={gap:.3e}")
    print(f"worst |d2-r2| among mismatches: {worst:.3e}", flush=True)


if __name__ == "__main__":
    main()
