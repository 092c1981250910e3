"""On-device point-cloud metrics: Chamfer distance and approximate EMD.

Replaces the reference's two external CUDA metric kernels:
  - tk3dv ChamferDistance (reference caspr/utils/evaluations.py:23,40-43):
    two-way squared nearest-neighbor distances.
  - PyTorchEMD approxmatch (reference caspr/utils/emd.py:11-20): an
    annealed proportional-assignment approximation of the earth mover's
    distance (Fan et al., "A Point Set Generation Network...", CVPR 2017).

Both are expressed as static-shape XLA programs; the pairwise-distance work
is MXU/VPU friendly and batches are processed with lax.map to bound the
(N x M) intermediate to a few frames at a time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .pointops import pairwise_sqdist


def chamfer_distance(pred, gt):
    """Two-way squared-NN distances.

    pred: (B, N, 3), gt: (B, M, 3) -> (dist1 (B, N), dist2 (B, M)):
    dist1[i] = min_j ||pred_i - gt_j||^2 and vice versa, matching the tk3dv
    CUDA ChamferDistance used at reference caspr/utils/evaluations.py:40.
    The caller takes per-cloud means and sums both directions
    (evaluations.py:41-43).

    Select-then-refine: the NN *index* comes from the MXU-friendly
    |a|^2+|b|^2-2ab expansion at HIGHEST precision (vmapped over a chunk
    of pairs — the r3 version lax.map'ed the exact elementwise-difference
    form one pair at a time and the (N, M, 3) diff tensor made the
    chamfer leg cost ~75 ms per 30-pair eval batch, ~matching the whole
    reconstruction); the returned *value* is the exact diff-form distance
    to the selected neighbor, so the expansion's ~1e-7 absolute noise can
    only perturb tie-scale selections — the reported min exceeds the true
    min by at most 2x that noise (<0.01% of a CD x1000 ~7 metric), while
    the values themselves stay exactly cancellation-free (critical: NN
    distances here live at the 1e-3 scale where the raw expansion loses
    ~half its digits).
    """
    b = pred.shape[0]
    chunk = _metric_chunk(b)

    def one(args):
        p, g = args  # (chunk, N, 3), (chunk, M, 3)
        ab = jax.lax.dot_general(
            p, g, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (chunk, N, M)
        d2 = (
            jnp.sum(p * p, axis=-1)[:, :, None]
            + jnp.sum(g * g, axis=-1)[:, None, :]
            - 2.0 * ab
        )
        i1 = jnp.argmin(d2, axis=2).astype(jnp.int32)  # (chunk, N)
        i2 = jnp.argmin(d2, axis=1).astype(jnp.int32)  # (chunk, M)
        from .pointops import gather_points

        nn1 = gather_points(g, i1)  # (chunk, N, 3)
        nn2 = gather_points(p, i2)  # (chunk, M, 3)
        return (
            jnp.sum((p - nn1) ** 2, axis=-1),
            jnp.sum((g - nn2) ** 2, axis=-1),
        )

    if chunk == b:
        return one((pred, gt))
    pad = -b % chunk
    if pad:
        pred = jnp.concatenate([pred, pred[:pad]], axis=0)
        gt = jnp.concatenate([gt, gt[:pad]], axis=0)
    n, m = pred.shape[1], gt.shape[1]
    d1, d2 = lax.map(
        one,
        (
            pred.reshape(-1, chunk, n, 3),
            gt.reshape(-1, chunk, m, 3),
        ),
    )
    return d1.reshape(-1, n)[:b], d2.reshape(-1, m)[:b]


def _metric_chunk(b: int) -> int:
    """Pairs per vmapped metric chunk: bounds the (chunk, N, M) distance
    tensor (~16 MB per pair at the 2048x2048 protocol) while amortizing
    dispatch.  CASPR_TPU_CD_CHUNK overrides.  Default 4 from the r4
    hardware sweep (battery2 stages 21/22: chunk 4 -> 47.3 ms, 30 ->
    48.3, 10 -> 60.1 per 30-pair protocol batch)."""
    import os

    try:
        c = int(os.environ.get("CASPR_TPU_CD_CHUNK", "4"))
    except ValueError:
        c = 4
    return max(1, min(c, b))


def _approx_match(xyz1, xyz2, num_iters_pow: int = 7):
    """Annealed soft matching between two clouds.

    xyz1: (N, 3), xyz2: (M, 3) -> match (N, M), rows ~ xyz1 points.

    Follows the approxmatch algorithm of the PointSetGeneration /
    PyTorchEMD kernel: temperatures anneal from extremely peaked
    (level = -4^7, essentially nearest-neighbor assignment) to uniform
    (level = 0), and at each round every unsaturated left point distributes
    its remaining mass over right points proportionally to
    exp(level * d^2) * remaining-right-capacity, then flows are rescaled so
    no right point exceeds its capacity.  Capacities are max(N,M)/N on the
    left and max(N,M)/M on the right so total mass matches.
    """
    n, m = xyz1.shape[0], xyz2.shape[0]
    d2 = pairwise_sqdist(xyz1, xyz2)  # (N, M)
    big = float(max(n, m))
    factor_l = big / n
    factor_r = big / m

    def round_body(carry, level):
        match, sat_l, sat_r = carry
        # left points spread remaining mass by annealed affinity x right cap
        w = jnp.exp(level * d2) * sat_r[None, :]  # (N, M)
        w_sum = jnp.sum(w, axis=1, keepdims=True) + 1e-9
        w = w * (sat_l[:, None] / w_sum)
        # rescale so right capacities are not exceeded
        col = jnp.sum(w, axis=0) + 1e-9
        scale = jnp.minimum(sat_r / col, 1.0)
        w = w * scale[None, :]
        match = match + w
        sat_l = jnp.maximum(sat_l - jnp.sum(w, axis=1), 0.0)
        sat_r = jnp.maximum(sat_r - jnp.sum(w, axis=0), 0.0)
        return (match, sat_l, sat_r), None

    levels = jnp.concatenate(
        [
            -jnp.power(4.0, jnp.arange(num_iters_pow, -2, -1, dtype=d2.dtype)),
            jnp.zeros((1,), d2.dtype),
        ]
    )
    init = (
        jnp.zeros_like(d2),
        jnp.full((n,), factor_l, d2.dtype),
        jnp.full((m,), factor_r, d2.dtype),
    )
    (match, _, _), _ = lax.scan(round_body, init, levels)
    return match


def _match_cost(xyz1, xyz2, match):
    """sum_ij match_ij * ||xyz1_i - xyz2_j|| (euclidean, not squared)."""
    d2 = pairwise_sqdist(xyz1, xyz2)
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    return jnp.sum(match * d)


@jax.custom_vjp
def approx_match_emd(xyz1, xyz2):
    """Approximate earth mover's distance per cloud pair.

    xyz1: (B, N, 3), xyz2: (B, M, 3) -> cost (B,).

    Matches the call contract of reference caspr/utils/emd.py:24-45 in BNC
    format (the eval divides by N afterwards, evaluations.py:46-47).  The
    gradient treats the match as constant, like matchcost_backward.
    """
    return _emd_fwd_impl(xyz1, xyz2)


def _emd_fwd_impl(xyz1, xyz2):
    from .pointops import _use_pallas

    n, m = xyz1.shape[1], xyz2.shape[1]
    if _use_pallas() and xyz1.dtype == jnp.float32:
        from .emd_pallas import approx_match_emd_pallas, can_emd_pallas

        if can_emd_pallas(n, m):
            return approx_match_emd_pallas(xyz1, xyz2)

    def one(args):
        a, b = args
        return _match_cost(a, b, _approx_match(a, b))

    return lax.map(one, (xyz1, xyz2))


def _emd_fwd(xyz1, xyz2):
    def one(args):
        a, b = args
        match = _approx_match(a, b)
        return _match_cost(a, b, match), match

    cost, match = lax.map(one, (xyz1, xyz2))
    return cost, (xyz1, xyz2, match)


def _emd_bwd(res, g):
    """Chunked like the forward: one (N, M, 3) difference tensor per cloud
    pair via lax.map, never the full (B, N, M, 3) batch at once (at the
    protocol scale B*T=160, N=M=2048 the unchunked form is ~8 GB)."""
    xyz1, xyz2, match = res

    def one(args):
        a, b, m = args
        diff = a[:, None, :] - b[None, :, :]  # (N, M, 3)
        d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-20))
        grad_pair = (m / d)[..., None] * diff  # d||a-b||/da weighted by flow
        return jnp.sum(grad_pair, axis=1), jnp.sum(grad_pair, axis=0)

    g1, g2 = lax.map(one, (xyz1, xyz2, match))
    return g[:, None, None] * g1, -g[:, None, None] * g2


approx_match_emd.defvjp(_emd_fwd, _emd_bwd)
