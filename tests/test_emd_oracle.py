"""Value-level fidelity of the approx-EMD against a literal numpy
transcription of the approxmatch CUDA algorithm (Fan et al., "A Point Set
Generation Network for 3D Object Reconstruction from a Single Image", CVPR
2017 -- the kernel behind the reference's PyTorchEMD dependency, reference
caspr/utils/emd.py:5-46), plus protocol-scale gradient coverage.

EMD is the paper's headline metric; these tests pin our annealed-matching
re-derivation to the kernel's exact algorithm (annealing schedule, update
order, epsilon placement, capacity semantics) at the real protocol size
N=M=2048 on realistic demo-car clouds, not just at toy sizes.
"""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caspr_tpu.ops import approx_match_emd
from caspr_tpu.ops.metrics import _approx_match, _match_cost

DEMO_GLOB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "demo",
    "*",
    "*",
    "*frame*.npz",
)


def cuda_approxmatch_oracle(xyz1, xyz2):
    """Numpy transcription of the approxmatch CUDA kernel's algorithm.

    Per annealing round (level = -4^j for j = 7..-1, then 0), the kernel
    runs three parallel phases:
      1. each left point k computes ratioL[k] = remainL[k] /
         (1e-9 + sum_l exp(level*d2[k,l]) * remainR[l])
      2. each right point l computes its demanded mass
         sumr[l] = remainR[l] * sum_k exp(level*d2[k,l]) * ratioL[k],
         a consumption ratio min(remainR[l]/(sumr[l]+1e-9), 1), and
         decrements remainR[l] by the (unscaled) demand, clamped at 0
      3. each left point k accumulates match[k,l] +=
         exp(level*d2[k,l]) * ratioL[k] * consumption[l]*remainR_old[l]
         and decrements remainL[k] by the shipped mass, clamped at 0.

    Capacities are 1 on the larger side and max(n,m)/min(n,m) on the
    smaller so total shipped mass matches.  Each phase is an independent
    parallel loop in the kernel, so vectorizing it per phase is exact.
    """
    xyz1 = np.asarray(xyz1, np.float64)
    xyz2 = np.asarray(xyz2, np.float64)
    n, m = xyz1.shape[0], xyz2.shape[0]
    big = float(max(n, m))
    remain_l = np.full(n, big / n)
    remain_r = np.full(m, big / m)
    match = np.zeros((n, m))
    d2 = ((xyz1[:, None, :] - xyz2[None, :, :]) ** 2).sum(-1)
    for j in range(7, -3, -1):
        level = 0.0 if j == -2 else -(4.0 ** j)
        aff = np.exp(level * d2)
        # phase 1
        suml = 1e-9 + (aff * remain_r[None, :]).sum(1)
        ratio_l = remain_l / suml
        # phase 2
        demand = (aff * ratio_l[:, None]).sum(0) * remain_r
        consumption = np.minimum(remain_r / (demand + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = np.maximum(0.0, remain_r - demand)
        # phase 3
        w = aff * ratio_l[:, None] * ratio_r[None, :]
        match += w
        remain_l = np.maximum(0.0, remain_l - w.sum(1))
    return match


def oracle_cost(xyz1, xyz2, match):
    d = np.sqrt(
        np.maximum(((xyz1[:, None, :] - xyz2[None, :, :]) ** 2).sum(-1), 1e-20)
    )
    return (match * d).sum()


def _demo_cloud(frame_idx, num_pts, seed):
    frames = sorted(glob.glob(DEMO_GLOB))
    assert frames, "demo data missing"
    pts = np.load(frames[frame_idx % len(frames)])["nocs_data"]
    rng = np.random.RandomState(seed)
    take = rng.choice(pts.shape[0], num_pts, replace=False)
    return pts[take].astype(np.float32)


@pytest.mark.parametrize("n,m", [(64, 64), (64, 96), (96, 64)])
def test_match_equals_cuda_oracle_small(n, m):
    rng = np.random.RandomState(11)
    a = rng.rand(n, 3).astype(np.float32)
    b = rng.rand(m, 3).astype(np.float32)
    want = cuda_approxmatch_oracle(a, b)
    got = np.asarray(_approx_match(jnp.asarray(a), jnp.asarray(b)))
    # f32 vs f64: exp(level*d2) underflows differently in the extremely
    # peaked early rounds, moving O(1e-4) mass on isolated pairs
    np.testing.assert_allclose(got, want, atol=1e-3)
    want_cost = oracle_cost(a, b, want)
    got_cost = float(_match_cost(jnp.asarray(a), jnp.asarray(b), jnp.asarray(got)))
    np.testing.assert_allclose(got_cost, want_cost, rtol=1e-3)


def test_emd_equals_cuda_oracle_protocol_scale():
    """Protocol size (N=M=2048, evaluations.py:26-27) on realistic clouds:
    a predicted-like (jittered) cloud vs the GT demo-car cloud."""
    gt = _demo_cloud(0, 2048, seed=0)
    pred = _demo_cloud(1, 2048, seed=1)
    pred = pred + np.random.RandomState(2).randn(2048, 3).astype(np.float32) * 0.01

    want_match = cuda_approxmatch_oracle(pred, gt)
    want = oracle_cost(pred, gt, want_match) / 2048.0

    got = float(
        approx_match_emd(jnp.asarray(pred[None]), jnp.asarray(gt[None]))[0]
    ) / 2048.0
    # f32 vs f64 and exp-sum ordering: sub-0.5% agreement required, well
    # inside the 1% parity budget the metric guards (BASELINE.md)
    np.testing.assert_allclose(got, want, rtol=5e-3)
    assert want > 1e-4  # non-degenerate matching cost


def test_emd_identical_clouds_protocol_scale():
    gt = _demo_cloud(2, 2048, seed=3)
    got = float(
        approx_match_emd(jnp.asarray(gt[None]), jnp.asarray(gt[None]))[0]
    ) / 2048.0
    want_match = cuda_approxmatch_oracle(gt, gt)
    want = oracle_cost(gt, gt, want_match) / 2048.0
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5)
    # the annealed approximation's own residual at this density: ~3.6e-3
    # per point on identical clouds (the CUDA oracle gives the same value,
    # asserted above) — NOT zero like exact EMD
    assert got < 6e-3


def test_emd_grad_runs_at_protocol_scale():
    """The backward must not materialize (B, N, M, 3); chunked like the
    forward it runs at the full protocol shape."""
    gt = _demo_cloud(0, 2048, seed=4)
    pred = _demo_cloud(1, 2048, seed=5)
    x = jnp.asarray(np.stack([pred, pred + 0.01]))
    y = jnp.asarray(np.stack([gt, gt]))
    g = jax.grad(lambda a: jnp.sum(approx_match_emd(a, y)))(x)
    g = np.asarray(g)
    assert g.shape == (2, 2048, 3)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0


def test_emd_grad_matches_constant_match_semantics():
    """matchcost_backward treats the match as constant; check against the
    analytic constant-match gradient on a small pair."""
    rng = np.random.RandomState(13)
    a = rng.rand(32, 3).astype(np.float32)
    b = rng.rand(32, 3).astype(np.float32)
    match = np.asarray(_approx_match(jnp.asarray(a), jnp.asarray(b)))

    diff = a[:, None, :] - b[None, :, :]
    d = np.sqrt(np.maximum((diff ** 2).sum(-1), 1e-20))
    want = ((match / d)[..., None] * diff).sum(1)

    g = jax.grad(
        lambda x: jnp.sum(approx_match_emd(x[None], jnp.asarray(b[None])))
    )(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-3, atol=5e-4)
