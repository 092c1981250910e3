"""Golden-value tests for the point-cloud ops against pure-numpy oracles
that literally implement the reference CUDA kernels' documented semantics
(SURVEY.md §2.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caspr_tpu.ops import (
    pairwise_sqdist,
    farthest_point_sampling,
    gather_points,
    ball_query,
    group_points,
    three_nn,
    three_interpolate,
    chamfer_distance,
    approx_match_emd,
)


def np_fps(xyz, m):
    n = xyz.shape[0]
    idxs = np.zeros(m, np.int32)
    min_d = np.full(n, np.inf)
    for i in range(1, m):
        d = np.sum((xyz - xyz[idxs[i - 1]]) ** 2, axis=-1)
        min_d = np.minimum(min_d, d)
        idxs[i] = np.argmax(min_d)
    return idxs


def np_ball_query(xyz, new_xyz, radius, k):
    m = new_xyz.shape[0]
    idx = np.zeros((m, k), np.int32)
    for i in range(m):
        d2 = np.sum((xyz - new_xyz[i]) ** 2, axis=-1)
        hits = np.nonzero(d2 < radius * radius)[0]
        if len(hits) == 0:
            continue
        take = hits[:k]
        idx[i, :] = take[0]
        idx[i, : len(take)] = take
    return idx


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.RandomState(0)
    return rng.randn(2, 64, 3).astype(np.float32) * 0.3


def test_pairwise_sqdist(clouds):
    a, b = clouds[0], clouds[1]
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, None] - b[None]) ** 2, -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fps_matches_oracle(clouds):
    got = np.asarray(farthest_point_sampling(jnp.asarray(clouds), 16))
    for b in range(clouds.shape[0]):
        np.testing.assert_array_equal(got[b], np_fps(clouds[b], 16))


def test_fps_identity_when_m_equals_n():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 3).astype(np.float32)
    idx = np.asarray(farthest_point_sampling(jnp.asarray(x), 16))[0]
    assert sorted(idx.tolist()) == list(range(16))


def test_fps_prefix_property(clouds):
    """FPS on an FPS-ordered gather (same start, index 0) reproduces the
    ordering's prefix — the invariant behind the SA cascade's hierarchical
    FPS collapse (models/pointnet2.py::pointnet2_apply)."""
    x = jnp.asarray(clouds)
    order = farthest_point_sampling(x, 32)
    sub = gather_points(x, order)  # (B, 32, 3) in FPS selection order
    got = np.asarray(farthest_point_sampling(sub, 16))
    for b in range(clouds.shape[0]):
        np.testing.assert_array_equal(got[b], np.arange(16))


def test_fps_prefix_property_with_duplicates(clouds):
    """The prefix property survives exact distance ties (repeat-padded
    clouds duplicate points — the data pipeline's pad mode): at any step
    the subset's lowest-index tie-break selects the lane with the lowest
    FPS-ordering position, which is exactly the point the full-cloud run
    picked at that step."""
    base = clouds[:, :48]
    x = jnp.asarray(np.concatenate([base, base[:, :16]], axis=1))  # 16 dups
    order = farthest_point_sampling(x, 32)
    sub = gather_points(x, order)
    got = np.asarray(farthest_point_sampling(sub, 16))
    for b in range(x.shape[0]):
        np.testing.assert_array_equal(got[b], np.arange(16))


def test_gather_points(clouds):
    idx = np.array([[0, 5, 9], [1, 1, 63]], np.int32)
    got = np.asarray(gather_points(jnp.asarray(clouds), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], clouds[b][idx[b]])


def test_ball_query_matches_oracle(clouds):
    new_xyz = clouds[:, :8, :]
    got = np.asarray(
        ball_query(jnp.asarray(clouds), jnp.asarray(new_xyz), 0.3, 6)
    )
    for b in range(2):
        want = np_ball_query(clouds[b], new_xyz[b], 0.3, 6)
        np.testing.assert_array_equal(got[b], want)


def test_ball_query_empty_ball():
    xyz = np.ones((1, 8, 3), np.float32)
    new_xyz = np.zeros((1, 2, 3), np.float32)
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.1, 4))
    np.testing.assert_array_equal(got, np.zeros((1, 2, 4), np.int32))


def test_group_points_relative_xyz(clouds):
    new_xyz = clouds[:, :4, :]
    feats = np.tile(np.arange(64, dtype=np.float32)[None, :, None], (2, 1, 5))
    idx = ball_query(jnp.asarray(clouds), jnp.asarray(new_xyz), 0.5, 3)
    out = np.asarray(
        group_points(
            jnp.asarray(clouds), jnp.asarray(new_xyz), jnp.asarray(feats), idx
        )
    )
    assert out.shape == (2, 4, 3, 8)
    idx_np = np.asarray(idx)
    for b in range(2):
        for m in range(4):
            for k in range(3):
                np.testing.assert_allclose(
                    out[b, m, k, :3],
                    clouds[b, idx_np[b, m, k]] - new_xyz[b, m],
                    rtol=1e-6,
                )
                np.testing.assert_array_equal(
                    out[b, m, k, 3:], feats[b, idx_np[b, m, k]]
                )


def test_three_nn_and_interpolate(clouds):
    query = clouds
    source = clouds[:, :10, :]
    d2, idx = three_nn(jnp.asarray(query), jnp.asarray(source))
    d2, idx = np.asarray(d2), np.asarray(idx)
    for b in range(2):
        full = np.sum((query[b][:, None] - source[b][None]) ** 2, -1)
        order = np.argsort(full, axis=1)[:, :3]
        np.testing.assert_allclose(
            np.sort(d2[b], axis=1),
            np.sort(np.take_along_axis(full, order, 1), axis=1),
            rtol=1e-5,
            atol=1e-7,
        )
    feats = np.random.RandomState(3).randn(2, 10, 7).astype(np.float32)
    inv = 1.0 / (d2 + 1e-8)
    w = inv / inv.sum(-1, keepdims=True)
    got = np.asarray(
        three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
    )
    want = np.einsum("bnk,bnkc->bnc", w, feats[np.arange(2)[:, None, None], idx])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_chamfer_oracle(clouds):
    a = clouds
    b = clouds[:, ::-1, :] + 0.01
    d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    d1, d2 = np.asarray(d1), np.asarray(d2)
    for i in range(2):
        full = np.sum((a[i][:, None] - b[i][None]) ** 2, -1)
        np.testing.assert_allclose(d1[i], full.min(1), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(d2[i], full.min(0), rtol=1e-5, atol=1e-7)


def test_chamfer_chunked_padding(monkeypatch):
    """Batched chamfer's chunk/pad path (b > chunk, b % chunk != 0) must
    match the full computation exactly, and N != M must hold shape-wise."""
    rng = np.random.RandomState(3)
    a = rng.randn(13, 48, 3).astype(np.float32) * 0.3
    b = rng.randn(13, 32, 3).astype(np.float32) * 0.3
    monkeypatch.setenv("CASPR_TPU_CD_CHUNK", "4")
    d1, d2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b))
    d1, d2 = np.asarray(d1), np.asarray(d2)
    assert d1.shape == (13, 48) and d2.shape == (13, 32)
    for i in range(13):
        full = np.sum((a[i][:, None] - b[i][None]) ** 2, -1)
        np.testing.assert_allclose(d1[i], full.min(1), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(d2[i], full.min(0), rtol=1e-5, atol=1e-7)


def test_chamfer_identical_clouds(clouds):
    d1, d2 = chamfer_distance(jnp.asarray(clouds), jnp.asarray(clouds))
    assert float(jnp.max(d1)) < 1e-9
    assert float(jnp.max(d2)) < 1e-9


def test_emd_identity_near_zero(clouds):
    cost = approx_match_emd(jnp.asarray(clouds), jnp.asarray(clouds))
    # perfect matching exists at cost 0; the annealed approximation should
    # land very close to it
    per_point = np.asarray(cost) / clouds.shape[1]
    assert np.all(per_point < 1e-3), per_point


def test_emd_detects_offset(clouds):
    shifted = clouds + np.array([0.5, 0.0, 0.0], np.float32)
    cost = np.asarray(approx_match_emd(jnp.asarray(clouds), jnp.asarray(shifted)))
    per_point = cost / clouds.shape[1]
    # matching cost per point should be close to the shift distance 0.5
    assert np.all(per_point > 0.4) and np.all(per_point < 0.7), per_point


def test_emd_mass_conservation():
    rng = np.random.RandomState(7)
    a = rng.randn(1, 32, 3).astype(np.float32)
    b = rng.randn(1, 48, 3).astype(np.float32)
    from caspr_tpu.ops.metrics import _approx_match

    match = np.asarray(_approx_match(jnp.asarray(a[0]), jnp.asarray(b[0])))
    # every left point ships (max(n,m)/n) mass, every right point receives
    # (max(n,m)/m); tolerate the algorithm's small residual
    np.testing.assert_allclose(match.sum(1), 48 / 32, rtol=0.05)
    np.testing.assert_allclose(match.sum(0), 1.0, rtol=0.05)


def test_emd_grad_finite(clouds):
    x = jnp.asarray(clouds)
    y = jnp.asarray(clouds + 0.05)
    g = jax.grad(lambda a: jnp.sum(approx_match_emd(a, y)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_three_interpolate_dense_matches_gather(clouds):
    """The MXU interpolation-matrix path (split-precision bf16 passes)
    must agree with the exact gather path to ~2^-18."""
    from caspr_tpu.ops.pointops import _three_interpolate_dense

    rs = np.random.RandomState(7)
    feats = jnp.asarray(rs.randn(2, 16, 33).astype(np.float32) * 10.0)
    idx = jnp.asarray(rs.randint(0, 16, size=(2, 40, 3)).astype(np.int32))
    w = rs.rand(2, 40, 3).astype(np.float32)
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    want = np.einsum(
        "bnk,bnkc->bnc",
        np.asarray(w),
        np.asarray(feats)[np.arange(2)[:, None, None], np.asarray(idx)],
    )
    got = np.asarray(_three_interpolate_dense(feats, idx, w))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-4)
