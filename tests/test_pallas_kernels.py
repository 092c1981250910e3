"""Pallas kernel tests, run through the TPU interpreter on CPU so the
kernels are exercised without hardware (SURVEY.md §4 plan)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from caspr_tpu.ops.pointops import (
    ball_query,
    farthest_point_sampling_xla,
    three_nn,
)
from caspr_tpu.ops.pallas_kernels import (
    ball_query_pallas,
    farthest_point_sampling_pallas,
    three_nn_pallas,
)


def test_fps_pallas_matches_xla_interpret():
    rng = np.random.RandomState(0)
    xyz = jnp.asarray(rng.randn(3, 160, 3).astype(np.float32) * 0.4)
    want = np.asarray(farthest_point_sampling_xla(xyz, 40))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(farthest_point_sampling_pallas(xyz, 40))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_identity_shortcut():
    rng = np.random.RandomState(1)
    xyz = jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))
    got = np.asarray(farthest_point_sampling_pallas(xyz, 16))
    np.testing.assert_array_equal(got, np.tile(np.arange(16), (2, 1)))


def test_ball_query_pallas_matches_xla_interpret():
    rng = np.random.RandomState(2)
    xyz = jnp.asarray(rng.randn(3, 200, 3).astype(np.float32) * 0.3)
    cent = xyz[:, :48]
    want = np.asarray(ball_query(xyz, cent, 0.3, 6))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ball_query_pallas(xyz, cent, 0.3, 6))
    np.testing.assert_array_equal(got, want)


def test_fused_d2_matches_legacy_interpret(monkeypatch):
    """Both distance orientations (fused in-kernel coords / legacy XLA
    (B, M, N) materialization) must select identical neighbors."""
    from caspr_tpu.ops.pallas_kernels import three_nn_pallas

    rng = np.random.RandomState(21)
    xyz = jnp.asarray(rng.randn(2, 200, 3).astype(np.float32) * 0.3)
    cent = xyz[:, :48]
    q = jnp.asarray(rng.randn(2, 120, 3).astype(np.float32) * 0.4)
    s = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32) * 0.4)
    got = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("CASPR_TPU_FUSED_D2", mode)
        with pltpu.force_tpu_interpret_mode():
            bq = np.asarray(ball_query_pallas(xyz, cent, 0.3, 6))
            nnd, nni = three_nn_pallas(q, s)
        got[mode] = (bq, np.asarray(nnd), np.asarray(nni))
    np.testing.assert_array_equal(got["1"][0], got["0"][0])
    np.testing.assert_array_equal(got["1"][2], got["0"][2])
    np.testing.assert_allclose(got["1"][1], got["0"][1], atol=1e-6)


def test_ball_query_pallas_odd_k_interpret():
    """Odd K exercises the tail of the two-slots-per-row-sum decode (the
    final iteration's hi slot lands in a padding column)."""
    rng = np.random.RandomState(7)
    xyz = jnp.asarray(rng.randn(2, 150, 3).astype(np.float32) * 0.3)
    cent = xyz[:, :32]
    for k in (3, 5, 7):
        want = np.asarray(ball_query(xyz, cent, 0.35, k))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(ball_query_pallas(xyz, cent, 0.35, k))
        np.testing.assert_array_equal(got, want)


def test_ball_query_pallas_empty_ball_interpret():
    xyz = jnp.ones((1, 40, 3), jnp.float32)
    cent = jnp.zeros((1, 8, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ball_query_pallas(xyz, cent, 0.05, 4))
    np.testing.assert_array_equal(got, np.zeros((1, 8, 4), np.int32))


def test_three_nn_pallas_matches_xla_interpret():
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 120, 3).astype(np.float32) * 0.4)
    s = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32) * 0.4)
    want_d, want_i = three_nn(q, s)
    with pltpu.force_tpu_interpret_mode():
        got_d, got_i = three_nn_pallas(q, s)
    np.testing.assert_allclose(
        np.sort(np.asarray(got_d), axis=-1),
        np.sort(np.asarray(want_d), axis=-1),
        rtol=1e-5,
        atol=1e-7,
    )
    # index sets must agree (ordering may differ on exact ties only)
    np.testing.assert_array_equal(
        np.sort(np.asarray(got_i), axis=-1), np.sort(np.asarray(want_i), axis=-1)
    )


def test_gather_rows_pallas_exact_interpret():
    rng = np.random.RandomState(7)
    src = jnp.asarray(rng.randn(3, 200, 9).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 200, size=(3, 77)).astype(np.int32))
    from caspr_tpu.ops.pallas_kernels import gather_rows_pallas

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gather_rows_pallas(src, idx))
    want = np.asarray(
        jnp.take_along_axis(src, idx[:, :, None], axis=1)
    )
    np.testing.assert_array_equal(got, want)  # bit-exact row copies


def test_gather_rows_split_matches_onehot_interpret(monkeypatch):
    """Both kernel orientations (split one-bf16-pass / HIGHEST one-hot)
    must produce bit-exact row copies, including out-of-range clamping."""
    from caspr_tpu.ops.pallas_kernels import gather_rows_pallas

    rng = np.random.RandomState(11)
    src = jnp.asarray(rng.randn(2, 160, 13).astype(np.float32))
    idx_np = rng.randint(-5, 170, size=(2, 90)).astype(np.int32)  # o-o-r too
    idx = jnp.asarray(idx_np)
    want = np.asarray(
        jnp.take_along_axis(src, jnp.clip(idx, 0, 159)[:, :, None], axis=1)
    )
    for mode in ("split", "onehot", "dma", "shuf"):
        monkeypatch.setenv("CASPR_TPU_GATHER", mode)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(gather_rows_pallas(src, idx))
        np.testing.assert_array_equal(got, want)

    # blk is retired from dispatch (Mosaic rejects it at every tested
    # shape on hardware, r3 battery) — must fail loudly, not crash deep
    # in a remote compile
    monkeypatch.setenv("CASPR_TPU_GATHER", "blk")
    with pytest.raises(ValueError, match="retired"):
        gather_rows_pallas(src, idx)


def test_gather_rows_dma_wide_channels_interpret(monkeypatch):
    """The DMA orientation has no C limit (source stays in HBM); check a
    >32-channel gather at a non-128-multiple width is bit-exact."""
    from caspr_tpu.ops.pallas_kernels import gather_rows_pallas

    rng = np.random.RandomState(3)
    src = jnp.asarray(rng.randn(2, 300, 99).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 300, size=(2, 513)).astype(np.int32))
    monkeypatch.setenv("CASPR_TPU_GATHER", "dma")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gather_rows_pallas(src, idx))
    want = np.asarray(jnp.take_along_axis(src, idx[:, :, None], axis=1))
    np.testing.assert_array_equal(got, want)


def test_gather_rows_pallas_grad_interpret(monkeypatch):
    """The custom VJP (scatter-add transpose) must match the XLA gather's
    gradient exactly — for every kernel orientation (training
    differentiates the C<=32 gathers, so each orientation's grad path is
    live when selected)."""
    from caspr_tpu.ops.pallas_kernels import gather_rows_pallas

    rng = np.random.RandomState(12)
    src = jnp.asarray(rng.randn(2, 64, 5).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, size=(2, 40)).astype(np.int32))
    ct = jnp.asarray(rng.randn(2, 40, 5).astype(np.float32))

    def loss_pl(s):
        return jnp.sum(gather_rows_pallas(s, idx) * ct)

    def loss_xla(s):
        return jnp.sum(jnp.take_along_axis(s, idx[:, :, None], axis=1) * ct)

    g_xla = np.asarray(jax.grad(loss_xla)(src))
    for mode in ("split", "onehot", "dma", "shuf"):
        monkeypatch.setenv("CASPR_TPU_GATHER", mode)
        with pltpu.force_tpu_interpret_mode():
            g_pl = np.asarray(jax.grad(loss_pl)(src))
        np.testing.assert_allclose(g_pl, g_xla, rtol=0, atol=1e-6,
                                   err_msg=mode)


def test_three_interpolate_pallas_matches_dense_interpret():
    """The fused interpolation kernel must match the dense XLA path
    (same 4-product bf16 precision scheme) in values and gradients."""
    from caspr_tpu.ops.pallas_kernels import three_interpolate_pallas
    from caspr_tpu.ops.pointops import _three_interpolate_dense

    rng = np.random.RandomState(13)
    feats = jnp.asarray(rng.randn(2, 50, 70).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 50, size=(2, 90, 3)).astype(np.int32))
    w = jax.nn.softmax(
        jnp.asarray(rng.rand(2, 90, 3).astype(np.float32)), axis=-1)
    want = np.asarray(_three_interpolate_dense(feats, idx, w))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(three_interpolate_pallas(feats, idx, w))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)

    ct = jnp.asarray(rng.randn(2, 90, 70).astype(np.float32))

    def loss_pl(f, ww):
        return jnp.sum(three_interpolate_pallas(f, idx, ww) * ct)

    def loss_dense(f, ww):
        return jnp.sum(_three_interpolate_dense(f, idx, ww) * ct)

    with pltpu.force_tpu_interpret_mode():
        gf_pl, gw_pl = jax.grad(loss_pl, argnums=(0, 1))(feats, w)
    gf_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_pl), np.asarray(gf_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_pl), np.asarray(gw_d), atol=1e-6)


def test_three_interpolate_shuf_matches_exact_interpret():
    """The shuf interpolation orientation (exact f32 lane-shuffle
    gathers + f32 VPU MAC) must match an exact f64 oracle to f32
    rounding, and its gradients the dense composition's."""
    from caspr_tpu.ops.pallas_kernels import three_interpolate_shuf
    from caspr_tpu.ops.pointops import _three_interpolate_dense

    rng = np.random.RandomState(14)
    feats_np = rng.randn(2, 50, 70).astype(np.float32)
    idx_np = rng.randint(0, 50, size=(2, 90, 3)).astype(np.int32)
    w_np = rng.rand(2, 90, 3).astype(np.float32)
    w_np /= w_np.sum(-1, keepdims=True)
    feats, idx, w = map(jnp.asarray, (feats_np, idx_np, w_np))
    ref = np.einsum(
        "bnj,bnjc->bnc",
        w_np.astype(np.float64),
        np.take_along_axis(
            feats_np.astype(np.float64)[:, None],
            idx_np[..., None].transpose(0, 2, 1, 3), axis=2
        ).transpose(0, 2, 1, 3),
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(three_interpolate_shuf(feats, idx, w))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)

    ct = jnp.asarray(rng.randn(2, 90, 70).astype(np.float32))

    def loss_sh(f, ww):
        return jnp.sum(three_interpolate_shuf(f, idx, ww) * ct)

    def loss_dense(f, ww):
        return jnp.sum(_three_interpolate_dense(f, idx, ww) * ct)

    with pltpu.force_tpu_interpret_mode():
        gf_s, gw_s = jax.grad(loss_sh, argnums=(0, 1))(feats, w)
    gf_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gf_s), np.asarray(gf_d), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_d), atol=1e-6)


def test_gather_points_group_points_dispatch_interpret(monkeypatch):
    """group_points through the Pallas gather must equal the XLA path."""
    from caspr_tpu.ops.pointops import ball_query_xla, group_points

    rng = np.random.RandomState(8)
    xyz = jnp.asarray(rng.rand(2, 128, 3).astype(np.float32))
    new_xyz = xyz[:, :32]
    feats = jnp.asarray(rng.randn(2, 128, 5).astype(np.float32))
    idx = ball_query_xla(xyz, new_xyz, 0.3, 8)

    monkeypatch.setenv("CASPR_TPU_KERNELS", "xla")
    want = np.asarray(group_points(xyz, new_xyz, feats, idx))
    monkeypatch.setenv("CASPR_TPU_KERNELS", "pallas")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(group_points(xyz, new_xyz, feats, idx))
    np.testing.assert_array_equal(got, want)

    # opt-in DMA orientation for all channel widths, value + gradient
    monkeypatch.setenv("CASPR_TPU_GATHER_DMA_ALLC", "1")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(group_points(xyz, new_xyz, feats, idx))

        def loss(f):
            return jnp.sum(group_points(xyz, new_xyz, f, idx) ** 2)

        g_got = np.asarray(jax.grad(loss)(feats))
    np.testing.assert_array_equal(got, want)
    monkeypatch.setenv("CASPR_TPU_KERNELS", "xla")
    g_want = np.asarray(jax.grad(loss)(feats))
    np.testing.assert_allclose(g_got, g_want, rtol=1e-6, atol=1e-6)


def test_split3_bf16_exact_reconstruction():
    """The masked 3-way split must reconstruct f32 bit-exactly and emit
    bf16-representable components.  The split is built with bit masks
    rather than casts because the TPU backend's forced
    --xla_allow_excess_precision elides f32->bf16->f32 cast round-trips,
    zeroing the mid/lo components (the r3 'split gather WRONG on
    hardware' bug — invisible to CPU tests, gated on hardware by
    tools/hw_exactness.py; this test pins the construction itself)."""
    from caspr_tpu.ops.pallas_kernels import split3_bf16

    rng = np.random.RandomState(0)
    t = np.concatenate([
        rng.randn(4096).astype(np.float32) * 4,
        rng.randn(1024).astype(np.float32) * 1e-6,
        rng.randn(1024).astype(np.float32) * 1e6,
        np.array([0.0, -0.0, 1.0, -1.0, np.pi], np.float32),
    ])
    hi, mid, lo = split3_bf16(jnp.asarray(t))
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    h = np.asarray(hi).astype(np.float32)
    m = np.asarray(mid).astype(np.float32)
    l = np.asarray(lo).astype(np.float32)
    # bit-exact reconstruction, in EVERY association order (each
    # component owns a disjoint 8-bit mantissa slice)
    np.testing.assert_array_equal(h + m + l, t)
    np.testing.assert_array_equal(h + (m + l), t)
    np.testing.assert_array_equal((h + l) + m, t)


def test_split2_bf16_residual_bound():
    from caspr_tpu.ops.pallas_kernels import split2_bf16

    rng = np.random.RandomState(1)
    t = rng.randn(8192).astype(np.float32) * 4
    hi, lo = split2_bf16(jnp.asarray(t))
    recon = np.asarray(hi).astype(np.float32) + np.asarray(lo).astype(
        np.float32)
    err = np.abs(recon - t) / np.maximum(np.abs(t), 1e-30)
    assert err.max() < 2.0 ** -16


def test_gather_dma_requires_lane_aligned_c():
    """The DMA orientation trace-time guard: sub-128-lane C must raise
    outside interpret mode (Mosaic rejects the row copies on hardware,
    r3 battery) instead of surfacing a remote HTTP-500 compile error."""
    from caspr_tpu.ops import pallas_kernels as pk

    src = jnp.zeros((1, 16, 13), jnp.float32)
    idx = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="128"):
        pk._gather_rows_dma_call(src, idx)


def test_gather_dma_dispatch_falls_back_unaligned(monkeypatch):
    """A global CASPR_TPU_GATHER=dma flip must keep unaligned-C sites
    runnable via the split kernel rather than raising at the C=3 xyz
    gathers (only lane-aligned C reaches the DMA kernel on hardware)."""
    from caspr_tpu.ops.pallas_kernels import gather_rows_pallas

    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randn(2, 64, 13).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, size=(2, 40)).astype(np.int32))
    monkeypatch.setenv("CASPR_TPU_GATHER", "dma")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(gather_rows_pallas(src, idx))  # dma (interpret ok)
    want = np.asarray(jnp.take_along_axis(src, idx[:, :, None], axis=1))
    np.testing.assert_array_equal(got, want)


def test_ball_query_pair_matches_two_calls_interpret(monkeypatch):
    """The dual-radius fused kernel must reproduce BOTH single-radius
    ball queries exactly (same d2 path, shared packed prefix sum)."""
    from caspr_tpu.ops.pallas_kernels import (
        ball_query_pair_pallas,
        ball_query_pallas,
    )

    rng = np.random.RandomState(21)
    xyz = jnp.asarray(rng.rand(3, 192, 3).astype(np.float32))
    new_xyz = xyz[:, :48]
    r1, k1, r2, k2 = 0.1, 4, 0.25, 8
    with pltpu.force_tpu_interpret_mode():
        i1, i2 = ball_query_pair_pallas(xyz, new_xyz, r1, k1, r2, k2)
        w1 = ball_query_pallas(xyz, new_xyz, r1, k1)
        w2 = ball_query_pallas(xyz, new_xyz, r2, k2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(w1))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(w2))

    # dispatch entry: pair == two XLA singles on CPU fallback
    from caspr_tpu.ops.pointops import ball_query_pair, ball_query_xla

    monkeypatch.setenv("CASPR_TPU_KERNELS", "xla")
    a1, a2 = ball_query_pair(xyz, new_xyz, r1, k1, r2, k2)
    np.testing.assert_array_equal(
        np.asarray(a1), np.asarray(ball_query_xla(xyz, new_xyz, r1, k1)))
    np.testing.assert_array_equal(
        np.asarray(a2), np.asarray(ball_query_xla(xyz, new_xyz, r2, k2)))


def test_gather_shuf_rows_major_variant_interpret(monkeypatch):
    """CASPR_TPU_GATHER_SHUF_ROWS=1 emits rows-major directly via
    in-kernel subtile transposes — must stay bit-exact."""
    from caspr_tpu.ops.pallas_kernels import _gather_rows_shuf_call

    rng = np.random.RandomState(17)
    src = jnp.asarray(rng.randn(2, 200, 19).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 200, size=(2, 300)).astype(np.int32))
    want = np.asarray(jnp.take_along_axis(src, idx[:, :, None], axis=1))
    monkeypatch.setenv("CASPR_TPU_GATHER_SHUF_ROWS", "1")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_gather_rows_shuf_call(src, idx))
    np.testing.assert_array_equal(got, want)
