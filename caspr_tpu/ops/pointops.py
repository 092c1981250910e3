"""Point-cloud primitives for TPU, replacing the reference's Kaolin CUDA
extensions (reference caspr/models/pointnet2.py:7-10).

Semantics replicated (each documented at its function):
  - furthest_point_sampling : kaolin furthest_point_sampling (seed index 0)
  - gather_points           : kaolin fps_gather_by_index
  - ball_query/group_points : kaolin PointNet2GroupingLayer (first-K within
                              radius, pad with first hit, relative xyz)
  - three_nn                : kaolin three_nn (3 smallest SQUARED distances)
  - three_interpolate       : kaolin three_interpolate (weighted 3-NN gather)

These are the XLA implementations: static shapes, vmap-able, jit-able, and
designed so the heavy inner products ride the MXU.  Pallas variants of the
hot kernels live in caspr_tpu.ops.pallas_kernels and are selected via
caspr_tpu.ops.dispatch.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_sqdist(a, b):
    """Exact squared distances between two point sets.

    a: (..., M, D), b: (..., N, D) -> (..., M, N).

    Computed via explicit differences rather than the |a|^2+|b|^2-2ab
    expansion: for near-duplicate points with O(1) coordinates the expansion
    loses ~7 digits to cancellation, which is fatal for Chamfer/ball-query
    parity at the 1e-3 distance scale.  D is 3 here, so the O(M*N*D)
    element-wise form is cheap on the VPU and XLA fuses the reduction.
    """
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def _use_pallas() -> bool:
    """Pallas kernels on TPU-class backends; XLA elsewhere.  Overridable
    with CASPR_TPU_KERNELS=pallas|xla."""
    import os

    mode = os.environ.get("CASPR_TPU_KERNELS", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False


def farthest_point_sampling(xyz, num_samples: int):
    """Dispatching FPS: Pallas kernel on TPU (VMEM-resident argmax chain),
    XLA fori_loop elsewhere.  Semantics identical."""
    if _use_pallas():
        from .pallas_kernels import farthest_point_sampling_pallas

        return farthest_point_sampling_pallas(xyz, num_samples)
    return farthest_point_sampling_xla(xyz, num_samples)


def farthest_point_sampling_xla(xyz, num_samples: int):
    """Iterative farthest point sampling. xyz: (B, N, 3) -> (B, M) int32.

    Matches the Kaolin CUDA kernel used at reference
    caspr/models/pointnet2.py:384: the first selected index is 0 and each
    subsequent pick maximizes the minimum squared distance to the selected
    set (ties resolved to the lowest index, as argmax does).

    When num_samples >= N, FPS selects every point (in some order); since
    every consumer treats the selected centroids as a set (ball query per
    centroid, 3-NN interpolation back to finer levels), we return the
    identity order and skip the sequential loop entirely — this is the
    common case for the first set-abstraction level at training resolution
    (N=1024 -> M=1024).
    """
    n = xyz.shape[-2]
    if num_samples >= n:
        idx = jnp.arange(n, dtype=jnp.int32)
        idx = jnp.concatenate(
            [idx, jnp.zeros((num_samples - n,), jnp.int32)]
        ) if num_samples > n else idx
        return jnp.broadcast_to(idx, (xyz.shape[0], num_samples))

    def one_cloud(pts):  # (N, 3)
        def body(i, state):
            min_d, idxs = state
            last = pts[idxs[i - 1]]
            d = jnp.sum(jnp.square(pts - last), axis=-1)
            min_d = jnp.minimum(min_d, d)
            nxt = jnp.argmax(min_d).astype(jnp.int32)
            return min_d, idxs.at[i].set(nxt)

        idxs0 = jnp.zeros((num_samples,), jnp.int32)
        min_d0 = jnp.full((n,), jnp.inf, pts.dtype)
        _, idxs = lax.fori_loop(1, num_samples, body, (min_d0, idxs0))
        return idxs

    return jax.vmap(one_cloud)(xyz)


def gather_points(points, idx):
    """Gather along the point axis. points: (B, N, C), idx: (B, ...) int ->
    (B, ..., C).  Replaces kaolin fps_gather_by_index (reference
    caspr/models/pointnet2.py:385-386) in channels-last layout.

    On TPU this dispatches to a one-hot-matmul Pallas kernel (exact; see
    pallas_kernels.gather_rows_pallas) whenever the per-batch source slab
    fits VMEM — XLA's native gather is row-at-a-time on TPU and was the
    single largest cost of the encoder.
    """
    b, n, c = points.shape
    flat_idx = idx.reshape(b, -1)
    # The one-hot contraction wins in the many-rows/few-channels regime
    # (XLA's gather cost is per row; the kernel's grows with C via the
    # matmul width).  Measured crossover ~C=32 for the r2 HIGHEST-
    # precision kernel; CASPR_TPU_GATHER_MAXC tunes it for the one-pass
    # split kernel.  VMEM guard on the source slab.
    max_c = int(os.environ.get("CASPR_TPU_GATHER_MAXC", "32"))
    src_vmem = n * (((c + 127) // 128) * 128) * 4
    mode = os.environ.get("CASPR_TPU_GATHER", "shuf")
    from .pallas_kernels import can_gather_shuf

    if (
        _use_pallas()
        and points.dtype == jnp.float32
        and c % 128 == 0
        and os.environ.get("CASPR_TPU_GATHER_DMA_ALLC", "0") == "1"
    ):
        # Opt-in hardware A/B: the per-row async-copy kernel keeps the
        # source in HBM, so it has no source-slab VMEM limit and can
        # serve the big-C sites XLA currently keeps.  Hardware requires
        # C lane-aligned (Mosaic rejects sub-128-lane row copies, r3
        # battery); unaligned sites fall through to split/XLA below.
        from .pallas_kernels import gather_rows_dma

        out = gather_rows_dma(points, flat_idx)
    elif (
        _use_pallas()
        and points.dtype == jnp.float32
        and (
            # the lane-shuffle orientation has no channel-width cliff
            # (its per-element work is independent of C), so in shuf
            # mode every site whose table fits VMEM takes the kernel
            (mode == "shuf" and can_gather_shuf(n, c))
            or (c <= max_c and src_vmem <= 4 * 1024 * 1024)
        )
    ):
        from .pallas_kernels import gather_rows_pallas

        out = gather_rows_pallas(points, flat_idx)
    else:
        out = jnp.take_along_axis(points, flat_idx[:, :, None], axis=1)
    return out.reshape(*idx.shape, c)


def gather_points_packed(points, idx):
    """Gather ball neighborhoods directly into the lanes-packed layout:
    points (B, N, C), idx (B, M, K) int -> (B, M, K*C), where output row
    m holds its K gathered neighbor rows on consecutive lane groups.

    This is the input layout of the lanes-packed SA conv stack
    (ops/sa_packed.py): emitting it straight from the gather kernel's
    VMEM epilogue skips the 128-lane-padded (B, M, K, C) intermediate
    (2-8x HBM bytes at the SA levels' C = 16..64) plus the repack pass.
    Values match gather_points(points, idx).reshape(B, M, K*C) exactly
    (same f32 row moves, different physical layout).
    """
    b, n, c = points.shape
    m, k = idx.shape[1], idx.shape[2]
    from .pallas_kernels import can_gather_shuf, gather_rows_shuf_packed

    # The packed-EMIT shuf variant is Mosaic-rejected by the backend
    # compiler (r5c gate: tpu_compile_helper exit 1 at every shape — the
    # epilogue's sublane->lane fold, transpose + (128, C) -> (128/K, K*C)
    # reshape, has no vreg relayout).  Opt-in until the epilogue is
    # redesigned; the default packs via the row gather + an XLA reshape.
    if (
        os.environ.get("CASPR_TPU_GATHER_PACKED_EMIT", "0") == "1"
        and _use_pallas()
        and points.dtype == jnp.float32
        and can_gather_shuf(n, c)
        and c % 8 == 0
        and 128 % k == 0
    ):
        return gather_rows_shuf_packed(points, idx.reshape(b, -1), k)
    return gather_points(points, idx).reshape(b, m, k * c)


def ball_query(xyz, new_xyz, radius: float, num_samples: int):
    """Dispatching ball query: Pallas VMEM extraction kernel on TPU, XLA
    top_k elsewhere.  Semantics identical (see ball_query_xla)."""
    if _use_pallas():
        from .pallas_kernels import ball_query_pallas

        return ball_query_pallas(xyz, new_xyz, radius, num_samples)
    return ball_query_xla(xyz, new_xyz, radius, num_samples)


def ball_query_pair(xyz, new_xyz, radius1, k1, radius2, k2):
    """Both grouping scales of one SA level: == (ball_query(r1, k1),
    ball_query(r2, k2)) on the same (xyz, new_xyz).  On TPU the fused
    dual-radius kernel computes the shared (M, N) distance tile and one
    packed prefix sum ONCE (pallas_kernels.ball_query_pair_pallas);
    CASPR_TPU_BQ_PAIR=0 keeps the two-call form for A/B."""
    from .pallas_kernels import _fused_d2

    if (
        _use_pallas()
        and _fused_d2()
        and os.environ.get("CASPR_TPU_BQ_PAIR", "1") != "0"
    ):
        from .pallas_kernels import ball_query_pair_pallas

        return ball_query_pair_pallas(xyz, new_xyz, radius1, k1, radius2, k2)
    return (
        ball_query(xyz, new_xyz, radius1, k1),
        ball_query(xyz, new_xyz, radius2, k2),
    )


def ball_query_xla(xyz, new_xyz, radius: float, num_samples: int):
    """Indices of the first ``num_samples`` points of ``xyz`` within
    ``radius`` of each centroid, padded with the first hit.

    xyz: (B, N, 3) source points, new_xyz: (B, M, 3) centroids
    -> idx (B, M, K) int32.

    Replicates the CUDA ball-query semantics behind kaolin's
    PointNet2GroupingLayer (reference caspr/models/pointnet2.py:340-342,391):
    scan source points in index order, keep the first K inside the ball,
    fill remaining slots with the first in-ball index; if the ball is empty
    every slot is index 0.

    Vectorized trick: give each in-radius point the key (N - position);
    top_k then returns the K earliest positions in increasing order.
    """
    n = xyz.shape[-2]
    d2 = pairwise_sqdist(new_xyz, xyz)  # (B, M, N)
    mask = d2 < (radius * radius)
    pos_key = jnp.arange(n, 0, -1, dtype=jnp.int32)  # N - position
    keys = jnp.where(mask, pos_key, 0)
    k_eff = min(num_samples, n)
    top_vals, top_idx = lax.top_k(keys, k_eff)  # (B, M, K')
    if k_eff < num_samples:  # more ball slots than source points: pad
        pad = num_samples - k_eff
        top_vals = jnp.concatenate(
            [top_vals, jnp.zeros(top_vals.shape[:-1] + (pad,), top_vals.dtype)],
            axis=-1,
        )
        top_idx = jnp.concatenate(
            [top_idx, jnp.zeros(top_idx.shape[:-1] + (pad,), top_idx.dtype)],
            axis=-1,
        )
    valid = top_vals > 0
    first_hit = top_idx[..., :1]
    any_hit = valid[..., :1]
    idx = jnp.where(valid, top_idx, first_hit)
    idx = jnp.where(any_hit, idx, 0)
    return idx.astype(jnp.int32)


def group_points(xyz, new_xyz, features, idx, use_xyz_feature: bool = True):
    """Gather grouped neighborhoods and form relative-coordinate features.

    xyz: (B, N, 3); new_xyz: (B, M, 3); features: (B, N, C) or None;
    idx: (B, M, K) -> (B, M, K, 3+C) with centered xyz first, matching the
    channel order of kaolin's grouping (rel-xyz concatenated ahead of
    features; see reference caspr/models/pointnet2.py:391-394 which expects
    (B, M, C+3, K) channels-first — ours is the channels-last mirror).
    """
    if features is None:
        grouped_xyz = gather_points(xyz, idx)  # (B, M, K, 3)
        return grouped_xyz - new_xyz[:, :, None, :]
    # one fused gather over [xyz | features] instead of two passes
    grouped = gather_points(
        jnp.concatenate([xyz, features], axis=-1), idx
    )  # (B, M, K, 3+C)
    rel_xyz = grouped[..., :3] - new_xyz[:, :, None, :]
    if use_xyz_feature:
        return jnp.concatenate([rel_xyz, grouped[..., 3:]], axis=-1)
    return grouped[..., 3:]


def three_nn(query_xyz, source_xyz):
    """Dispatching 3-NN: Pallas extraction kernel on TPU, XLA top_k
    elsewhere (see three_nn_xla)."""
    if _use_pallas():
        from .pallas_kernels import three_nn_pallas

        return three_nn_pallas(query_xyz, source_xyz)
    return three_nn_xla(query_xyz, source_xyz)


def three_nn_xla(query_xyz, source_xyz):
    """3 nearest neighbors of each query among source points.

    query_xyz: (B, N, 3), source_xyz: (B, M, 3)
    -> (dist2 (B, N, 3), idx (B, N, 3) int32)

    Returns SQUARED distances like the kaolin/PointNet++ CUDA three_nn
    (the caller applies 1/(d+1e-8) inverse-distance weights; reference
    caspr/models/pointnet2.py:514-518).
    """
    d2 = pairwise_sqdist(query_xyz, source_xyz)  # (B, N, M)
    neg_d, idx = lax.top_k(-d2, 3)
    return -neg_d, idx.astype(jnp.int32)


def three_interpolate(features, idx, weights):
    """Weighted gather of source features onto query points.

    features: (B, M, C), idx: (B, N, 3), weights: (B, N, 3) -> (B, N, C).
    Mirrors kaolin three_interpolate (reference
    caspr/models/pointnet2.py:519).

    On TPU the 3-row gather (XLA: row-at-a-time, ~38 GB/s) is re-expressed
    as a dense interpolation-matrix product that rides the MXU: A (B, N, M)
    holds the 3 weights per query row, out = A @ features.  Split-precision
    passes (bf16 hi/lo of A x exact 3-way bf16 split of features) keep the
    error ~2^-18 — far below the one-pass bf16 noise of the surrounding
    convs.  M <= 2048 for every FP level of the reference architecture.
    """
    m, c = features.shape[1], features.shape[2]
    if _use_pallas() and features.dtype == jnp.float32 and m <= 2048:
        from .pallas_kernels import (
            can_interp_shuf,
            three_interpolate_pallas,
            three_interpolate_shuf,
            three_interpolate_vmem_ok,
        )

        # Two Pallas orientations: 'shuf' (r5 default) gathers the three
        # source rows with exact f32 lane shuffles and accumulates in
        # f32 on the VPU — bit-exact on device AND faster (pointnet2
        # 184.5 -> 179.0 ms warm, r5 battery stage 22); 'pallas' builds
        # the interpolation matrix in-VMEM and rides the MXU with the
        # 4-product bf16 split scheme.  CASPR_TPU_INTERP=dense keeps the
        # XLA path for A/B.
        mode = os.environ.get("CASPR_TPU_INTERP", "shuf")
        if mode == "shuf" and can_interp_shuf(m, c):
            return three_interpolate_shuf(features, idx, weights)
        if mode in ("pallas", "shuf") and three_interpolate_vmem_ok(m, c):
            return three_interpolate_pallas(features, idx, weights)
        return _three_interpolate_dense(features, idx, weights)
    gathered = gather_points(features, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weights[..., None], axis=2)


def _split3(t):
    """Exact 3-way bf16 split: t == hi + mid + lo (mask-based truncating
    split — cast-based splits are elided to hi-only under this backend's
    forced --xla_allow_excess_precision; see pallas_kernels.split3_bf16)."""
    from .pallas_kernels import split3_bf16
    return split3_bf16(t)


@jax.jit
def _three_interpolate_dense(features, idx, weights):
    m = features.shape[1]
    iota = jnp.arange(m, dtype=jnp.int32)
    a = jnp.zeros(idx.shape[:2] + (m,), jnp.float32)
    for j in range(3):
        a = a + weights[..., j, None] * (idx[..., j, None] == iota)
    from .pallas_kernels import split2_bf16
    ah, al = split2_bf16(a)
    fh, fm, fl = _split3(features)

    def bdot(x, y):
        return jax.lax.dot_general(
            x, y, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    # 4 exact bf16 passes; the dropped al@(fm+fl) term is O(2^-18), the
    # same order as the bf16 residual of A itself
    return bdot(ah, fh) + bdot(ah, fm) + bdot(ah, fl) + bdot(al, fh)
