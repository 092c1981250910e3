"""Fused Pallas kernel for a PointNet++ set-abstraction scale: neighborhood
gather + relative-coordinate features + the 3-conv GroupNorm mini-PointNet
+ the max-pool over the ball, in one VMEM-resident pass.

The reference runs this as kaolin's grouping CUDA kernel followed by torch
convs (reference caspr/models/pointnet2.py:340-342,391-394,649-699).  The
XLA translation materializes the grouped (B', M, K, C) tensor in HBM and
pays per-row gather costs plus relayout copies around every conv — the SA
stack was ~60% of pointnet2_apply time at the eval point.  Here each grid
program handles one (frame, center-tile):

  - the gather is a one-hot contraction on the MXU: rows = tile_m * K
    ball members, onehot (rows, N) @ src (N, 3+C).  HIGHEST precision
    makes it an exact row copy (bf16 operand truncation would corrupt
    the 0.02-radius relative coordinates).
  - relative xyz = gathered xyz - E @ centers, with E (rows, tile_m) the
    constant center-expansion matrix (iota compare, lives in registers)
  - convs run on the (rows, C) tile in the MXU's native layout; GroupNorm
    statistics (per center over the K ball members and C/G group
    channels) are computed with tiny constant segment/group matmuls
    (Sm: rows->centers, Gsum: channels->groups) instead of reshapes,
    so no relayouts appear anywhere
  - the K-member max-pool is a free leading-axis reshape + reduce

Gradients: custom_vjp whose backward differentiates the XLA composition
(ops.pointops.group_points + models.pointnet2._mini_pointnet_apply), so
training is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_EPS = 1e-5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hdot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _sa_kernel(n, k, tile_m, dims, num_groups, relu_last,
               src_ref, cent_ref, idx_ref, w1_ref, w2_ref, w3_ref, pk_ref,
               out_ref):
    """src: (1, N, Cs) = [xyz | features]; cent: (1, tile_m, 3);
    idx: (1, rows, 1) int32 (rows = tile_m * k, center-major);
    w*: (C_in, d_out) conv weights (transposed torch layout);
    pk: (16, d_max) packed vectors: rows 0..2 conv biases, 3..5 GN weights,
    6..8 GN biases (row i padded past dims[i+1]);
    out: (1, tile_m, d3) max-pooled features.
    """
    rows = tile_m * k
    src = src_ref[0]
    cent = cent_ref[0]
    idx = idx_ref[0]  # (rows, 1)

    # exact neighborhood gather on the MXU.  A bf16 hi/lo operand split
    # (2 DEFAULT passes instead of HIGHEST's 6, ~2^-17 abs error) was
    # measured at 679 -> 560 ms for pointnet2 — still behind the 387 ms
    # XLA composition, and GroupNorm's rsqrt(var) amplifies the gather
    # error ~100x on small-radius balls; exactness kept.
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    onehot = (iota_n == idx).astype(jnp.float32)
    g = _hdot(onehot, src)  # (rows, Cs)

    # constant segment matrices (center-major row order), built directly
    # in both orientations — no relayout transposes
    smt = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, tile_m), 0) // k
        == jax.lax.broadcasted_iota(jnp.int32, (rows, tile_m), 1)
    ).astype(jnp.float32)                              # (rows, tile_m)
    sm = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_m, rows), 1) // k
        == jax.lax.broadcasted_iota(jnp.int32, (tile_m, rows), 0)
    ).astype(jnp.float32)                              # (tile_m, rows)

    rel = g[:, :3] - _hdot(smt, cent)
    z = jnp.concatenate([rel, g[:, 3:]], axis=1)  # (rows, Cin)

    def group_norm(m, d, gnw, gnb):
        grp = num_groups
        cg = d // grp
        c_div = jax.lax.broadcasted_iota(jnp.int32, (d, grp), 0) // cg
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (d, grp), 1)
        gsum = (c_div == g_ids).astype(jnp.float32)    # (d, grp)
        gsum_t = jnp.transpose(gsum)                   # (grp, d)
        inv = 1.0 / (k * cg)

        def seg_stats(x):
            per_center = _hdot(sm, x)                  # (tile_m, d)
            per_group = _hdot(per_center, gsum) * inv  # (tile_m, grp)
            return _hdot(_hdot(smt, per_group), gsum_t)  # (rows, d)

        mean = seg_stats(m)
        centered = m - mean
        var = seg_stats(centered * centered)
        return centered * jax.lax.rsqrt(var + _EPS) * gnw + gnb

    for li, w_ref in enumerate((w1_ref, w2_ref, w3_ref)):
        d = dims[li + 1]
        bias = pk_ref[li:li + 1, :d]
        gnw = pk_ref[3 + li:4 + li, :d]
        gnb = pk_ref[6 + li:7 + li, :d]
        z = _dot(z, w_ref[:]) + bias
        z = group_norm(z, d, gnw, gnb)
        if li < 2 or relu_last:
            z = jnp.maximum(z, 0.0)

    # max over the K ball members: leading-axis reshape is layout-free
    out_ref[0] = jnp.max(z.reshape(tile_m, k, dims[3]), axis=1)


def _pack_vectors(sp, dims, dmax):
    rows = []
    for li in range(3):
        rows.append(jnp.pad(sp["convs"][li]["bias"], (0, dmax - dims[li + 1])))
    for key in ("weight", "bias"):
        for li in range(3):
            rows.append(
                jnp.pad(sp["norms"][li][key], (0, dmax - dims[li + 1]))
            )
    pk = jnp.stack(rows, axis=0)  # (9, dmax)
    return jnp.pad(pk, ((0, 16 - pk.shape[0]), (0, 0)))


@functools.partial(
    jax.jit, static_argnames=("k", "num_groups", "relu_last")
)
def _sa_call(w1t, w2t, w3t, pk, src, cent, gidx, *, k, num_groups,
             relu_last=False):
    b, n, cs = src.shape
    m = cent.shape[1]
    dims = (w1t.shape[0], w1t.shape[1], w2t.shape[1], w3t.shape[1])
    tile_m = max(1, 512 // k)
    while m % tile_m:
        tile_m //= 2
    rows = tile_m * k

    idx = gidx.reshape(b, m * k, 1).astype(jnp.int32)
    kernel = functools.partial(
        _sa_kernel, n, k, tile_m, dims, num_groups, relu_last
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, m // tile_m),
        in_specs=[
            pl.BlockSpec((1, n, cs), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1t.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2t.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3t.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pk.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, dims[3]), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, dims[3]), jnp.float32),
    )(src, cent, idx, w1t, w2t, w3t, pk)
    return out


def _xla_reference(sp, xyz, features, new_xyz, gidx, num_groups):
    from ..models.pointnet2 import _mini_pointnet_apply
    from .pointops import group_points

    grouped = group_points(xyz, new_xyz, features, gidx, True)
    b, m, kk, cin = grouped.shape
    h = _mini_pointnet_apply(sp, grouped.reshape(b * m, kk, cin))
    return h.reshape(b, m, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_sa_scale(sp, xyz, features, new_xyz, gidx, k, num_groups=16):
    """Fused grouping + mini-PointNet for one SA scale.

    sp: _mini_pointnet params; xyz: (B, N, 3); features: (B, N, C) or
    None; new_xyz: (B, M, 3); gidx: (B, M, K) int32.
    Returns (B, M, d_out) — identical semantics to
    group_points + _mini_pointnet_apply with use_xyz_feature=True.
    """
    del k
    src = xyz if features is None else jnp.concatenate(
        [xyz, features], axis=-1
    )
    dims = [sp["convs"][0]["weight"].shape[1]] + [
        c["weight"].shape[0] for c in sp["convs"]
    ]
    dmax = max(dims[1:])
    w1t = jnp.transpose(sp["convs"][0]["weight"])  # (in, out)
    w2t = jnp.transpose(sp["convs"][1]["weight"])
    w3t = jnp.transpose(sp["convs"][2]["weight"])
    pk = _pack_vectors(sp, dims, dmax)
    return _sa_call(
        w1t, w2t, w3t, pk, src, new_xyz, gidx,
        k=gidx.shape[-1], num_groups=num_groups,
    )


def _fused_sa_fwd(sp, xyz, features, new_xyz, gidx, k, num_groups):
    out = fused_sa_scale(sp, xyz, features, new_xyz, gidx, k, num_groups)
    return out, (sp, xyz, features, new_xyz, gidx)


def _fused_sa_bwd(k, num_groups, res, ct):
    del k
    sp, xyz, features, new_xyz, gidx = res
    if features is None:
        _, vjp = jax.vjp(
            lambda p, x, nx: _xla_reference(p, x, None, nx, gidx, num_groups),
            sp, xyz, new_xyz,
        )
        dsp, dxyz, dnew = vjp(ct)
        dfeat = None
    else:
        _, vjp = jax.vjp(
            lambda p, x, f, nx: _xla_reference(p, x, f, nx, gidx, num_groups),
            sp, xyz, features, new_xyz,
        )
        dsp, dxyz, dfeat, dnew = vjp(ct)
    return dsp, dxyz, dfeat, dnew, jnp.zeros_like(gidx)


fused_sa_scale.defvjp(_fused_sa_fwd, _fused_sa_bwd)


def can_fuse_sa(sp, n, cs, m, k, num_groups=16) -> bool:
    """Kernel applicability: 3-conv mini-PointNet, channel dims divisible
    by the group count, source slab within VMEM budget, M divisible by a
    power-of-two center tile."""
    if len(sp["convs"]) != 3:
        return False
    dims = [c["weight"].shape[0] for c in sp["convs"]]
    if any(d % num_groups for d in dims):
        return False
    cs_pad = _round_up(cs, _LANES)
    if n * cs_pad * 4 > 2 * 1024 * 1024:
        return False
    tile_m = max(1, 512 // k)
    while m % tile_m:
        tile_m //= 2
    return tile_m * k <= 1024
