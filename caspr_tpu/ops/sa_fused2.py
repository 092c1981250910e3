"""Fused PointNet++ set-abstraction scale, v2: factored first conv + an
exact one-pass bf16 one-hot gather.

Replaces the reference's kaolin grouping CUDA kernel + torch convs
(reference caspr/models/pointnet2.py:340-342,391-394,649-699) for one SA
scale: neighborhood gather, relative-xyz features, 3x (conv1x1 + GroupNorm
[+ ReLU]), and the max-pool over the ball — without ever materializing the
grouped (B', M, K, C) tensor in HBM.

Two ideas fix what sank the v1 kernel (ops/sa_fused.py, a documented
negative result — its exact HIGHEST-precision gather of the raw (3+C)-wide
source cost more than the fusion saved):

1. **Factor the first conv through the gather.**  With W1 split into its
   rel-xyz and feature blocks, conv1 of a grouped row is

       h1[m,k] = (xyz[i]-c[m]) @ Wx + feat[i] @ Wf + b1        (i = idx[m,k])
               = t[i] - u[m],   t = xyz@Wx + feat@Wf + b1,  u = c@Wx

   so the kernel gathers the d1-wide table ``t`` (d1 = 16..256) instead of
   the raw (3+C)-wide source (up to 515 channels at SA5), and the first
   conv's FLOPs shrink from M*K rows to N rows (~24x).  ``t``/``u`` ride a
   HIGHEST-precision matmul outside the kernel: the factored form is a
   difference of O(1) quantities, and one-pass bf16 there would bury the
   0.02-radius relative coordinates in rounding noise.

2. **Bit-exact gather in ~one bf16 MXU pass.**  An f32 value splits exactly
   into three bf16 components (hi = bf16(v), mid = bf16(v-hi),
   lo = v-hi-mid: 8+9+7 mantissa bits cover f32's 24), each exactly
   representable in bf16.  The packed table [hi|mid|lo] (N, 3*d1) is
   gathered with a single one-hot bf16 contraction (exact: each product is
   1.0 * component, accumulated in f32), then folded back with a constant
   [I;I;I] matmul — also exact, because the gathered components are
   bf16-representable and their sum reconstructs v's f32 mantissa exactly.
   For d1 <= 42 the whole gather is ONE default-precision MXU pass vs the
   v1 kernel's six.

GroupNorm statistics (per center over the K ball members and C/G group
channels, matching torch.nn.GroupNorm on the reference's channels-first
layout) use tiny constant segment/group matmuls as in v1, so no relayouts.

Gradients: custom_vjp whose backward differentiates the XLA composition
(ops.pointops.group_points + models.pointnet2._mini_pointnet_apply), i.e.
rematerialization — training numerics are unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_EPS = 1e-5
# VMEM budget for the per-step one-hot tile (bf16 bytes)
_ONEHOT_BYTES = 2 * 1024 * 1024


def _max_rows() -> int:
    """Tile rows cap (CASPR_TPU_SA2_ROWS overrides): larger tiles amortize
    grid-step overhead but inflate Mosaic compile time and VMEM."""
    import os

    try:
        v = int(os.environ.get("CASPR_TPU_SA2_ROWS", "512"))
    except ValueError:
        v = 512
    return max(128, min(4096, v))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hdot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _dot(a, b):
    # precision pinned: a global default_matmul_precision('highest')
    # otherwise leaks fp32 contract precision onto the kernel's bf16
    # operands (Mosaic rejects that), and the one-hot dots are exact at
    # DEFAULT by construction
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _split3(t):
    """Exact 3-way bf16 split of an f32 array: t == hi + mid + lo
    (mask-based; cast-based splits are elided to hi-only under the
    backend's forced --xla_allow_excess_precision, see
    pallas_kernels.split3_bf16)."""
    from .pallas_kernels import split3_bf16
    return split3_bf16(t)


def _tile_m_for(m: int, k: int, n: int, max_rows: int = 0) -> int:
    """Largest power-of-two divisor of M whose one-hot tile fits VMEM."""
    rows_cap = max(k, min(max_rows or _max_rows(), _ONEHOT_BYTES // (2 * n)))
    tile = 1
    while (
        tile * 2 <= m
        and m % (tile * 2) == 0
        and (tile * 2) * k <= rows_cap
    ):
        tile *= 2
    return tile


def _sa2_kernel(n, k, tile_m, d1, d2, d3, num_groups,
                tpack_ref, u_ref, idx_ref, w2_ref, w3_ref, pk_ref, out_ref):
    """tpack: (1, N, 3*d1) bf16 split table; u: (1, tile_m, d1) f32;
    idx: (1, rows, 1) int32 center-major (rows = tile_m * k);
    w2: (d1, d2), w3: (d2, d3) f32 (transposed torch layout);
    pk: (16, dmax) packed vectors — rows 0: b2, 1: b3, 2..4: GN weights,
    5..7: GN biases; out: (1, tile_m, d3)."""
    rows = tile_m * k
    idx = idx_ref[0]  # (rows, 1)

    # one-hot gather of the packed split table: ONE default bf16 MXU pass,
    # exact (see module docstring)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    onehot = (iota_n == idx).astype(jnp.bfloat16)
    gp = _dot(onehot, tpack_ref[0])  # (rows, 3*d1) f32, components bf16-exact

    # fold hi+mid+lo with a constant [I;I;I] matmul (exact: gp is
    # bf16-representable columnwise, f32 accumulation reconstructs t)
    f_iota0 = jax.lax.broadcasted_iota(jnp.int32, (3 * d1, d1), 0)
    f_iota1 = jax.lax.broadcasted_iota(jnp.int32, (3 * d1, d1), 1)
    fold = (f_iota0 % d1 == f_iota1).astype(jnp.bfloat16)
    g = _dot(gp.astype(jnp.bfloat16), fold)  # (rows, d1) == gathered t

    # constant segment matrices (center-major rows), built directly in
    # both orientations — no relayout transposes
    smt = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, tile_m), 0) // k
        == jax.lax.broadcasted_iota(jnp.int32, (rows, tile_m), 1)
    ).astype(jnp.float32)                              # (rows, tile_m)
    sm = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_m, rows), 1) // k
        == jax.lax.broadcasted_iota(jnp.int32, (tile_m, rows), 0)
    ).astype(jnp.float32)                              # (tile_m, rows)

    # h1 = t[idx] - u[m]: expand centers over their K ball members with the
    # exact segment matmul (a broadcast+reshape relayouts on Mosaic)
    z = g - _hdot(smt, u_ref[0])

    def group_norm(x, d, gnw, gnb):
        grp = num_groups
        cg = d // grp
        c_div = jax.lax.broadcasted_iota(jnp.int32, (d, grp), 0) // cg
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (d, grp), 1)
        gsum = (c_div == g_ids).astype(jnp.float32)    # (d, grp)
        gsum_t = jnp.transpose(gsum)                   # (grp, d)
        inv = 1.0 / (k * cg)

        def seg_stats(s):
            per_center = _hdot(sm, s)                  # (tile_m, d)
            per_group = _hdot(per_center, gsum) * inv  # (tile_m, grp)
            return _hdot(_hdot(smt, per_group), gsum_t)  # (rows, d)

        mean = seg_stats(x)
        centered = x - mean
        var = seg_stats(centered * centered)
        return centered * jax.lax.rsqrt(var + _EPS) * gnw + gnb

    dims = (d1, d2, d3)
    for li in range(3):
        d = dims[li]
        if li > 0:  # conv1 is pre-applied via the factored gather
            bias = pk_ref[li - 1:li, :d]
            z = _dot(z, (w2_ref if li == 1 else w3_ref)[:]) + bias
        gnw = pk_ref[2 + li:3 + li, :d]
        gnb = pk_ref[5 + li:6 + li, :d]
        z = group_norm(z, d, gnw, gnb)
        if li < 2:
            z = jnp.maximum(z, 0.0)

    out_ref[0] = jnp.max(z.reshape(tile_m, k, d3), axis=1)


def _pack_vectors2(sp, dims, dmax):
    rows = [
        jnp.pad(sp["convs"][1]["bias"], (0, dmax - dims[1])),
        jnp.pad(sp["convs"][2]["bias"], (0, dmax - dims[2])),
    ]
    for key in ("weight", "bias"):
        for li in range(3):
            rows.append(jnp.pad(sp["norms"][li][key], (0, dmax - dims[li])))
    pk = jnp.stack(rows, axis=0)  # (8, dmax)
    return jnp.pad(pk, ((0, 16 - pk.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("k", "num_groups", "max_rows"))
def _sa2_call(w1t, b1, w2t, w3t, pk, xyz, features, new_xyz, gidx, *, k,
              num_groups, max_rows):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    d1, d2, d3 = w1t.shape[1], w2t.shape[1], w3t.shape[1]

    # factored conv1: t over source points, u over centers.  HIGHEST
    # precision — the kernel computes t[i] - u[m], a difference of O(1)
    # quantities standing in for the O(radius) relative coordinates.
    wx, wf = w1t[:3], w1t[3:]
    t = _hdot(xyz.reshape(b * n, 3), wx) + b1
    if features is not None:
        t = t + _hdot(features.reshape(b * n, -1), wf)
    hi, mid, lo = _split3(t.reshape(b, n, d1))
    tpack = jnp.concatenate([hi, mid, lo], axis=-1)  # (B, N, 3*d1) bf16
    u = _hdot(new_xyz.reshape(b * m, 3), wx).reshape(b, m, d1)

    tile_m = _tile_m_for(m, k, n, max_rows)
    rows = tile_m * k
    idx = gidx.reshape(b, m * k, 1).astype(jnp.int32)
    kernel = functools.partial(
        _sa2_kernel, n, k, tile_m, d1, d2, d3, num_groups
    )
    return pl.pallas_call(
        kernel,
        grid=(b, m // tile_m),
        in_specs=[
            pl.BlockSpec((1, n, 3 * d1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, d1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2t.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3t.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pk.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, d3), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, d3), jnp.float32),
    )(tpack, u, idx, w2t, w3t, pk)


def _sa3_kernel(n_pad, k, tile_m, d1, d2, d3, num_groups,
                tt_ref, u_ref, idx_ref, w2_ref, w3_ref, pk_ref, out_ref):
    """v3: the v2 fused SA scale with the one-hot MXU gather replaced by
    the lane-shuffle gather (see pallas_kernels._gather_shuf_kernel).

    tt: (1, d1, N_pad) f32 TRANSPOSED factored-conv1 table (channels on
    sublanes, source points on lanes) — gathered columns are exact f32
    moves, so the bf16 split/fold machinery of v2 disappears; the rest
    (segment-matmul GroupNorm, convs, ball max) is v2 verbatim.  Each
    gathered (d1, 128) subtile is transposed in-VMEM to rows-major.
    """
    rows = tile_m * k
    idx = idx_ref[0]  # (1, rows)
    nblk = n_pad // _LANES
    nsub = rows // _LANES

    subs = []
    los, his = [], []
    for s in range(nsub):
        sl = idx[:, s * _LANES:(s + 1) * _LANES]  # (1, 128)
        los.append(jnp.broadcast_to(jax.lax.rem(sl, _LANES), (d1, _LANES)))
        his.append(jnp.broadcast_to(jax.lax.div(sl, _LANES), (d1, _LANES)))
        subs.append(jnp.zeros((d1, _LANES), jnp.float32))
    for blk_i in range(nblk):
        blk = tt_ref[0, :, blk_i * _LANES:(blk_i + 1) * _LANES]  # (d1, 128)
        for s in range(nsub):
            gg = jnp.take_along_axis(blk, los[s], axis=1)
            subs[s] = jnp.where(his[s] == blk_i, gg, subs[s])
    g = jnp.concatenate(
        [jnp.transpose(sub) for sub in subs], axis=0)  # (rows, d1)

    # constant segment matrices (center-major rows), built directly in
    # both orientations — no relayout transposes
    smt = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, tile_m), 0) // k
        == jax.lax.broadcasted_iota(jnp.int32, (rows, tile_m), 1)
    ).astype(jnp.float32)                              # (rows, tile_m)
    sm = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_m, rows), 1) // k
        == jax.lax.broadcasted_iota(jnp.int32, (tile_m, rows), 0)
    ).astype(jnp.float32)                              # (tile_m, rows)

    z = g - _hdot(smt, u_ref[0])

    def group_norm(x, d, gnw, gnb):
        grp = num_groups
        cg = d // grp
        c_div = jax.lax.broadcasted_iota(jnp.int32, (d, grp), 0) // cg
        g_ids = jax.lax.broadcasted_iota(jnp.int32, (d, grp), 1)
        gsum = (c_div == g_ids).astype(jnp.float32)    # (d, grp)
        gsum_t = jnp.transpose(gsum)                   # (grp, d)
        inv = 1.0 / (k * cg)

        def seg_stats(s):
            per_center = _hdot(sm, s)                  # (tile_m, d)
            per_group = _hdot(per_center, gsum) * inv  # (tile_m, grp)
            return _hdot(_hdot(smt, per_group), gsum_t)  # (rows, d)

        mean = seg_stats(x)
        centered = x - mean
        var = seg_stats(centered * centered)
        return centered * jax.lax.rsqrt(var + _EPS) * gnw + gnb

    dims = (d1, d2, d3)
    for li in range(3):
        d = dims[li]
        if li > 0:  # conv1 is pre-applied via the factored gather
            bias = pk_ref[li - 1:li, :d]
            z = _dot(z, (w2_ref if li == 1 else w3_ref)[:]) + bias
        gnw = pk_ref[2 + li:3 + li, :d]
        gnb = pk_ref[5 + li:6 + li, :d]
        z = group_norm(z, d, gnw, gnb)
        if li < 2:
            z = jnp.maximum(z, 0.0)

    out_ref[0] = jnp.max(z.reshape(tile_m, k, d3), axis=1)


@functools.partial(jax.jit, static_argnames=("k", "num_groups", "max_rows"))
def _sa3_call(w1t, b1, w2t, w3t, pk, xyz, features, new_xyz, gidx, *, k,
              num_groups, max_rows):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    d1, d2, d3 = w1t.shape[1], w2t.shape[1], w3t.shape[1]

    wx, wf = w1t[:3], w1t[3:]
    t = _hdot(xyz.reshape(b * n, 3), wx) + b1
    if features is not None:
        t = t + _hdot(features.reshape(b * n, -1), wf)
    n_pad = _round_up(n, _LANES)
    tt = jnp.moveaxis(t.reshape(b, n, d1), 1, 2)       # (B, d1, N)
    tt = jnp.pad(tt, ((0, 0), (0, 0), (0, n_pad - n)))
    u = _hdot(new_xyz.reshape(b * m, 3), wx).reshape(b, m, d1)

    # rows per grid step must be a 128-multiple for the subtile shuffles;
    # tile_m * k with k in {16, 32} and tile_m a power of two >= 8 is.
    tile_m = _tile_m_for(m, k, n, max_rows)
    while tile_m * k % _LANES and tile_m * 2 <= m and m % (tile_m * 2) == 0:
        tile_m *= 2
    rows = tile_m * k
    if rows % _LANES:
        raise ValueError(f"sa3 tile rows {rows} not lane-aligned")
    idx = jnp.clip(gidx.reshape(b, 1, m * k).astype(jnp.int32), 0, n - 1)
    kernel = functools.partial(
        _sa3_kernel, n_pad, k, tile_m, d1, d2, d3, num_groups
    )
    return pl.pallas_call(
        kernel,
        grid=(b, m // tile_m),
        in_specs=[
            pl.BlockSpec((1, d1, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, d1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2t.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3t.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pk.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_m, d3), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, d3), jnp.float32),
    )(tt, u, idx, w2t, w3t, pk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_sa_scale3(sp, xyz, features, new_xyz, gidx, k, num_groups=16):
    """Fused grouping + mini-PointNet for one SA scale, v3: lane-shuffle
    gather (exact f32) + in-VMEM convs/GroupNorm/ball-max.  Same
    interface/semantics as fused_sa_scale2; the grouped (B, M, K, C)
    tensor never exists in HBM AND the gather does no N-wide MXU
    contraction (what sank v1/v2 at SA density, BENCHMARKS.md)."""
    del k
    w1t = jnp.transpose(sp["convs"][0]["weight"])  # (3+C, d1)
    w2t = jnp.transpose(sp["convs"][1]["weight"])
    w3t = jnp.transpose(sp["convs"][2]["weight"])
    dims = [c["weight"].shape[0] for c in sp["convs"]]
    pk = _pack_vectors2(sp, dims, max(dims))
    return _sa3_call(
        w1t, sp["convs"][0]["bias"], w2t, w3t, pk,
        xyz, features, new_xyz, gidx,
        k=gidx.shape[-1], num_groups=num_groups, max_rows=_max_rows(),
    )


def _fused_sa3_fwd(sp, xyz, features, new_xyz, gidx, k, num_groups):
    out = fused_sa_scale3(sp, xyz, features, new_xyz, gidx, k, num_groups)
    return out, (sp, xyz, features, new_xyz, gidx)


def _fused_sa3_bwd(k, num_groups, res, ct):
    # same rematerializing backward as v2 (_fused_sa2_bwd, defined below)
    return _fused_sa2_bwd(k, num_groups, res, ct)


fused_sa_scale3.defvjp(_fused_sa3_fwd, _fused_sa3_bwd)


def can_fuse_sa3(sp, n, m, k, num_groups=16) -> bool:
    """Applicability of the v3 kernel: 3-conv mini-PointNet, GroupNorm-
    divisible dims, transposed t-table within VMEM, lane-aligned rows."""
    if len(sp["convs"]) != 3:
        return False
    dims = [c["weight"].shape[0] for c in sp["convs"]]
    if any(d % num_groups for d in dims):
        return False
    d1 = dims[0]
    n_pad = _round_up(n, _LANES)
    if d1 * n_pad * 4 > 6 * 1024 * 1024:
        return False
    tile_m = _tile_m_for(m, k, n)
    while tile_m * k % _LANES and tile_m * 2 <= m and m % (tile_m * 2) == 0:
        tile_m *= 2
    return m % tile_m == 0 and tile_m * k % _LANES == 0


def sa_scale_factored(sp, xyz, features, new_xyz, gidx, num_groups=16):
    """Pure-XLA SA scale with the first conv factored through the gather
    (idea 1 of the module docstring, without the kernel):

        h1[m,k] = t[idx[m,k]] - u[m],   t = xyz@Wx + feat@Wf + b1

    so the neighborhood gather moves d1 channels (16..256) instead of the
    raw 3+C source (up to 515 at SA5) and conv1 runs over N source points
    instead of M*K grouped rows (~24x fewer FLOPs).  For d1 <= 32 the
    gather additionally dispatches to the exact one-hot MXU kernel
    (ops/pointops.gather_points).  t/u ride HIGHEST-precision matmuls:
    the factored form is a difference of O(1) quantities standing in for
    the O(radius) relative coordinates, and one-pass bf16 there would
    bury them in rounding noise.  Measured against a full-f32 ground
    truth this path is ~2.5x MORE accurate than the unfactored
    default-precision composition (the GN layers amplify bf16 operand
    truncation on low-variance groups either way; see BENCHMARKS.md).

    Returns (B, M, d_out) — same semantics as group_points +
    _mini_pointnet_apply with use_xyz_feature=True.  Mirrors reference
    caspr/models/pointnet2.py:391-394,649-699.
    """
    from ..nn import group_norm
    from .pointops import gather_points

    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    w1t = jnp.transpose(sp["convs"][0]["weight"])  # (3+C, d1)
    d1 = w1t.shape[1]
    wx, wf = w1t[:3], w1t[3:]
    t = _hdot(xyz.reshape(b * n, 3), wx) + sp["convs"][0]["bias"]
    if features is not None:
        t = t + _hdot(features.reshape(b * n, -1), wf)
    t = t.reshape(b, n, d1)
    u = _hdot(new_xyz.reshape(b * m, 3), wx).reshape(b, m, d1)

    from .sa_packed import can_pack, sa_stack_packed_flat, stack_mode

    if stack_mode() == "packed" and can_pack(sp):
        # Lanes-packed conv stack: K folded into the channel dim so the
        # narrow (d < 128) intermediates skip XLA's minor-dim lane
        # padding, with the gather emitting the packed layout directly
        # from its VMEM epilogue (see ops/sa_packed.py).
        from .pointops import gather_points_packed

        kk = gidx.shape[2]
        gp = gather_points_packed(t, gidx)         # (B, M, K*d1)
        hp = (gp - jnp.tile(u, (1, 1, kk))).reshape(b * m, kk * d1)
        return sa_stack_packed_flat(
            sp, hp, kk, d1, num_groups).reshape(b, m, -1)

    g = gather_points(t, gidx)                     # (B, M, K, d1)
    h = (g - u[:, :, None, :]).reshape(b * m, *g.shape[2:])
    num = len(sp["convs"])
    # Opt-in (CASPR_TPU_SA_BF16_ACTS=1): store the post-ReLU activations
    # in bf16.  TPU's default one-pass matmul casts f32 operands to bf16
    # inside the dot anyway (round-to-nearest-even, identical to astype),
    # so the next conv computes bit-identical results while the big
    # (M*K, d) intermediates move half the HBM bytes.  t/u and the GN
    # inputs stay f32 (their precision is load-bearing — see docstring).
    import os

    mode = os.environ.get("CASPR_TPU_SA_BF16_ACTS", "0")
    if mode == "1":  # TPU-class backends only (CPU/GPU matmuls are f32)
        try:
            if jax.default_backend() in ("cpu", "gpu"):
                mode = "0"
        except RuntimeError:
            mode = "0"
    bf16_acts = mode in ("1", "force")
    for i in range(num):
        if i > 0:
            w = jnp.transpose(sp["convs"][i]["weight"])
            if bf16_acts and h.dtype == jnp.bfloat16:
                w = w.astype(jnp.bfloat16)
            h = jnp.matmul(
                h, w, preferred_element_type=jnp.float32
            ) + sp["convs"][i]["bias"]
        h = group_norm(sp["norms"][i], h, num_groups)
        if i < num - 1:
            h = jax.nn.relu(h)
            if bf16_acts:
                h = h.astype(jnp.bfloat16)
    return jnp.max(h, axis=1).reshape(b, m, -1)


def _xla_reference(sp, xyz, features, new_xyz, gidx, num_groups):
    from ..models.pointnet2 import _mini_pointnet_apply
    from .pointops import group_points

    grouped = group_points(xyz, new_xyz, features, gidx, True)
    b, m, kk, cin = grouped.shape
    h = _mini_pointnet_apply(sp, grouped.reshape(b * m, kk, cin))
    return h.reshape(b, m, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_sa_scale2(sp, xyz, features, new_xyz, gidx, k, num_groups=16):
    """Fused grouping + mini-PointNet for one SA scale (v2).

    sp: _mini_pointnet params; xyz: (B, N, 3); features: (B, N, C) or
    None; new_xyz: (B, M, 3); gidx: (B, M, K) int32.
    Returns (B, M, d_out) — same semantics as group_points +
    _mini_pointnet_apply with use_xyz_feature=True.
    """
    del k
    w1t = jnp.transpose(sp["convs"][0]["weight"])  # (3+C, d1)
    w2t = jnp.transpose(sp["convs"][1]["weight"])
    w3t = jnp.transpose(sp["convs"][2]["weight"])
    dims = [c["weight"].shape[0] for c in sp["convs"]]
    pk = _pack_vectors2(sp, dims, max(dims))
    return _sa2_call(
        w1t, sp["convs"][0]["bias"], w2t, w3t, pk,
        xyz, features, new_xyz, gidx,
        k=gidx.shape[-1], num_groups=num_groups, max_rows=_max_rows(),
    )


def _fused_sa2_fwd(sp, xyz, features, new_xyz, gidx, k, num_groups):
    out = fused_sa_scale2(sp, xyz, features, new_xyz, gidx, k, num_groups)
    return out, (sp, xyz, features, new_xyz, gidx)


def _fused_sa2_bwd(k, num_groups, res, ct):
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


fused_sa_scale2.defvjp(_fused_sa2_fwd, _fused_sa2_bwd)


def can_fuse_sa2(sp, n, m, k, num_groups=16) -> bool:
    """Kernel applicability: 3-conv mini-PointNet, channel dims divisible
    by the group count, split-table + one-hot tile within VMEM budget."""
    if len(sp["convs"]) != 3:
        return False
    dims = [c["weight"].shape[0] for c in sp["convs"]]
    if any(d % num_groups for d in dims):
        return False
    d1 = dims[0]
    tpack_bytes = n * _round_up(3 * d1, _LANES) * 2
    if tpack_bytes > 4 * 1024 * 1024:
        return False
    tile_m = _tile_m_for(m, k, n)
    return m % tile_m == 0 and tile_m * k >= k
