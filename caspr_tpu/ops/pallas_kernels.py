"""Pallas TPU kernels for the sequential/hot point-cloud ops.

Farthest point sampling: an inherently sequential argmax chain (M dependent
iterations).  Under plain XLA each iteration is a while-loop step paying
HBM round-trips for the running min-distance vector; the kernel instead
keeps everything VMEM-resident AND runs all clouds of the batch in
lockstep — batch rides the sublane axis, points ride the lane axis, so one
iteration of the chain advances every cloud with full-width VPU ops
(SURVEY.md §2.2 plan).  M iterations total regardless of batch size,
instead of B*M sequential iterations.

Selection semantics match ops.pointops.farthest_point_sampling_xla (seed
index 0, max-min-squared-distance, lowest-index tie-break) so the two
dispatch interchangeably.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bf16_trunc(x):
    """Truncate an f32 array's mantissa to bf16 width WITHOUT a dtype cast.

    Equivalent to a round-toward-zero f32->bf16->f32 round-trip, expressed
    as a bit mask so the compiler cannot elide it.  This backend forces
    ``--xla_allow_excess_precision=true``, which licenses XLA to drop a
    literal f32->bf16->f32 pair ("keep the excess precision") — that
    silently zeroed the mid/lo components of every cast-based split table
    on hardware (r3 battery: split gather WRONG at every shape while
    CPU/interpret tests passed).  Bit ops have no excess-precision rewrite.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32)


def split3_bf16(t):
    """Exact 3-way bf16 split: hi + mid + lo == t bit-exactly.

    Truncating (not rounding) splits give each component exactly 8 of
    f32's 24 mantissa bits, so every component is bf16-representable and
    every PARTIAL SUM is exactly representable in f32 (any pair spans
    <= 24 bits) — the fold matmul's f32 accumulation reconstructs t
    under ANY association order, a stronger guarantee than the previous
    round-to-nearest 8+9+7 scheme needed case analysis for.
    """
    hi = bf16_trunc(t)
    r1 = t - hi
    mid = bf16_trunc(r1)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def split2_bf16(t):
    """2-way bf16 split: hi + lo == t to ~16 mantissa bits (lo's bf16
    rounding leaves an O(2^-17) relative error — call sites document
    where that term lands)."""
    hi = bf16_trunc(t)
    lo = t - hi
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _interpret_forced() -> bool:
    """True under pltpu.force_tpu_interpret_mode (kernels execute on the
    CPU interpreter, so hardware-only constraints don't apply).

    Reads the PRIVATE jax._src.config state backing
    ``pltpu.force_tpu_interpret_mode`` (no public query exists as of
    jax 0.9).  A missing attribute after a JAX upgrade raises loudly
    instead of silently returning False — a silent False here would
    spuriously re-arm hardware-only trace-time guards (e.g. the DMA
    gather's C%128 check) under interpret-mode tests."""
    from jax._src import config as _jcfg

    ctx = getattr(_jcfg, "pallas_tpu_interpret_mode_context_manager", None)
    if ctx is None:
        raise RuntimeError(
            "jax._src.config.pallas_tpu_interpret_mode_context_manager "
            "moved in this JAX version; update "
            "caspr_tpu.ops.pallas_kernels._interpret_forced to the new "
            "location of the force_tpu_interpret_mode state."
        )
    return ctx.value is not None


def _fps_kernel(num_samples, n, xs_ref, ys_ref, zs_ref, idx_ref):
    """One grid program = a VMEM-budget-sized tile of clouds in lockstep.

    xs/ys/zs: (R, N_pad) coordinates in VMEM (one cloud per row).
    idx_ref:  (R, M_pad) int32 output.
    """
    xs = xs_ref[:]
    ys = ys_ref[:]
    zs = zs_ref[:]
    rows, n_pad = xs.shape
    m_pad = idx_ref.shape[1]

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
    valid = lane < n
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, m_pad), 1)

    def body(i, carry):
        min_d, last, out = carry
        # per-row coords of each row's last pick via masked row reduction
        sel = (lane == last).astype(xs.dtype)  # last: (R, 1)
        cx = jnp.sum(xs * sel, axis=1, keepdims=True)
        cy = jnp.sum(ys * sel, axis=1, keepdims=True)
        cz = jnp.sum(zs * sel, axis=1, keepdims=True)
        d = (
            (xs - cx) * (xs - cx)
            + (ys - cy) * (ys - cy)
            + (zs - cz) * (zs - cz)
        )
        min_d = jnp.minimum(min_d, d)
        # row-wise argmax via max + lowest-matching-lane (Mosaic's native
        # argmax lowering rejects some tile shapes; this is two reductions)
        row_max = jnp.max(min_d, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(min_d == row_max, lane, jnp.int32(n_pad)),
            axis=1,
            keepdims=True,
        ).astype(jnp.int32)
        out = jnp.where(out_lane == i, nxt, out)
        return min_d, nxt, out

    init_min = jnp.where(
        valid,
        jnp.full((rows, n_pad), jnp.inf, xs.dtype),
        jnp.full((rows, n_pad), -jnp.inf, xs.dtype),
    )
    init_out = jnp.zeros((rows, m_pad), jnp.int32)  # slot 0 = seed index 0
    _, _, out = jax.lax.fori_loop(
        1, num_samples, body, (init_min, jnp.zeros((rows, 1), jnp.int32), init_out)
    )
    idx_ref[:] = out


def _d2_from_coords(cent, srct, n):
    """Exact-f32 VPU pairwise squared distances inside a kernel.

    cent: (Mb, 4) padded [x,y,z,0] center rows; srct: (4, N_pad) padded
    transposed source coords -> (Mb, N_pad) f32, +inf at lanes >= n.
    Replaces the XLA-side (B, M, N) distance materialization (HBM write
    + kernel re-read, ~10 GB per forward at the eval point) with an
    in-VMEM broadcast accumulation from the raw coordinates."""
    rows = cent.shape[0]
    n_pad = srct.shape[1]
    d2 = jnp.zeros((rows, n_pad), jnp.float32)
    for ax in range(3):
        diff = cent[:, ax:ax + 1] - srct[ax:ax + 1, :]
        d2 = d2 + diff * diff
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
    return jnp.where(lane < n, d2, jnp.inf)


def _extract_first_k(k, n, r2, d2, k_pad):
    """Per-row extraction of the first k in-ball source indices from a
    (Mb, N_pad) squared-distance tile (padding lanes must be +inf or
    masked by lane < n).

    Same semantics as the CUDA ball query behind kaolin's grouping
    (first-K within radius in index order, pad with first hit, 0 if the
    ball is empty).  Each in-ball lane's 1-based rank comes from a
    Hillis-Steele prefix sum over lanes (log2(N) roll+add steps); the K
    output slots are then extracted TWO per masked row-sum — the even
    slot's lane index and the odd slot's lane index occupy disjoint bit
    ranges of one int32 sum (lane < base, so lane_even + base*lane_odd
    decodes exactly; a rank matches at most one lane per row).  Replaced
    one row-sum per slot (r2), itself a replacement for K rounds of
    5-pass max-extract-and-clear (r1, 36.5 -> 23.0 ms at SA1 K=32);
    identical outputs.
    """
    rows, n_pad = d2.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)

    inball = (d2 < r2) & (lane < n)
    rank = _lane_prefix_sum(inball.astype(jnp.int32), lane, n_pad)
    return _slot_extract(k, inball, rank, lane, n_pad, k_pad)


def _lane_prefix_sum(x, lane, n_pad):
    """Inclusive Hillis-Steele prefix sum over the lane axis (int32)."""
    shift = 1
    while shift < n_pad:
        rolled = pltpu.roll(x, shift, 1)
        x = x + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    return x


def _slot_extract(k, inball, rank, lane, n_pad, k_pad):
    """Emit the first-k in-ball lane indices (pad-with-first) given the
    in-ball mask and its inclusive per-lane rank — two slots per masked
    row-sum via the disjoint-bit-range packing (see _extract_first_k)."""
    rows = inball.shape[0]
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, k_pad), 1)
    total = rank[:, n_pad - 1:n_pad]  # (Mb, 1) in-ball count
    first = jnp.min(jnp.where(inball, lane, n_pad), axis=1, keepdims=True)
    first = jnp.where(first == jnp.int32(n_pad), 0, first).astype(jnp.int32)

    base = 1
    shift_bits = 0
    while base < n_pad:  # pow2 packing base >= any lane value + 1
        base *= 2
        shift_bits += 1
    rank0 = rank - 1  # 0-based rank (valid where inball)
    # lane scaled by base**parity(rank0); zero elsewhere so stray rank
    # collisions on out-of-ball lanes contribute nothing
    packed = jnp.where(
        inball, lane * (1 + jnp.bitwise_and(rank0, 1) * (base - 1)), 0
    )
    half = jnp.right_shift(rank0, 1)

    def body(i, out):
        s = jnp.sum(
            jnp.where(inball & (half == i), packed, 0), axis=1, keepdims=True
        )
        lo = jnp.bitwise_and(s, base - 1)  # base is a power of two
        hi = jnp.right_shift(s, shift_bits)
        lo = jnp.where(total > 2 * i, lo, first)  # pad-with-first (0 if none)
        hi = jnp.where(total > 2 * i + 1, hi, first)
        out = jnp.where(out_lane == 2 * i, lo, out)
        return jnp.where(out_lane == 2 * i + 1, hi, out)

    return jax.lax.fori_loop(
        0, (k + 1) // 2, body, jnp.zeros((rows, k_pad), jnp.int32)
    )


def _extract_first_k_pair(k1, r2a, k2, r2b, n, d2, k1_pad, k2_pad):
    """Both grouping scales of one SA level from ONE distance tile: the
    two in-ball masks (r2a < r2b) ride a SINGLE packed prefix sum — each
    mask's running count occupies a disjoint bit range of one int32
    (counts <= n_pad < 2^shift, so lane-wise addition never carries
    across ranges) — then each radius runs its own slot extraction.
    Outputs are identical to two _extract_first_k calls on the same d2.
    """
    rows, n_pad = d2.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
    inball1 = (d2 < r2a) & (lane < n)
    inball2 = (d2 < r2b) & (lane < n)
    bits = 1
    while (1 << bits) <= n_pad:  # counts reach n_pad, need strict room
        bits += 1
    comb = inball1.astype(jnp.int32) + (
        inball2.astype(jnp.int32) << bits
    )
    comb = _lane_prefix_sum(comb, lane, n_pad)
    rank1 = jnp.bitwise_and(comb, (1 << bits) - 1)
    rank2 = jnp.right_shift(comb, bits)
    return (
        _slot_extract(k1, inball1, rank1, lane, n_pad, k1_pad),
        _slot_extract(k2, inball2, rank2, lane, n_pad, k2_pad),
    )


def _first_k_kernel(k, n, r2, d2_ref, idx_ref):
    """Legacy two-step orientation: d2 (1, Mb, N_pad) precomputed by XLA
    (padding = +inf), idx (1, Mb, K_pad) int32 out."""
    d2 = d2_ref[0]
    idx_ref[0] = _extract_first_k(k, n, r2, d2, idx_ref.shape[2])


def _first_k_fused_kernel(k, n, r2, cent_ref, srct_ref, idx_ref):
    """Fused orientation: cent (1, Mb, 4) center coords, srct (1, 4,
    N_pad) transposed source coords; distances computed in-VMEM."""
    d2 = _d2_from_coords(cent_ref[0], srct_ref[0], n)
    idx_ref[0] = _extract_first_k(k, n, r2, d2, idx_ref.shape[2])


def _first_k_pair_kernel(k1, r2a, k2, r2b, n, cent_ref, srct_ref,
                         idx1_ref, idx2_ref):
    """Dual-radius fused ball query: ONE in-VMEM distance tile + ONE
    packed prefix sum serve both grouping scales of an SA level (the
    two-call form recomputes the identical (Mb, N) d2 and runs two full
    prefix sums — see _extract_first_k_pair)."""
    d2 = _d2_from_coords(cent_ref[0], srct_ref[0], n)
    idx1_ref[0], idx2_ref[0] = _extract_first_k_pair(
        k1, r2a, k2, r2b, n, d2, idx1_ref.shape[2], idx2_ref.shape[2])


def _extract_knn3(d2, k_pad):
    """Per-row 3 smallest squared distances + indices (lowest-index ties)
    from a (Mb, N_pad) tile (padding lanes must be +inf)."""
    rows, n_pad = d2.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, n_pad), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (rows, k_pad), 1)
    big = jnp.float32(jnp.inf)

    def body(i, carry):
        cur, dout, iout = carry
        rowmin = jnp.min(cur, axis=1, keepdims=True)
        idx = jnp.min(
            jnp.where(cur == rowmin, lane, jnp.int32(n_pad)),
            axis=1,
            keepdims=True,
        )
        dout = jnp.where(out_lane == i, rowmin, dout)
        iout = jnp.where(out_lane == i, idx, iout)
        cur = jnp.where(lane == idx, big, cur)
        return cur, dout, iout

    d0 = jnp.zeros((rows, k_pad), jnp.float32)
    i0 = jnp.zeros((rows, k_pad), jnp.int32)
    _, dout, iout = jax.lax.fori_loop(0, 3, body, (d2, d0, i0))
    return dout, iout


def _knn3_kernel(n, d2_ref, dist_ref, idx_ref):
    """Legacy two-step orientation: d2 (1, Mb, N_pad) precomputed by XLA
    (padding = +inf); dist/idx: (1, Mb, K_pad)."""
    del n
    dist_ref[0], idx_ref[0] = _extract_knn3(d2_ref[0], idx_ref.shape[2])


def _knn3_fused_kernel(n, cent_ref, srct_ref, dist_ref, idx_ref):
    """Fused orientation: cent (1, Mb, 4) query coords, srct (1, 4,
    M_pad) transposed source coords; distances computed in-VMEM."""
    d2 = _d2_from_coords(cent_ref[0], srct_ref[0], n)
    dist_ref[0], idx_ref[0] = _extract_knn3(d2, idx_ref.shape[2])


def _gather_kernel(n, src_ref, idx_ref, out_ref):
    """One-hot-matmul row gather: out (C, tr) = src^T (C, N) @ onehot (N, tr).

    XLA's TPU gather is effectively row-at-a-time and dominated encoder
    time (group_points + three_interpolate ~= 470 ms of a 545 ms
    pointnet2_apply at B'=160); as a dense contraction it rides the MXU.
    Precision MUST be HIGHEST: the default one-pass-bf16 matmul would
    truncate the gathered values, while with one exact 1.0 per column the
    multi-pass f32 algorithm reproduces rows bit-exactly.
    """
    src = src_ref[0]  # (N, C)
    idx = idx_ref[0]  # (1, tr)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, idx.shape[-1]), 0)
    onehot = (iota == idx).astype(jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        src,
        onehot,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.jit
def _gather_rows_call(src, idx):
    b, n, c = src.shape
    r = idx.shape[1]
    r_pad = _round_up(r, _LANES)
    # clamp like jnp.take_along_axis so out-of-range indices cannot
    # silently produce all-zero rows from the one-hot comparison
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    idx3 = jnp.pad(idx, ((0, 0), (0, r_pad - r)))[:, None, :]
    tr = min(256, r_pad)
    while r_pad % tr:
        tr //= 2
    out = pl.pallas_call(
        functools.partial(_gather_kernel, n),
        grid=(b, r_pad // tr),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, tr), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, r_pad), jnp.float32),
    )(src, idx3)
    return jnp.moveaxis(out[:, :, :r], 1, 2)


def _gather_split_kernel(n, c, tile, tpack_ref, idx_ref, out_ref):
    """Exact one-bf16-pass row gather of a 3-way-split packed table.

    tpack: (1, N, 3C) bf16 — [hi|mid|lo] with hi+mid+lo == src exactly
    (truncating 8+8+8 split, see split3_bf16 — the split MUST be built
    with bit masks, not casts: the backend's forced
    --xla_allow_excess_precision elides cast round-trips and zeroes
    mid/lo, the r3-battery "WRONG at every shape" bug); idx: (1, tile,
    1) int32 in [0, N); out: (1, tile, C) f32, rows-major (no moveaxis
    afterwards).

    The one-hot contraction is exact in ONE default-precision bf16 MXU
    pass: each product is 1.0 * component with f32 accumulation.  The
    [I;I;I] fold matmul is exact too — the gathered components are
    bf16-representable, each carries a disjoint 8-bit slice of the
    mantissa, so every partial sum spans <= 24 bits and the f32
    accumulation reconstructs src under any association order.
    Replaces the 6-pass HIGHEST-precision orientation of _gather_kernel,
    whose (C, rows) output additionally paid a relayout copy at every
    call site (measured ~115 ms/iter of the 350 ms pointnet2 backbone
    at B'=160)."""
    idx = idx_ref[0]  # (tile, 1)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    onehot = (iota_n == idx).astype(jnp.bfloat16)
    gp = jax.lax.dot_general(
        onehot, tpack_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # pinned: a global default_matmul_precision('highest') otherwise
        # leaks fp32 contract precision onto bf16 operands, which Mosaic
        # rejects -- and these one-hot bf16 dots are exact by construction
        precision=jax.lax.Precision.DEFAULT)  # (tile, 3C), comps bf16-exact
    f0 = jax.lax.broadcasted_iota(jnp.int32, (3 * c, c), 0)
    f1 = jax.lax.broadcasted_iota(jnp.int32, (3 * c, c), 1)
    fold = (f0 % c == f1).astype(jnp.bfloat16)
    out_ref[0] = jax.lax.dot_general(
        gp.astype(jnp.bfloat16), fold, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


@jax.jit
def _gather_rows_split_call(src, idx):
    b, n, c = src.shape
    r = idx.shape[1]
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    hi, mid, lo = split3_bf16(src)
    tpack = jnp.concatenate([hi, mid, lo], axis=-1)  # (B, N, 3C)
    r_pad = _round_up(r, _LANES)
    if r_pad != r:
        idx = jnp.pad(idx, ((0, 0), (0, r_pad - r)))
    tile = min(1024, r_pad)
    while r_pad % tile:
        tile //= 2
    kernel = functools.partial(_gather_split_kernel, n, c, tile)
    out = pl.pallas_call(
        kernel,
        grid=(b, r_pad // tile),
        in_specs=[
            pl.BlockSpec((1, n, 3 * c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, c), jnp.float32),
    )(tpack, idx.reshape(b, r_pad, 1))
    return out[:, :r]


def _interp3_kernel(m, c_pad, tile, fpack_ref, idx_ref, w_ref, out_ref):
    """Weighted 3-row gather (three_interpolate) with the interpolation
    matrix built in-VMEM.

    fpack: (1, M_pad, 3*C_pad) bf16 — exact 3-way split [hi|mid|lo] of
    the (M, C) source features (see _gather_split_kernel); idx: (1,
    tile, 4) int32 (3 valid columns); w: (1, tile, 4) f32; out: (1,
    tile, C_pad) f32.

    The XLA dense path (pointops._three_interpolate_dense) materializes
    the (B, N, M) interpolation matrix plus its bf16 hi/lo copies in HBM
    (~7 GB at the FP5 eval shape); here the A-tile is 3 weighted
    compares on the VPU and never leaves VMEM.  Same 4-product precision
    scheme: out = ah@(fh+fm+fl) + al@fh with the O(2^-18) al@(fm+fl)
    term dropped — via ONE bf16 MXU pass over the packed table
    (column-block sums replace separate dots) plus the al@fh pass.
    """
    idx = idx_ref[0]  # (tile, 4)
    w = w_ref[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, m), 1)
    a = jnp.zeros((tile, m), jnp.float32)
    for j in range(3):
        a = a + w[:, j:j + 1] * (iota == idx[:, j:j + 1]).astype(jnp.float32)
    ah, al = split2_bf16(a)
    fpack = fpack_ref[0]
    gp = jax.lax.dot_general(
        ah, fpack, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # (tile, 3*C_pad)
    g4 = jax.lax.dot_general(
        al, fpack[:, :c_pad], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)
    out_ref[0] = (
        gp[:, :c_pad] + gp[:, c_pad:2 * c_pad] + gp[:, 2 * c_pad:] + g4
    )


def _interp3_tile(m, c) -> int:
    """Largest query-row tile fitting the VMEM budget (0 = kernel does
    not fit): the packed split table double-buffers across batch; per
    tile row the A build (f32 + bf16 hi/lo) spans m_pad lanes and the
    packed product + out span c_pad."""
    c_pad = _round_up(c, _LANES)
    m_pad = _round_up(m, _LANES)
    fpack_db = m_pad * 3 * c_pad * 2 * 2
    budget = 12 * 1024 * 1024 - fpack_db
    per_row = m_pad * 8 + c_pad * 24
    tile = min(256, budget // per_row // 8 * 8)
    return max(tile, 0)


@jax.jit
def _three_interpolate_call(features, idx, weights):
    b, m, c = features.shape
    n = idx.shape[1]
    c_pad = _round_up(c, _LANES)
    m_pad = _round_up(m, _LANES)
    hi, mid, lo = split3_bf16(features)
    comp_pad = ((0, 0), (0, m_pad - m), (0, c_pad - c))
    fpack = jnp.concatenate(
        [jnp.pad(t, comp_pad) for t in (hi, mid, lo)], axis=-1
    )  # (B, M_pad, 3*C_pad)
    tile = min(_interp3_tile(m, c), _round_up(n, 8))
    n_pad = _round_up(n, tile)
    idx4 = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, n_pad - n), (0, 1)))
    w4 = jnp.pad(weights.astype(jnp.float32),
                 ((0, 0), (0, n_pad - n), (0, 1)))
    kernel = functools.partial(_interp3_kernel, m_pad, c_pad, tile)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, m_pad, 3 * c_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, c_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_pad), jnp.float32),
    )(fpack, idx4, w4)
    return out[:, :n, :c]


def three_interpolate_vmem_ok(m, c) -> bool:
    """VMEM guard for the fused interpolation kernel (see _interp3_tile)."""
    return _interp3_tile(m, c) >= 8


def _interp3_shuf_kernel(nblk, nsub, c_pad, ft_ref, idx_ref, w_ref, out_ref):
    """three_interpolate via the lane-shuffle gather (see
    _gather_shuf_kernel): ft (1, C_pad, M_pad) transposed source
    features; idx (1, 4, tile) int32 (3 valid rows); w (1, 4, tile) f32;
    out (1, C_pad, tile) channels-major.

    out[:, r] = sum_j w[j, r] * ft[:, idx[j, r]] — the three gathered
    columns are EXACT f32 moves and the weighted accumulation runs in
    f32 on the VPU, so this orientation is exact to f32 rounding of the
    3-term sum (the MXU orientation drops an O(2^-18) cross term).

    Loop order is subtile-outer/neighbor/block-inner so only ONE
    (c_pad, 128) accumulator plus one broadcast index/weight plane is
    live at a time — the hoisted-planes variant kept 9*nsub planes live
    and blew the 16 MB VMEM scope at the FP5 shape (C=512, tile 512:
    24.2M, r5 battery stage 11).
    """
    for s in range(nsub):
        sl = idx_ref[0, :3, s * _LANES:(s + 1) * _LANES]  # (3, 128)
        wl = w_ref[0, :3, s * _LANES:(s + 1) * _LANES]
        acc = jnp.zeros((c_pad, _LANES), jnp.float32)
        for j in range(3):
            lo = jnp.broadcast_to(
                jax.lax.rem(sl[j:j + 1], _LANES), (c_pad, _LANES))
            hi = jnp.broadcast_to(
                jax.lax.div(sl[j:j + 1], _LANES), (c_pad, _LANES))
            wj = jnp.broadcast_to(wl[j:j + 1], (c_pad, _LANES))
            for b in range(nblk):
                blk = ft_ref[0, :, b * _LANES:(b + 1) * _LANES]
                g = jnp.take_along_axis(blk, lo, axis=1)
                acc = jnp.where(hi == b, acc + wj * g, acc)
        out_ref[0, :, s * _LANES:(s + 1) * _LANES] = acc


@jax.jit
def _three_interpolate_shuf_call(features, idx, weights):
    b, m, c = features.shape
    n = idx.shape[1]
    c_pad = _round_up(c, 8)
    m_pad = _round_up(m, _LANES)
    ft = jnp.moveaxis(features, 1, 2)  # (B, C, M)
    ft = jnp.pad(ft, ((0, 0), (0, c_pad - c), (0, m_pad - m)))
    n_pad = _round_up(n, _LANES)
    idx4 = jnp.clip(idx.astype(jnp.int32), 0, m - 1)
    idx4 = jnp.pad(jnp.moveaxis(idx4, 1, 2),
                   ((0, 0), (0, 1), (0, n_pad - n)))  # (B, 4, N_pad)
    w4 = jnp.pad(jnp.moveaxis(weights.astype(jnp.float32), 1, 2),
                 ((0, 0), (0, 1), (0, n_pad - n)))
    tile = _shuf_tile(n_pad, c_pad)
    kernel = functools.partial(
        _interp3_shuf_kernel, m_pad // _LANES, tile // _LANES, c_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // tile),
        in_specs=[
            pl.BlockSpec((1, c_pad, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_pad, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_pad, n_pad), jnp.float32),
    )(ft, idx4, w4)
    return jnp.moveaxis(out[:, :c, :n], 1, 2)


def can_interp_shuf(m: int, c: int) -> bool:
    """Applicability of the shuf interpolation: transposed feature table
    within the VMEM budget (same rule as can_gather_shuf)."""
    return can_gather_shuf(m, c)


@jax.custom_vjp
def three_interpolate_pallas(features, idx, weights):
    """Fused three_interpolate: features (B, M, C) f32, idx (B, N, 3)
    int32, weights (B, N, 3) f32 -> (B, N, C) f32.  Value semantics of
    pointops._three_interpolate_dense (same 4-product bf16 scheme);
    VJP runs the dense composition's transpose (cheap relative to
    training's conv stacks, and gradients stay bit-compatible with the
    dense path)."""
    return _three_interpolate_call(features, idx, weights)


def _interp3_fwd(features, idx, weights):
    return three_interpolate_pallas(features, idx, weights), (
        features, idx, weights)


def _interp3_bwd(res, ct):
    from .pointops import _three_interpolate_dense

    features, idx, weights = res
    _, vjp = jax.vjp(
        lambda f, w: _three_interpolate_dense(f, idx, w), features, weights)
    dfeat, dw = vjp(ct)
    return dfeat, jnp.zeros_like(idx), dw


three_interpolate_pallas.defvjp(_interp3_fwd, _interp3_bwd)


@jax.custom_vjp
def three_interpolate_shuf(features, idx, weights):
    """three_interpolate via exact f32 lane-shuffle gathers + f32 VPU
    accumulation (see _interp3_shuf_kernel).  Same interface/VJP as
    three_interpolate_pallas; values exact to f32 rounding of the
    3-term weighted sum."""
    return _three_interpolate_shuf_call(features, idx, weights)


def _interp3s_fwd(features, idx, weights):
    return three_interpolate_shuf(features, idx, weights), (
        features, idx, weights)


three_interpolate_shuf.defvjp(_interp3s_fwd, _interp3_bwd)


def _gather_shuf_kernel(nblk, nsub, c_pad, rows_major, pack_k, srct_ref,
                        idx_ref, out_ref):
    """Block-decomposed in-VMEM lane-shuffle gather (working formulation).

    srct: (1, C_pad, N_pad) transposed source table (channels on
    sublanes, points on lanes); idx: (1, 1, tile) int32 in [0, N);
    out: (1, C_pad, tile), tile = nsub * 128.

    The r3 `blk` orientation replicated each 128-lane source block
    across the full tile width and gathered once — Mosaic rejects any
    dynamic lane gather whose gather dimension spans more than one vreg
    ("Multiple source vregs along gather dimension").  This version
    keeps every gather EXACTLY 128 lanes wide: the tile is processed as
    nsub 128-row subtiles, and each (source block, subtile) pair does
    one single-vreg-wide dynamic lane shuffle (jnp.take_along_axis,
    axis=1) keyed by the index's low 7 bits, selected into the
    subtile's accumulator where the high bits match the block
    (hardware-verified exact, tools/probe_dyngather2.py: tile=128
    compiles and returns maxerr=0.0; every wider gather dim fails).

    Work is ~2*nblk VPU ops per 128-row-by-C_pad subtile — independent
    of N per element — vs the one-hot kernels' N-wide MXU contraction
    per row, and the copied values are EXACT f32 moves (no split
    tables, no precision story at all).
    """
    idx = idx_ref[0]  # (1, tile)
    los = []
    his = []
    for s in range(nsub):
        sl = idx[:, s * _LANES:(s + 1) * _LANES]  # (1, 128)
        los.append(jnp.broadcast_to(
            jax.lax.rem(sl, _LANES), (c_pad, _LANES)))
        his.append(jnp.broadcast_to(
            jax.lax.div(sl, _LANES), (c_pad, _LANES)))
    accs = [jnp.zeros((c_pad, _LANES), jnp.float32) for _ in range(nsub)]
    for b in range(nblk):
        blk = srct_ref[0, :, b * _LANES:(b + 1) * _LANES]  # (C_pad, 128)
        for s in range(nsub):
            g = jnp.take_along_axis(blk, los[s], axis=1)
            accs[s] = jnp.where(his[s] == b, g, accs[s])
    if pack_k:
        # lanes-packed emit: consecutive pack_k gathered rows fold into
        # the lane dim — out (tile // pack_k, pack_k * C_pad), the layout
        # the packed SA conv stack consumes (ops/sa_packed.py).  One
        # in-VMEM transpose + sublane->lane reshape per subtile, one
        # full-tile store (subtile rows can be < 8 sublanes when
        # pack_k = 32, so individual stores would be unaligned).
        pks = [
            jnp.transpose(accs[s]).reshape(_LANES // pack_k, pack_k * c_pad)
            for s in range(nsub)
        ]
        out_ref[0] = jnp.concatenate(pks, axis=0)
        return
    for s in range(nsub):
        if rows_major:
            # emit (tile, C_pad) directly — one in-VMEM subtile
            # transpose replaces the caller's (B, C, R) -> (B, R, C)
            # HBM moveaxis pass (CASPR_TPU_GATHER_SHUF_ROWS A/B)
            out_ref[0, s * _LANES:(s + 1) * _LANES, :] = jnp.transpose(
                accs[s])
        else:
            out_ref[0, :, s * _LANES:(s + 1) * _LANES] = accs[s]


def _shuf_tile(r_pad: int, c_pad: int) -> int:
    """Rows per grid step: amortize grid overhead, bound the live
    per-subtile accumulators (c_pad * tile * 4 bytes) to ~1 MB.
    CASPR_TPU_GATHER_SHUF_TILE overrides."""
    try:
        env = int(os.environ.get("CASPR_TPU_GATHER_SHUF_TILE", "1024"))
    except ValueError:
        env = 1024
    cap = max(_LANES, (1 << 20) // (c_pad * 4) // _LANES * _LANES)
    tile = min(max(env, _LANES), cap, r_pad)
    tile = tile // _LANES * _LANES
    while r_pad % tile:
        tile -= _LANES
    return tile


@jax.jit
def _gather_rows_shuf_call(src, idx):
    b, n, c = src.shape
    r = idx.shape[1]
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    n_pad = _round_up(n, _LANES)
    c_pad = _round_up(c, 8)
    srct = jnp.moveaxis(src, 1, 2)  # (B, C, N)
    srct = jnp.pad(srct, ((0, 0), (0, c_pad - c), (0, n_pad - n)))
    r_pad = _round_up(r, _LANES)
    if r_pad != r:
        idx = jnp.pad(idx, ((0, 0), (0, r_pad - r)))
    tile = _shuf_tile(r_pad, c_pad)
    # Default 1 (r5b stage 44 hardware A/B): emitting (tile, C) directly
    # via in-VMEM subtile transposes beats the HBM moveaxis pass the
    # channels-major orientation needs — pointnet2 179.6 -> 161.4 ms warm
    # at B'=160, end-to-end output bit-identical (exact f32 moves either
    # way).
    rows_major = os.environ.get("CASPR_TPU_GATHER_SHUF_ROWS", "1") == "1"
    kernel = functools.partial(
        _gather_shuf_kernel, n_pad // _LANES, tile // _LANES, c_pad,
        rows_major, 0)
    if rows_major:
        out = pl.pallas_call(
            kernel,
            grid=(b, r_pad // tile),
            in_specs=[
                pl.BlockSpec((1, c_pad, n_pad), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, c_pad), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, r_pad, c_pad), jnp.float32),
        )(srct, idx.reshape(b, 1, r_pad))
        return out[:, :r, :c]
    out = pl.pallas_call(
        kernel,
        grid=(b, r_pad // tile),
        in_specs=[
            pl.BlockSpec((1, c_pad, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_pad, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_pad, r_pad), jnp.float32),
    )(srct, idx.reshape(b, 1, r_pad))
    return jnp.moveaxis(out[:, :c, :r], 1, 2)


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_rows_shuf_packed_call(src, idx, k):
    """Lane-shuffle gather emitting the lanes-packed layout directly:
    src (B, N, C) f32, idx (B, R) int32 with R % k == 0 ->
    (B, R // k, k * C) where packed row q holds gathered rows
    q*k .. q*k+k-1 on consecutive lane groups.

    This is the layout ops/sa_packed.py's conv stack consumes; emitting
    it from the gather's VMEM epilogue skips both the 128-lane-padded
    (R, C) HBM round-trip (C = 16..64 at the SA levels pads 2-8x) and
    the separate repack pass.  Requires C % 8 == 0 and k | 128
    (subtile rows fold into lanes inside one vreg row group).
    """
    b, n, c = src.shape
    r = idx.shape[1]
    if c % 8 or _LANES % k or r % k:
        raise ValueError(
            f"packed shuf gather needs C % 8 == 0, k | {_LANES}, "
            f"R % k == 0; got C={c}, k={k}, R={r}")
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    n_pad = _round_up(n, _LANES)
    srct = jnp.moveaxis(src, 1, 2)  # (B, C, N)
    srct = jnp.pad(srct, ((0, 0), (0, 0), (0, n_pad - n)))
    r_pad = _round_up(r, _LANES)
    if r_pad != r:
        idx = jnp.pad(idx, ((0, 0), (0, r_pad - r)))
    tile = _shuf_tile(r_pad, c)
    kernel = functools.partial(
        _gather_shuf_kernel, n_pad // _LANES, tile // _LANES, c, False, k)
    out = pl.pallas_call(
        kernel,
        grid=(b, r_pad // tile),
        in_specs=[
            pl.BlockSpec((1, c, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile // k, k * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_pad // k, k * c), jnp.float32),
    )(srct, idx.reshape(b, 1, r_pad))
    return out[:, :r // k, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows_shuf_packed(src, idx, k):
    """Differentiable packed-layout gather (see
    _gather_rows_shuf_packed_call).  VJP scatter-adds the cotangent's
    unpacked rows back to their source positions — identical adjoint to
    gather_rows_pallas up to the layout reshape."""
    return _gather_rows_shuf_packed_call(src, idx, k)


def _gather_packed_fwd(src, idx, k):
    return gather_rows_shuf_packed(src, idx, k), (idx, src.shape)


def _gather_packed_bwd(k, res, ct):
    idx, src_shape = res
    b, c = src_shape[0], src_shape[2]
    ct_rows = ct.reshape(b, -1, c)  # (B, R, C): inverse of the lane fold
    return _gather_rows_bwd((idx, src_shape), ct_rows)


gather_rows_shuf_packed.defvjp(_gather_packed_fwd, _gather_packed_bwd)


def can_gather_shuf(n: int, c: int) -> bool:
    """Applicability: transposed source table within the measured
    envelope.  2 MB tables (C=512 x N=1024) compile and win on hardware;
    the 4 MB C=512 x N=2048 case is rejected by the backend compiler
    (r5 ab_gather: tpu_compile_helper exit 1) — likely the kernel's
    unrolled shuffle count at nblk=16, so the guard is the table size
    that bounds it."""
    c_pad = _round_up(c, 8)
    n_pad = _round_up(n, _LANES)
    return c_pad * n_pad * 4 <= 2 * 1024 * 1024


def _gather_dma_kernel(tile, nsem, idx_ref, src_ref, out_ref, sems):
    """Per-row async-copy gather: rows stream HBM -> VMEM out block.

    src_ref: (B, N, C) f32 left in HBM (memory_space=ANY); idx_ref:
    (1, tile) int32 SMEM block; out_ref: (1, tile, C) VMEM block;
    sems: (nsem,) DMA semaphores forming a rolling window of in-flight
    row copies.

    This is the gather primitive BENCHMARKS.md's fused-SA postmortem
    calls for: XLA's take_along_axis and the one-hot MXU contraction
    both pay costs that scale with N (the one-hot build) or with a
    HIGHEST-precision multi-pass matmul; a row DMA pays only the row's
    actual bytes.  Whether the DMA issue rate sustains SA densities
    (~15M rows/forward at B'=160) is a hardware question — kept as a
    dispatchable orientation for A/B (CASPR_TPU_GATHER=dma).
    """
    b = pl.program_id(0)

    def row_dma(r, slot):
        i = idx_ref[0, 0, r]
        return pltpu.make_async_copy(
            src_ref.at[b, pl.ds(i, 1), :],
            out_ref.at[0, pl.ds(r, 1), :],
            sems.at[slot],
        )

    def start(r, _):
        row_dma(r, jax.lax.rem(r, nsem)).start()
        return 0

    jax.lax.fori_loop(0, min(nsem, tile), start, 0)

    def body(r, _):
        row_dma(r, jax.lax.rem(r, nsem)).wait()

        @pl.when(r + nsem < tile)
        def _():
            row_dma(r + nsem, jax.lax.rem(r + nsem, nsem)).start()

        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_rows_dma_call(src, idx, interpret=False):
    b, n, c = src.shape
    r = idx.shape[1]
    # Hardware constraint (r3 battery 6_pn2_dma_allc.log / 7_ab_gather.log):
    # slicing sub-128-lane rows from the HBM source MosaicErrors at every
    # C % 128 != 0 — the per-row copy's blocks violate the last-dim lane
    # alignment rule.  Fail fast at trace time instead of via a remote
    # HTTP-500 compile error; small-C sites belong to split/onehot anyway.
    # (Interpret mode executes any C, so the guard honors both the
    # explicit arg and pltpu.force_tpu_interpret_mode.)
    if not interpret and not _interpret_forced() and c % _LANES != 0:
        raise ValueError(
            f"gather_rows_dma requires C % {_LANES} == 0 on hardware "
            f"(got C={c}); Mosaic rejects sub-lane-width row copies from "
            "HBM. Use the split/onehot kernels for small C.")
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    r_pad = _round_up(r, _LANES)
    if r_pad != r:
        idx = jnp.pad(idx, ((0, 0), (0, r_pad - r)))
    try:
        tile_env = int(os.environ.get("CASPR_TPU_GATHER_DMA_TILE", "2048"))
    except ValueError:
        tile_env = 2048
    tile = min(max(tile_env, _LANES), r_pad)
    while r_pad % tile:
        tile //= 2
    nsem = 16
    kernel = functools.partial(_gather_dma_kernel, tile, nsem)
    out = pl.pallas_call(
        kernel,
        grid=(b, r_pad // tile),
        in_specs=[
            # (b, 1, r_pad) with a (1, 1, tile) block: the Mosaic
            # lowering requires the last-two block dims be (8k, 128m)
            # or EQUAL to the array dims — a (1, tile) block over
            # (b, r_pad) is rejected, a unit middle axis satisfies it.
            pl.BlockSpec((1, 1, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, c), src.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nsem,))],
        interpret=interpret,
    )(idx[:, None, :], src)
    return out[:, :r]


@jax.custom_vjp
def gather_rows_pallas(src, idx):
    """Exact row gather. src: (B, N, C) f32, idx: (B, R) int32 -> (B, R, C).
    Matches jnp.take_along_axis semantics bit-for-bit, including the clamp
    of out-of-range indices to [0, N).

    Four dispatchable orientations (CASPR_TPU_GATHER=shuf|split|onehot|
    dma; auto = shuf where the table fits, else split): the
    block-decomposed lane-shuffle kernel (_gather_shuf_kernel — exact
    f32 moves, ~2*N/128 VPU ops per output subtile, no MXU contraction;
    r5 hardware winner), the split-table rows-major kernel
    (_gather_split_kernel, one bf16 MXU pass + exact fold), the original
    (C, rows) HIGHEST-precision contraction (_gather_kernel), and the
    per-row async-copy kernel (_gather_dma_kernel — source stays in
    HBM, so it has no C or source-slab VMEM limit; requires C % 128 == 0
    on hardware).  The r3 full-tile-wide lane-shuffle variant ('blk')
    stays retired: Mosaic rejects any dynamic lane gather wider than
    one vreg; 'shuf' is its working 128-lane-subtile formulation.

    Differentiable: the VJP scatter-adds cotangent rows back to their
    source positions (the transpose of the one-hot contraction), so the
    C<=32 Pallas dispatch in pointops.gather_points is safe for any
    differentiated input."""
    # default = shuf from the r5 hardware A/B (tools/ab_gather.py,
    # /tmp/r5 4_ab_gather: 1.9-3.4x over split at every SA shape,
    # 6-12x over XLA at the FP shapes) + bit-exactness at every gated
    # shape (hw_exactness stage)
    mode = os.environ.get("CASPR_TPU_GATHER", "shuf")
    if mode == "onehot":
        return _gather_rows_call(src, idx)
    if mode == "dma":
        # hardware requires C lane-aligned (see _gather_rows_dma_call);
        # unaligned sites fall back to split so a global =dma flip keeps
        # the model runnable instead of raising at the C=3 xyz gathers
        if src.shape[-1] % _LANES == 0 or _interpret_forced():
            return _gather_rows_dma_call(src, idx)
        return _gather_rows_split_call(src, idx)
    if mode == "blk":
        raise ValueError(
            "CASPR_TPU_GATHER=blk is retired: Mosaic rejects the "
            "full-tile-wide lane shuffle ('Multiple source vregs along "
            "gather dimension', r3 battery). Use shuf (its working "
            "128-lane-subtile formulation) or split|onehot|dma.")
    if mode == "shuf" and can_gather_shuf(src.shape[1], src.shape[2]):
        return _gather_rows_shuf_call(src, idx)
    return _gather_rows_split_call(src, idx)


def _gather_rows_fwd(src, idx):
    return gather_rows_pallas(src, idx), (idx, src.shape)


def _gather_rows_bwd(res, ct):
    idx, src_shape = res
    n = src_shape[1]
    cidx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)
    dsrc = jax.vmap(
        lambda i, t: jnp.zeros(src_shape[1:], ct.dtype).at[i].add(t)
    )(cidx, ct)
    return dsrc, jnp.zeros_like(idx)


gather_rows_pallas.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def gather_rows_dma(src, idx):
    """Forced per-row async-copy gather (see _gather_dma_kernel): the
    orientation for sites whose C exceeds the VMEM-table kernels' reach.
    Same semantics and VJP as gather_rows_pallas."""
    return _gather_rows_dma_call(src, idx)


def _gather_rows_dma_fwd(src, idx):
    return gather_rows_dma(src, idx), (idx, src.shape)


gather_rows_dma.defvjp(_gather_rows_dma_fwd, _gather_rows_bwd)


def _pairwise_d2_padded(a, b, n_valid):
    """(B, M, 3) x (B, N, 3) -> (B, M, N_pad) squared distances with +inf
    padding.

    Uses the |a|^2 + |b|^2 - 2ab expansion so the (M, N) product rides the
    MXU — the elementwise-difference form materializes a (B, M, N, 3)
    intermediate and dominated encoder time.  The ab contraction MUST run
    at HIGHEST precision: TPU's default one-pass bf16 matmul gives ~2e-3
    absolute d2 error at unit scale, and the r4 hardware probe caught the
    default-precision version selecting ball-query neighbors up to 7%
    OUTSIDE the radius (r^2 = 0.04) while missing in-radius points.  At
    HIGHEST the error is ~1e-7 — orders of magnitude below both the
    smallest ball-query threshold (0.02^2 = 4e-4) and the 1e-8 epsilon of
    the 3-NN interpolation weights, so selection semantics are unaffected.
    """
    ab = jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, M, N)
    d2 = (
        jnp.sum(a * a, axis=-1)[:, :, None]
        + jnp.sum(b * b, axis=-1)[:, None, :]
        - 2.0 * ab
    )
    d2 = jnp.maximum(d2, 0.0)
    n = d2.shape[-1]
    n_pad = _round_up(n, _LANES)
    if n_pad != n:
        d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, n_pad - n)),
                     constant_values=jnp.inf)
    return d2


def _coord_operands(cent_xyz, src_xyz, rows_pad):
    """Pack kernel coordinate operands for the fused-d2 orientation.

    cent_xyz (B, M, 3) -> (B, rows_pad, 4) [x,y,z,0] rows;
    src_xyz (B, N, 3) -> (B, 4, N_pad) transposed coords (zero padding —
    kernels mask lanes >= n with +inf themselves)."""
    b, m, _ = cent_xyz.shape
    n = src_xyz.shape[1]
    n_pad = _round_up(n, _LANES)
    cent = jnp.pad(
        cent_xyz.astype(jnp.float32), ((0, 0), (0, rows_pad - m), (0, 1))
    )
    srct = jnp.moveaxis(src_xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    srct = jnp.pad(srct, ((0, 0), (0, 1), (0, n_pad - n)))
    return cent, srct, n_pad


def _fused_d2() -> bool:
    """Fused in-kernel distance computation (default) vs the legacy
    XLA-materialized (B, M, N) distance matrix.  CASPR_TPU_FUSED_D2=0
    keeps the two-step path for A/B."""
    return os.environ.get("CASPR_TPU_FUSED_D2", "1") != "0"


def ball_query_pallas(xyz, new_xyz, radius: float, num_samples: int):
    """Pallas ball query. xyz: (B,N,3), new_xyz: (B,M,3) -> (B,M,K) int32.
    Matches ops.pointops.ball_query semantics.

    Dispatch (outside the jits so env flips take effect per call):
    fused in-kernel distances by default, CASPR_TPU_FUSED_D2=0 for the
    legacy XLA-materialized distance matrix."""
    if _fused_d2():
        return _ball_query_fused(xyz, new_xyz, radius, num_samples)
    return _ball_query_twostep(xyz, new_xyz, radius, num_samples)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _ball_query_fused(xyz, new_xyz, radius: float, num_samples: int):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    m_pad = _round_up(m, 8)
    k_pad = _round_up(num_samples, _LANES)
    mb = min(m_pad, 256)
    while m_pad % mb:
        mb //= 2
    r2 = float(radius) * float(radius)
    cent, srct, n_pad = _coord_operands(new_xyz, xyz, m_pad)
    kernel = functools.partial(_first_k_fused_kernel, num_samples, n, r2)
    out = pl.pallas_call(
        kernel,
        grid=(b, m_pad // mb),
        in_specs=[
            pl.BlockSpec((1, mb, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, mb, k_pad), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.int32),
    )(cent, srct)
    return out[:, :m, :num_samples]


def ball_query_pair_pallas(xyz, new_xyz, radius1, k1, radius2, k2):
    """Both grouping scales of one SA level in one fused kernel:
    (idx1 (B,M,K1), idx2 (B,M,K2)) == (ball_query(r1,K1),
    ball_query(r2,K2)) on the same (xyz, new_xyz) — the shared (M, N)
    distance tile and a packed prefix sum are computed ONCE."""
    return _ball_query_pair_call(xyz, new_xyz, float(radius1), int(k1),
                                 float(radius2), int(k2))


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _ball_query_pair_call(xyz, new_xyz, radius1, k1, radius2, k2):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    m_pad = _round_up(m, 8)
    k1_pad = _round_up(k1, _LANES)
    k2_pad = _round_up(k2, _LANES)
    mb = min(m_pad, 256)
    while m_pad % mb:
        mb //= 2
    cent, srct, n_pad = _coord_operands(new_xyz, xyz, m_pad)
    kernel = functools.partial(
        _first_k_pair_kernel, k1, radius1 * radius1, k2, radius2 * radius2,
        n)
    idx1, idx2 = pl.pallas_call(
        kernel,
        grid=(b, m_pad // mb),
        in_specs=[
            pl.BlockSpec((1, mb, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, mb, k1_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mb, k2_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m_pad, k1_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, m_pad, k2_pad), jnp.int32),
        ],
    )(cent, srct)
    return idx1[:, :m, :k1], idx2[:, :m, :k2]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _ball_query_twostep(xyz, new_xyz, radius: float, num_samples: int):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    m_pad = _round_up(m, 8)
    k_pad = _round_up(num_samples, _LANES)
    mb = min(m_pad, 256)
    # block row count must divide m_pad
    while m_pad % mb:
        mb //= 2
    r2 = float(radius) * float(radius)

    d2 = _pairwise_d2_padded(new_xyz, xyz, n)
    if m_pad != m:
        d2 = jnp.pad(d2, ((0, 0), (0, m_pad - m), (0, 0)),
                     constant_values=jnp.inf)
    kernel = functools.partial(_first_k_kernel, num_samples, n, r2)
    out = pl.pallas_call(
        kernel,
        grid=(b, m_pad // mb),
        in_specs=[
            pl.BlockSpec(
                (1, mb, d2.shape[-1]),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, mb, k_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, k_pad), jnp.int32),
    )(d2)
    return out[:, :m, :num_samples]


def three_nn_pallas(query_xyz, source_xyz):
    """Pallas 3-NN. query: (B,N,3), source: (B,M,3) -> (d2 (B,N,3),
    idx (B,N,3) int32), squared distances like kaolin three_nn.

    Dispatch (outside the jits so env flips take effect per call):
    fused in-kernel distances by default, CASPR_TPU_FUSED_D2=0 for the
    legacy path.  The legacy path's XLA |a|^2+|b|^2-2ab expansion and
    the fused kernel's elementwise sum-of-squared-diffs agree to ~1e-7
    on unit-scale coordinates — both orders of magnitude below the
    1e-8-epsilon'd inverse-distance weighting downstream."""
    if _fused_d2():
        return _three_nn_fused(query_xyz, source_xyz)
    return _three_nn_twostep(query_xyz, source_xyz)


def _knn3_specs(b, q_pad, mb, k_pad):
    out_specs = [
        pl.BlockSpec((1, mb, k_pad), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mb, k_pad), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, q_pad, k_pad), jnp.float32),
        jax.ShapeDtypeStruct((b, q_pad, k_pad), jnp.int32),
    ]
    return out_specs, out_shape


@jax.jit
def _three_nn_fused(query_xyz, source_xyz):
    b, nq, _ = query_xyz.shape
    q_pad = _round_up(nq, 8)
    k_pad = _LANES
    mb = min(q_pad, 256)
    while q_pad % mb:
        mb //= 2
    out_specs, out_shape = _knn3_specs(b, q_pad, mb, k_pad)
    cent, srct, s_pad = _coord_operands(query_xyz, source_xyz, q_pad)
    kernel = functools.partial(_knn3_fused_kernel, source_xyz.shape[1])
    dist, idx = pl.pallas_call(
        kernel,
        grid=(b, q_pad // mb),
        in_specs=[
            pl.BlockSpec((1, mb, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, s_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(cent, srct)
    return dist[:, :nq, :3], idx[:, :nq, :3]


@jax.jit
def _three_nn_twostep(query_xyz, source_xyz):
    b, nq, _ = query_xyz.shape
    q_pad = _round_up(nq, 8)
    k_pad = _LANES
    mb = min(q_pad, 256)
    while q_pad % mb:
        mb //= 2
    out_specs, out_shape = _knn3_specs(b, q_pad, mb, k_pad)
    d2 = _pairwise_d2_padded(query_xyz, source_xyz, source_xyz.shape[1])
    if q_pad != nq:
        d2 = jnp.pad(d2, ((0, 0), (0, q_pad - nq), (0, 0)),
                     constant_values=jnp.inf)
    kernel = functools.partial(_knn3_kernel, source_xyz.shape[1])
    dist, idx = pl.pallas_call(
        kernel,
        grid=(b, q_pad // mb),
        in_specs=[
            pl.BlockSpec(
                (1, mb, d2.shape[-1]),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(d2)
    return dist[:, :nq, :3], idx[:, :nq, :3]


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sampling_pallas(xyz, num_samples: int):
    """Pallas FPS. xyz: (B, N, 3) -> (B, M) int32.

    Falls back to identity ordering when num_samples >= N (set-equivalent;
    see ops.pointops.farthest_point_sampling_xla)."""
    b, n, _ = xyz.shape
    if num_samples >= n:
        idx = jnp.arange(n, dtype=jnp.int32)
        if num_samples > n:
            idx = jnp.concatenate(
                [idx, jnp.zeros((num_samples - n,), jnp.int32)]
            )
        return jnp.broadcast_to(idx, (b, num_samples))

    n_pad = _round_up(n, _LANES)
    # Grid programs run sequentially on the TensorCore, so every extra
    # row tile multiplies the M dependent iterations — take the largest
    # row count the VMEM budget allows (lockstep rows are ~free; B=160
    # at N=2048 drops 5 programs x M iters to 1 x M).  Live f32 lanes
    # arrays per row: xs/ys/zs + min_d + sel + d + lane + init (~8);
    # inputs double-buffer across programs when the grid has >1 step.
    budget = 11 * 1024 * 1024
    b_pad8 = _round_up(max(b, 1), 8)
    rows_single = budget // (n_pad * 4 * 8) // 8 * 8
    if b_pad8 <= rows_single:
        rows = b_pad8
    else:
        rows = max(8, budget // (n_pad * 4 * 11) // 8 * 8)
    b_pad = _round_up(b, rows)
    m_pad = _round_up(num_samples, _LANES)
    coords = jnp.pad(
        xyz.astype(jnp.float32),
        ((0, b_pad - b), (0, n_pad - n), (0, 0)),
    )
    xs = coords[..., 0]
    ys = coords[..., 1]
    zs = coords[..., 2]

    kernel = functools.partial(_fps_kernel, num_samples, n)
    tile = pl.BlockSpec(
        (rows, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // rows,),
        in_specs=[tile, tile, tile],
        out_specs=pl.BlockSpec(
            (rows, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.int32),
    )(xs, ys, zs)
    return out[:b, :num_samples]
