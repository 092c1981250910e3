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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_ROWS = 32  # clouds per grid program (sublane tile)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(num_samples, n, xs_ref, ys_ref, zs_ref, idx_ref):
    """One grid program = a tile of _ROWS clouds, advanced in lockstep.

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

    rows = _ROWS if b > _ROWS else _round_up(max(b, 1), 8)
    b_pad = _round_up(b, rows)
    n_pad = _round_up(n, _LANES)
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
