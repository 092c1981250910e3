"""Pallas TPU kernels for the sequential/hot point-cloud ops.

Currently: farthest point sampling.  FPS is an inherently sequential
argmax chain (M dependent iterations); under plain XLA each iteration is a
while-loop step with its own HBM round-trips for the running min-distance
vector.  The Pallas kernel keeps coordinates and the min-distance vector
resident in VMEM for the whole chain — one program per cloud, pure VPU
work inside (SURVEY.md §2.2 plan).

Selection semantics match ops.pointops.farthest_point_sampling (seed index
0, max-min-distance, lowest-index tie-break) so the two dispatch
interchangeably.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(num_samples, n, xs_ref, ys_ref, zs_ref, idx_ref):
    """One grid program = one cloud.

    xs/ys/zs: (1, N_pad) coordinate rows in VMEM (padding beyond n).
    idx_ref:  (1, M_pad) int32 output; entries >= num_samples unused.
    """
    n_pad = xs_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    valid = lane < n

    xs = xs_ref[:]
    ys = ys_ref[:]
    zs = zs_ref[:]

    idx_ref[0, 0] = 0

    def body(i, carry):
        min_d, last = carry
        # coords of the last selected point via masked reduction (dynamic
        # single-lane loads are slow on TPU; a full-row select is one VPU op)
        sel = (lane == last).astype(xs.dtype)
        cx = jnp.sum(xs * sel)
        cy = jnp.sum(ys * sel)
        cz = jnp.sum(zs * sel)
        d = (
            (xs - cx) * (xs - cx)
            + (ys - cy) * (ys - cy)
            + (zs - cz) * (zs - cz)
        )
        min_d = jnp.minimum(min_d, d)
        # padding lanes hold -inf and are never selected
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        idx_ref[0, i] = nxt
        return min_d, nxt

    init_min = jnp.where(valid, jnp.full((1, n_pad), jnp.inf, xs.dtype),
                         -jnp.inf)
    jax.lax.fori_loop(1, num_samples, body, (init_min, jnp.int32(0)))


@functools.partial(jax.jit, static_argnums=(1,))
def farthest_point_sampling_pallas(xyz, num_samples: int):
    """Pallas FPS. xyz: (B, N, 3) -> (B, M) int32.

    Falls back to identity ordering when num_samples >= N (set-equivalent;
    see ops.pointops.farthest_point_sampling).
    """
    b, n, _ = xyz.shape
    if num_samples >= n:
        idx = jnp.arange(n, dtype=jnp.int32)
        if num_samples > n:
            idx = jnp.concatenate(
                [idx, jnp.zeros((num_samples - n,), jnp.int32)]
            )
        return jnp.broadcast_to(idx, (b, num_samples))

    n_pad = _round_up(n, _LANES)
    m_pad = _round_up(num_samples, _LANES)
    coords = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    xs = coords[..., 0]  # (B, N_pad)
    ys = coords[..., 1]
    zs = coords[..., 2]

    kernel = functools.partial(_fps_kernel, num_samples, n)
    row = pl.BlockSpec((1, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[row, row, row],
        out_specs=pl.BlockSpec(
            (1, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m_pad), jnp.int32),
    )(xs, ys, zs)
    return out[:, :num_samples]
