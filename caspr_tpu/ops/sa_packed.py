"""Lanes-packed SA conv stack: fold the K ball neighbors into the channel
(lane) dimension so the mini-PointNet's narrow convs stop paying XLA's
128-lane minor-dim padding.

Why: the SA levels' grouped intermediates are (B*M, K, d) with d = 16..64
(reference caspr/models/pointnet2.py:64-146's MLP widths).  XLA's TPU
layout pads the minor dimension to 128 lanes, so every HBM round-trip of
those tensors moves 2-8x their compact bytes — and the conv/GN/max chain
between the neighborhood gather and the ball max-pool is HBM-bound (the
matmul FLOPs at these widths underfill the MXU no matter what).  Folding
K into the channels gives rows of K*d >= 256 contiguous lanes: every
intermediate is stored compact, and the convs become ONE matmul against a
block-diagonal kron(I_K, W) weight (K disjoint copies of the conv weight
on the diagonal — zero blocks contribute exact zeros, so values match the
row-form conv up to f32 accumulation order).

GroupNorm stats (per (B*M, group) over the K ball samples and the C/G
group channels — same semantics as nn.group_norm on the (B*M, K, d)
view) are computed as HIGHEST-precision matmuls against a constant 0/1
group-membership mask: sums of the same f32 values the VPU reduce would
add, full f32 MXU passes over a 16-column output — cheap and exact to
accumulation order.  The broadcast back to lanes is the transposed mask
matmul (one nonzero per output element — exact).

Dispatch: CASPR_TPU_SA_STACK=packed (opt-in until hardware-A/B'd; see
tools/ab_sa_stack.py).  Applies where every conv width is <= 128 (wider
levels gain nothing — their minor dim is already unpadded).

Replaces the compute of reference caspr/models/pointnet2.py:649-699
(mini-PointNet: conv+GN+ReLU stack, ball max-pool) for the factored SA
path (ops/sa_fused2.sa_scale_factored).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _hdot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def stack_mode() -> str:
    """'rows' (default: the sa_scale_factored conv loop) or 'packed'."""
    mode = os.environ.get("CASPR_TPU_SA_STACK", "rows")
    return mode if mode in ("rows", "packed") else "rows"


def can_pack(sp) -> bool:
    """Packing pays only where the conv widths are lane-padded (< 128)."""
    dims = [c["weight"].shape[0] for c in sp["convs"]]
    dims.append(sp["convs"][1]["weight"].shape[1])
    return max(dims) <= 128


def _kron_eye(w, k: int):
    """(d_in, d_out) -> (k*d_in, k*d_out) block-diagonal: K copies of the
    conv weight on the diagonal.  Built by broadcast at trace time; XLA
    materializes it once as a constant-folded weight transform."""
    din, dout = w.shape
    eye = jnp.eye(k, dtype=w.dtype)
    return (eye[:, None, :, None] * w[None, :, None, :]).reshape(
        k * din, k * dout)


def _conv_packed(hp, w, bias, k: int):
    """1x1 conv on the lanes-packed (BM, K*d_in) view.

    Each conv picks its own pack factor p = 128 // max(d_in, d_out): the
    (BM, K*d_in) rows reshape — FREE, it only re-splits the major dims —
    to (BM*K/p, p*d_in), and one matmul against the (p*d_in, p*d_out)
    block-diagonal weight fills the MXU's 128-lane tiles exactly (p
    neighbors per row, zero padding waste).  A full-K kron would instead
    pay K*d_in*d_out/128^2 tiles per row — K-fold wasted cycles at K=32.
    """
    bm, kd = hp.shape
    din, dout = w.shape
    p = max(1, min(k, 128 // max(din, dout)))
    while k % p:
        p -= 1
    x = hp.reshape(bm * (k // p), p * din)
    y = jnp.matmul(
        x, _kron_eye(w, p), preferred_element_type=jnp.float32
    ) + jnp.tile(bias, p)
    return y.reshape(bm, k * dout)


def _gn_packed(params, hp, k: int, d: int, num_groups: int,
               eps: float = 1e-5):
    """GroupNorm on the lanes-packed (BM, K*d) view.

    Stats per (row, group) over the group's C/G channels across all K
    neighbors — identical semantics to nn.group_norm on (BM, K, d).
    """
    grp = num_groups
    cg = d // grp
    lane_group = (jnp.arange(k * d) % d) // cg               # (k*d,)
    mask = (lane_group[:, None]
            == jnp.arange(grp)[None, :]).astype(jnp.float32)  # (k*d, grp)
    inv = 1.0 / (k * cg)

    mean_g = _hdot(hp, mask) * inv                           # (BM, grp)
    mean = _hdot(mean_g, jnp.transpose(mask))                # (BM, k*d)
    centered = hp - mean
    var_g = _hdot(jnp.square(centered), mask) * inv
    var = _hdot(var_g, jnp.transpose(mask))
    w = jnp.tile(params["weight"], k)
    b = jnp.tile(params["bias"], k)
    return centered * jax.lax.rsqrt(var + eps) * w + b


def sa_stack_packed(sp, h, num_groups: int = 16):
    """conv/GN/ReLU stack + ball max-pool on lanes-packed rows.

    h: (BM, K, d1) grouped first-conv output (factored conv1 already
    applied — see sa_scale_factored).  Returns (BM, d_out), bit-compatible
    with the row-form loop up to f32 accumulation order.
    """
    bm, k, d1 = h.shape
    return sa_stack_packed_flat(sp, h.reshape(bm, k * d1), k, d1, num_groups)


def sa_stack_packed_flat(sp, hp, k: int, d1: int, num_groups: int = 16):
    """Same stack on an already lanes-packed (BM, K*d1) input — the
    layout pointops.gather_points_packed emits directly from the gather
    kernel (no padded intermediate, no repack pass)."""
    bm = hp.shape[0]
    num = len(sp["convs"])
    d = d1
    for i in range(num):
        if i > 0:
            w = jnp.transpose(sp["convs"][i]["weight"])      # (d_in, d_out)
            d = w.shape[1]
            hp = _conv_packed(hp, w, sp["convs"][i]["bias"], k)
        hp = _gn_packed(sp["norms"][i], hp, k, d, num_groups)
        if i < num - 1:
            hp = jax.nn.relu(hp)
    return jnp.max(hp.reshape(bm, k, d), axis=1)
