"""Fused Pallas kernel for the CNF dynamics: concatsquash layers +
softplus + the Hutchinson JVP in one VMEM-resident pass.

This is the hot loop of the whole model (reference
caspr/models/odefunc.py:119-138 runs it as separate torch matmuls): every
dynamics evaluation pushes (BT*N, hidden) activations through 4 layers for
both the primal and the JVP tangent.  Under plain XLA each layer's
activation tensor materializes in HBM (671 MB at the eval point BT=160,
N=2048, hidden=512), making the op HBM-bound at ~5-10 GB of traffic per
NFE.  The kernel below keeps every intermediate in VMEM; HBM traffic drops
to the inputs/outputs (~15 MB per NFE) and the op becomes MXU-bound.

Layout (chosen so no data relayouts are needed in the hot path):
  - activations ride as (channel on sublanes, point on lanes) tiles
  - primal and tangent are stacked along the LANE axis: z = [z_p | z_t]
    (d, 2R), so each layer is ONE matmul W @ z with W in its stored
    torch (out, in) layout -- no weight transpose, and the tangent
    recurrence (gate scaling, sigmoid(pre) chain rule) shares the gate
    broadcasts with the primal
  - xyz inputs/outputs travel as zero-padded planes (BT, 8, N): the
    first/last layers contract over the 8 padded coordinate sublanes
    with zero-padded weight columns/rows
  - the 8 per-(bt,layer) context vectors (4 sigmoid gates, 4 effective
    biases) arrive as one (BT, 8, hidden) array; a single tiny (8, hidden)
    transpose per program puts them on sublanes

The context-dependent gate/bias projections (tiny (BT, 1+zdim) matmuls,
<0.1% of the FLOPs) stay in XLA outside the kernel.

Matmul precision: with no explicit cast, lax.dot_general follows JAX's
global default matmul precision, which on TPU is a ONE-PASS bf16 MXU
matmul for f32 operands — the same precision every other matmul in the
model runs at under the default ``--matmul-precision`` flag.
``CASPR_TPU_CNF_MATMUL=bf16`` additionally casts the matmul inputs to
bfloat16 explicitly; measured on v5e this is bit-identical to the
default-precision result (the MXU sees the same operand truncation) and
~10% faster (halved VMEM operand traffic).  Do not combine it with
``--matmul-precision float32``, which requests 3-pass f32 fidelity.

Gradients: wrapped in jax.custom_vjp whose backward differentiates the
mathematically-identical XLA composition, so the continuous adjoint
(ops/odeint.py) trains through it unchanged.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn import linear

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_kernel(num_hidden, r, matmul_dtype, y_ref, e_ref, gb_ref,
                  w_first_ref, w_hidden_ref, w_last_ref, dx_ref, div_ref):
    """One program = one (bt, point-tile) pair.

    y/e: (1, 8, R) coordinate planes (rows 3..7 zero).
    gb: (1, 8, H): rows 0..L-1 = sigmoid gates of the L layers (last
        layer's gate occupies channels 0..2), rows L..2L-1 = effective
        biases (bias * gate + hyper_bias), zero-padded to 8 rows.
    w_first: (H, 8) first-layer weight, columns 3..7 zero.
    w_hidden: (num_hidden, H, H) hidden-layer weights (torch (out, in)).
    w_last: (8, H) last-layer weight, rows 3..7 zero.
    dx: (1, 8, R) output planes; div: (1, 1, R) tangent-dot-noise.
    """
    yp = y_ref[0]  # (8, R)
    ep = e_ref[0]
    num_layers = num_hidden + 2  # first + hidden + last

    gbt = jnp.transpose(gb_ref[0])  # (H, 8): channel on sublanes
    gate_col = lambda i: gbt[:, i:i + 1]
    beff_col = lambda i: gbt[:, num_layers + i:num_layers + i + 1]

    def mm(w, z):
        if matmul_dtype == "bf16":
            w = w.astype(jnp.bfloat16)
            z = z.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            w, z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def layer(z, w, gate, beff, last):
        m = mm(w, z) * gate  # (d_out, 2R)
        zp = m[:, :r] + beff
        zt = m[:, r:]
        if not last:
            zt = zt * jax.nn.sigmoid(zp)
            zp = jax.nn.softplus(zp)
        return jnp.concatenate([zp, zt], axis=1)

    z = jnp.concatenate([yp, ep], axis=1)  # (8, 2R)
    z = layer(z, w_first_ref[:], gate_col(0), beff_col(0), last=False)
    for i in range(num_hidden):
        z = layer(z, w_hidden_ref[i], gate_col(1 + i), beff_col(1 + i),
                  last=False)
    # last layer back to coordinate planes; gate/bias live in channels 0..2
    z = layer(z, w_last_ref[:],
              gate_col(num_layers - 1)[0:8], beff_col(num_layers - 1)[0:8],
              last=True)

    dx_ref[0] = z[:, :r]
    # divergence: e^T (J e) summed over the (zero-padded) coordinate rows
    div_ref[0] = jnp.sum(z[:, r:] * ep, axis=0, keepdims=True)


def _fused_primal_kernel(num_hidden, r, matmul_dtype, y_ref, gb_ref,
                         w_first_ref, w_hidden_ref, w_last_ref, dx_ref):
    """Primal-only variant of ``_fused_kernel`` for sampling: no tangent
    half, no divergence output.  Dropping the lane-stacked tangent halves
    the matmul width and VMEM per point tile, so the tile default doubles
    (see ``_pick_tile`` call in ``_fused_primal_call``)."""
    yp = y_ref[0]  # (8, R)
    num_layers = num_hidden + 2

    gbt = jnp.transpose(gb_ref[0])  # (H, 8)
    gate_col = lambda i: gbt[:, i:i + 1]
    beff_col = lambda i: gbt[:, num_layers + i:num_layers + i + 1]

    def mm(w, z):
        if matmul_dtype == "bf16":
            w = w.astype(jnp.bfloat16)
            z = z.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            w, z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def layer(z, w, gate, beff, last):
        zp = mm(w, z) * gate + beff
        if not last:
            zp = jax.nn.softplus(zp)
        return zp

    z = layer(yp, w_first_ref[:], gate_col(0), beff_col(0), last=False)
    for i in range(num_hidden):
        z = layer(z, w_hidden_ref[i], gate_col(1 + i), beff_col(1 + i),
                  last=False)
    dx_ref[0] = layer(z, w_last_ref[:],
                      gate_col(num_layers - 1)[0:8],
                      beff_col(num_layers - 1)[0:8], last=True)


def _planes(x):
    """(BT, N, 3) -> (BT, 8, N) zero-padded coordinate planes."""
    p = jnp.moveaxis(x, -1, 1)  # (BT, 3, N)
    return jnp.pad(p, ((0, 0), (0, 8 - p.shape[1]), (0, 0)))


def _pick_tile(env_var: str, default: int, n_pad: int) -> int:
    """Validated point-tile size: non-integer / non-positive values fall
    back to ``default`` with a warning; anything else rounds down to a
    power of two in [128, 4096] so the halving loop can never collapse to
    a sub-lane grid (128 always divides the lane-padded n_pad)."""
    raw = os.environ.get(env_var, str(default))
    try:
        req = int(raw)
    except ValueError:
        req = 0
    if req <= 0:
        import warnings

        warnings.warn(
            f"{env_var}={raw!r} is not a positive integer; using {default}"
        )
        req = default
    req = 1 << max(7, min(12, req.bit_length() - 1))
    r = min(req, n_pad)
    while n_pad % r:
        r //= 2
    return r


def _context_gb(params, tc):
    """Per-layer sigmoid gates and effective biases from the context.

    Returns (BT, 8, H): rows 0..L-1 gates, rows L..2L-1 bias*gate +
    hyper_bias (the constant-in-y part of concatsquash,
    diffeq_layers.py:76-90), zero-padded to 8 rows.  The last layer's
    rows are zero-padded past its input_dim output channels.
    """
    layers = params["layers"]
    h = layers[0]["_layer"]["weight"].shape[0]
    gates, beffs = [], []
    for lp in layers:
        g = jax.nn.sigmoid(linear(lp["_hyper_gate"], tc))  # (BT, d_out)
        be = lp["_layer"]["bias"] * g + linear(lp["_hyper_bias"], tc)
        d_out = g.shape[-1]
        if d_out < h:
            g = jnp.pad(g, ((0, 0), (0, h - d_out)))
            be = jnp.pad(be, ((0, 0), (0, h - d_out)))
        gates.append(g)
        beffs.append(be)
    gb = jnp.stack(gates + beffs, axis=1)  # (BT, 2L, H)
    if gb.shape[1] < 8:
        gb = jnp.pad(gb, ((0, 0), (0, 8 - gb.shape[1]), (0, 0)))
    return gb


@functools.partial(jax.jit, static_argnames=("matmul_dtype",))
def _fused_call(w_first, w_hidden, w_last, gb, y, e, *, matmul_dtype="f32"):
    """y, e: (BT, N, 3) -> (dx (BT, N, 3), div (BT, N))."""
    bt, n, d = y.shape
    h = w_first.shape[0]
    num_hidden = w_hidden.shape[0]
    n_pad = _round_up(n, _LANES)

    yp = _planes(y)
    ep = _planes(e)
    if n_pad != n:
        yp = jnp.pad(yp, ((0, 0), (0, 0), (0, n_pad - n)))
        ep = jnp.pad(ep, ((0, 0), (0, 0), (0, n_pad - n)))

    # Default 512 per the r3 hardware battery (6.39 vs 6.47 ms/NFE at
    # BT=160 for tile 1024; tile 2048 exceeds the 16 MB scoped VMEM).
    r = _pick_tile("CASPR_TPU_CNF_TILE", 512, n_pad)

    kernel = functools.partial(_fused_kernel, num_hidden, r, matmul_dtype)
    plane_spec = pl.BlockSpec(
        (1, 8, r), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    dx, div = pl.pallas_call(
        kernel,
        grid=(bt, n_pad // r),
        in_specs=[
            plane_spec,
            plane_spec,
            pl.BlockSpec((1, 8, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_hidden, h, h), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            plane_spec,
            pl.BlockSpec((1, 1, r), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((bt, 1, n_pad), jnp.float32),
        ],
    )(yp, ep, gb, w_first, w_hidden, w_last)
    dx = jnp.moveaxis(dx[:, :d, :n], 1, -1)  # (BT, N, 3)
    return dx, div[:, 0, :n]


@functools.partial(jax.jit, static_argnames=("matmul_dtype",))
def _fused_primal_call(w_first, w_hidden, w_last, gb, y, *, matmul_dtype="f32"):
    """y: (BT, N, 3) -> dx (BT, N, 3), no divergence."""
    bt, n, d = y.shape
    h = w_first.shape[0]
    num_hidden = w_hidden.shape[0]
    n_pad = _round_up(n, _LANES)

    yp = _planes(y)
    if n_pad != n:
        yp = jnp.pad(yp, ((0, 0), (0, 0), (0, n_pad - n)))

    # twice the stacked kernel's tile: with no tangent half the matmul
    # width and VMEM at tile R equal the stacked kernel's at R/2
    r = _pick_tile("CASPR_TPU_CNF_PRIMAL_TILE", 1024, n_pad)

    kernel = functools.partial(_fused_primal_kernel, num_hidden, r,
                               matmul_dtype)
    plane_spec = pl.BlockSpec(
        (1, 8, r), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    dx = pl.pallas_call(
        kernel,
        grid=(bt, n_pad // r),
        in_specs=[
            plane_spec,
            pl.BlockSpec((1, 8, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_hidden, h, h), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=plane_spec,
        out_shape=jax.ShapeDtypeStruct((bt, 8, n_pad), jnp.float32),
    )(yp, gb, w_first, w_hidden, w_last)
    return jnp.moveaxis(dx[:, :d, :n], 1, -1)  # (BT, N, 3)


def _fused_bwd_kernel(num_hidden, r, matmul_dtype,
                      y_ref, e_ref, gb_ref, ctx_ref, ctd_ref,
                      w_first_ref, w_hidden_ref, w_last_ref,
                      dy_ref, dgb_ref, dwf_ref, dwh_ref, dwl_ref):
    """Augmented-dynamics backward: VJP of (dx, div) w.r.t. (y, gates,
    effective biases, layer weights) in one VMEM pass.

    The adjoint ODE (ops/odeint.py:374-384) evaluates this once per
    backward NFE; the XLA composition it replaces re-materializes every
    layer activation in HBM (the double-backward the reference pays at
    caspr/models/odefunc.py:13-31).  Here the forward is recomputed in
    VMEM saving only the pre-gate matmul outputs m_i, then the reverse
    sweep runs transpose matmuls back-to-back.  The divergence cotangent
    flows through the tangent chain (the Hessian-vector term: the
    d softplus = sigmoid factors depend on the primal pre-activations).

    ctx: (1, 8, R) cotangent planes for dx; ctd: (1, 1, R) cotangent for
    div.  Weight/context grads accumulate across grid steps: dgb per bt
    over point tiles, dw* over the whole grid (their out blocks stay
    VMEM-resident because their index maps are constant).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    yp = y_ref[0]
    ep = e_ref[0]
    num_layers = num_hidden + 2
    h = w_first_ref.shape[0]

    gbt = jnp.transpose(gb_ref[0])  # (H, 8)
    gate_col = lambda li: gbt[:, li:li + 1]
    beff_col = lambda li: gbt[:, num_layers + li:num_layers + li + 1]

    def mm(a, b, dims):
        if matmul_dtype == "bf16":
            a = a.astype(jnp.bfloat16)
            b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32
        )

    ws = (
        [w_first_ref[:]]
        + [w_hidden_ref[li] for li in range(num_hidden)]
        + [w_last_ref[:]]
    )

    def g_be(li):
        last = li == num_layers - 1
        g = gate_col(li)[0:8] if last else gate_col(li)
        be = beff_col(li)[0:8] if last else beff_col(li)
        return g, be

    # forward recompute, saving only the pre-gate matmul outputs
    z0 = jnp.concatenate([yp, ep], axis=1)  # (8, 2R)
    ms = []
    z = z0
    for li in range(num_layers):
        m = mm(ws[li], z, ((1,), (0,)))
        ms.append(m)
        if li == num_layers - 1:
            break
        g, be = g_be(li)
        mg = m * g
        zp = mg[:, :r] + be
        zt = mg[:, r:]
        zt = zt * jax.nn.sigmoid(zp)
        zp = jax.nn.softplus(zp)
        z = jnp.concatenate([zp, zt], axis=1)

    def layer_in(li):
        """Recompute layer li's input from m_{li-1} (always non-last)."""
        if li == 0:
            return z0
        g, be = g_be(li - 1)
        mg = ms[li - 1] * g
        zp = mg[:, :r] + be
        zt = mg[:, r:]
        zt = zt * jax.nn.sigmoid(zp)
        zp = jax.nn.softplus(zp)
        return jnp.concatenate([zp, zt], axis=1)

    cp = ctx_ref[0]            # (8, R) cotangent on primal output
    ct = ep * ctd_ref[0]       # (8, R) cotangent on tangent output
    dg_cols = [None] * num_layers
    dbe_cols = [None] * num_layers
    dws = [None] * num_layers
    for li in range(num_layers - 1, -1, -1):
        last = li == num_layers - 1
        g, be = g_be(li)
        m = ms[li]
        if last:
            dppre = cp
            dtpre = ct
        else:
            mg = m * g
            p_pre = mg[:, :r] + be
            t_pre = mg[:, r:]
            s = jax.nn.sigmoid(p_pre)
            dppre = cp * s + ct * t_pre * s * (1.0 - s)
            dtpre = ct * s
        dbe = jnp.sum(dppre, axis=1, keepdims=True)  # (d, 1)
        dg = jnp.sum(
            dppre * m[:, :r] + dtpre * m[:, r:], axis=1, keepdims=True
        )
        if last:  # place the 8-row vectors in full-H columns
            dbe = jnp.concatenate(
                [dbe, jnp.zeros((h - 8, 1), jnp.float32)], axis=0
            )
            dg = jnp.concatenate(
                [dg, jnp.zeros((h - 8, 1), jnp.float32)], axis=0
            )
        dbe_cols[li] = dbe
        dg_cols[li] = dg
        dm = jnp.concatenate([dppre, dtpre], axis=1) * g  # (d, 2R)
        dws[li] = mm(dm, layer_in(li), ((1,), (1,)))      # (d_out, d_in)
        dz = mm(ws[li], dm, ((0,), (0,)))                 # (d_in, 2R)
        cp = dz[:, :r]
        ct = dz[:, r:]

    dy_ref[0] = cp  # (8, R): d/dy planes (tangent half = d/de, discarded)

    pad_cols = 8 - 2 * num_layers
    cols = dg_cols + dbe_cols
    if pad_cols > 0:
        cols.append(jnp.zeros((h, pad_cols), jnp.float32))
    dgb_t = jnp.transpose(jnp.concatenate(cols, axis=1))  # (8, H)
    dwh = (
        jnp.stack(dws[1:-1], axis=0)
        if num_hidden
        else jnp.zeros((0, h, h), jnp.float32)
    )

    @pl.when(j == 0)
    def _():
        dgb_ref[0] = dgb_t

    @pl.when(j > 0)
    def _():
        dgb_ref[0] += dgb_t

    first = (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        dwf_ref[:] = dws[0]
        dwh_ref[:] = dwh
        dwl_ref[:] = dws[-1]

    @pl.when(~first)
    def _():
        dwf_ref[:] += dws[0]
        dwh_ref[:] += dwh
        dwl_ref[:] += dws[-1]


@functools.partial(jax.jit, static_argnames=("matmul_dtype",))
def _fused_bwd_call(w_first, w_hidden, w_last, gb, y, e, ct_dx, ct_div, *,
                    matmul_dtype="f32"):
    """Backward-kernel driver.  y, e, ct_dx: (BT, N, 3); ct_div: (BT, N).
    Returns (dy (BT, N, 3), dgb (BT, 8, H), dwf, dwh, dwl)."""
    bt, n, d = y.shape
    h = w_first.shape[0]
    num_hidden = w_hidden.shape[0]
    n_pad = _round_up(n, _LANES)

    def padded(p):
        return jnp.pad(p, ((0, 0), (0, 0), (0, n_pad - n))) if n_pad != n else p

    yp = padded(_planes(y))
    ep = padded(_planes(e))
    ctx = padded(_planes(ct_dx))
    ctd = padded(ct_div[:, None, :])

    # smaller tile than the forward: the backward keeps the per-layer
    # pre-gate outputs plus the weight-grad accumulators VMEM-resident
    # (CASPR_TPU_CNF_BWD_TILE overrides, same validation as the forward)
    r = _pick_tile("CASPR_TPU_CNF_BWD_TILE", 256, n_pad)

    kernel = functools.partial(_fused_bwd_kernel, num_hidden, r, matmul_dtype)
    plane_spec = pl.BlockSpec(
        (1, 8, r), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    dy, dgb, dwf, dwh, dwl = pl.pallas_call(
        kernel,
        grid=(bt, n_pad // r),
        in_specs=[
            plane_spec,
            plane_spec,
            pl.BlockSpec((1, 8, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            plane_spec,
            pl.BlockSpec((1, 1, r), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_hidden, h, h), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            plane_spec,
            pl.BlockSpec((1, 8, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 8), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_hidden, h, h), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bt, 8, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((bt, 8, h), jnp.float32),
            jax.ShapeDtypeStruct((h, 8), jnp.float32),
            jax.ShapeDtypeStruct((num_hidden, h, h), jnp.float32),
            jax.ShapeDtypeStruct((8, h), jnp.float32),
        ],
    )(yp, ep, gb, ctx, ctd, w_first, w_hidden, w_last)
    dy = jnp.moveaxis(dy[:, :d, :n], 1, -1)
    return dy, dgb, dwf, dwh, dwl


def _reference_dynamics(params, tc, y, e):
    """Mathematically-identical XLA composition (for grads and tests):
    concatsquash stack with softplus, plus the Hutchinson JVP/divergence.
    Mirrors models.cnf.odenet_apply under jax.jvp."""
    layers = params["layers"]
    num = len(layers)

    def f(x):
        dx = x
        for i, lp in enumerate(layers):
            gate = jax.nn.sigmoid(linear(lp["_hyper_gate"], tc))[:, None, :]
            bias = linear(lp["_hyper_bias"], tc)[:, None, :]
            dx = linear(lp["_layer"], dx) * gate + bias
            if i < num - 1:
                dx = jax.nn.softplus(dx)
        return dx

    dx, jvp_val = jax.jvp(f, (y,), (e,))
    return dx, jnp.sum(jvp_val * e, axis=-1)


def _reference_primal(params, tc, y):
    """XLA composition of the primal concatsquash stack (no JVP): the
    custom_vjp backward of ``fused_concatsquash_primal`` and its test
    oracle.  Mirrors models.cnf.odenet_apply."""
    layers = params["layers"]
    num = len(layers)
    dx = y
    for i, lp in enumerate(layers):
        gate = jax.nn.sigmoid(linear(lp["_hyper_gate"], tc))[:, None, :]
        bias = linear(lp["_hyper_bias"], tc)[:, None, :]
        dx = linear(lp["_layer"], dx) * gate + bias
        if i < num - 1:
            dx = jax.nn.softplus(dx)
    return dx


def _pack_weights(params):
    layers = params["layers"]
    h = layers[0]["_layer"]["weight"].shape[0]
    w_first = jnp.pad(
        layers[0]["_layer"]["weight"],
        ((0, 0), (0, 8 - layers[0]["_layer"]["weight"].shape[1])),
    )  # (H, 8)
    w_hidden = jnp.stack(
        [lp["_layer"]["weight"] for lp in layers[1:-1]], axis=0
    )  # (num_hidden, H, H)
    w_last = jnp.pad(
        layers[-1]["_layer"]["weight"],
        ((0, 8 - layers[-1]["_layer"]["weight"].shape[0]), (0, 0)),
    )  # (8, H)
    return w_first, w_hidden, w_last


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_concatsquash_dynamics(params, tc, y, e, matmul_dtype="f32"):
    """(f(y), e^T J e) for the concatsquash+softplus ODEnet.

    params: odenet params pytree; tc: (BT, 1+zdim) [t, context];
    y, e: (BT, N, 3).  Returns (dx (BT, N, 3), div (BT, N)).
    """
    gb = _context_gb(params, tc)
    w_first, w_hidden, w_last = _pack_weights(params)
    return _fused_call(
        w_first, w_hidden, w_last, gb, y, e, matmul_dtype=matmul_dtype
    )


def _fused_fwd(params, tc, y, e, matmul_dtype):
    out = fused_concatsquash_dynamics(params, tc, y, e, matmul_dtype)
    return out, (params, tc, y, e)


def _bwd_mode() -> str:
    """Backward-pass implementation for the adjoint's per-NFE dynamics
    VJP: ``manual`` (hand-derived stream-stacked composition, default),
    ``xla`` (autodiff of the composition), ``pallas`` (fused kernel).

    ``manual`` exists because the autodiffed forward-over-reverse of
    jvp(f) emits ~2x the ops of the analytic backward: the primal and
    Hutchinson-tangent streams share every weight, so their input
    cotangents, weight gradients and recomputed activations each batch
    into ONE matmul over rows stacked along the points axis (the same
    trick the forward kernel plays along lanes).  At the train recipe
    the dynamics VJP is dispatch/fusion-bound, not FLOP-bound, so
    halving the op count is the available win.

    The Pallas kernel is a measured NEGATIVE result at the reference
    train recipe (BT=25, N=1024 on v5e): 14.4 ms vs the XLA vjp's
    11.9 ms per adjoint call, 366.5 vs 266.0 ms on the full train step.
    The VMEM budget caps its point tile at 256 lanes (512+ tiles exceed
    the 16 MB scoped limit carrying the per-layer recompute state plus
    the weight-grad accumulators), so each of the ~100 grid steps runs
    MXU-starved matmuls while the XLA composition batches all BT*N
    rows.  Kept opt-in for A/B at other shapes."""
    mode = os.environ.get("CASPR_TPU_CNF_BWD", "auto")
    if mode in ("pallas", "xla", "manual"):
        return mode
    # auto: xla until the manual composition wins its hardware A/B
    # (tools/hw_session_r5e.sh) — defaults only flip on device evidence
    return "xla"


def _mm(w_params, x):
    """x @ W^T with no bias — routes through nn.linear so the manual
    backward sees the same matmul precision/cast policy as the forward
    composition it differentiates."""
    return linear({"weight": w_params["weight"]}, x)


def _manual_dynamics_vjp(params, tc, y, e, ct_dx, ct_div):
    """Hand-derived VJP of ``_reference_dynamics`` w.r.t. (params, tc, y).

    Forward structure per layer i (h = primal stream, p = Hutchinson
    tangent stream; g_i, hb_i are the context gate / hyper-bias, constant
    in y):
        u_i = h_{i-1} @ W_i^T + b_i      z_i = u_i * g_i + hb_i
        n_i = p_{i-1} @ W_i^T            r_i = n_i * g_i
        h_i = softplus(z_i),  p_i = sigmoid(z_i) * r_i   (i < L-1)
        dx  = z_{L-1},        div = sum(r_{L-1} * e, -1)
    Both streams share W_i, so the recompute, the input-cotangent
    backprop and the weight gradient each run as ONE matmul over
    [h; p] / [a_m; a_n] stacked along the points axis — about half the
    op count of autodiffing jax.jvp(f).  The tiny context-side graph
    (sigmoid gates / hyper biases from tc, <0.1% of FLOPs) stays on
    jax.vjp.  Cotangent w.r.t. e is not computed (the adjoint treats
    the Hutchinson noise as a constant; caller returns zeros).

    Matches reference caspr/models/odefunc.py:119-138 +
    diffeq_layers.py:76-90 semantics via _reference_dynamics.
    """
    layers = params["layers"]
    num = len(layers)
    n_pts = y.shape[1]

    def hyper_of(p_, tc_):
        gs = tuple(
            jax.nn.sigmoid(linear(lp["_hyper_gate"], tc_))
            for lp in p_["layers"]
        )
        hbs = tuple(linear(lp["_hyper_bias"], tc_) for lp in p_["layers"])
        return gs, hbs

    (gs, hbs), hyper_vjp = jax.vjp(hyper_of, params, tc)

    # ---- recompute both streams, one stacked matmul per layer --------
    hp = jnp.concatenate([y, e], axis=1)  # (BT, 2N, d)
    hps, us, ns, sigs, rs = [], [], [], [], []
    for i, lp in enumerate(layers):
        hps.append(hp)
        mn = _mm(lp["_layer"], hp)
        u = mn[:, :n_pts] + lp["_layer"]["bias"]
        n_ = mn[:, n_pts:]
        z = u * gs[i][:, None] + hbs[i][:, None]
        r = n_ * gs[i][:, None]
        us.append(u)
        ns.append(n_)
        rs.append(r)
        if i < num - 1:
            s = jax.nn.sigmoid(z)
            sigs.append(s)
            # softplus(z) recomputed stably from z, not from s
            hp = jnp.concatenate([jax.nn.softplus(z), s * r], axis=1)

    # ---- backward ----------------------------------------------------
    a_z = ct_dx
    a_r = ct_div[..., None] * e
    dgs, dhbs = [None] * num, [None] * num
    dws, dbs = [None] * num, [None] * num
    for i in range(num - 1, -1, -1):
        dgs[i] = jnp.sum(a_z * us[i] + a_r * ns[i], axis=1)
        dhbs[i] = jnp.sum(a_z, axis=1)
        a_m = a_z * gs[i][:, None]
        a_n = a_r * gs[i][:, None]
        dbs[i] = jnp.sum(a_m, axis=(0, 1))
        amn = jnp.concatenate([a_m, a_n], axis=1)  # (BT, 2N, d_out)
        # dW in the stored torch (out, in) layout; same default matmul
        # precision class as the autodiff transpose it replaces
        dws[i] = jnp.einsum("bro,bri->oi", amn, hps[i])
        ahp = _mm({"weight": layers[i]["_layer"]["weight"].T}, amn)
        a_h, a_p = ahp[:, :n_pts], ahp[:, n_pts:]
        if i > 0:
            s = sigs[i - 1]
            a_z = a_h * s + a_p * rs[i - 1] * s * (1.0 - s)
            a_r = a_p * s
        else:
            dy = a_h

    dp, dtc = hyper_vjp((tuple(dgs), tuple(dhbs)))
    # graft the manual _layer grads into the hyper-side cotangent pytree,
    # preserving container types so the custom_vjp structure check passes
    new_layers = []
    for i, lp in enumerate(dp["layers"]):
        nl = dict(lp)
        nlayer = dict(nl["_layer"])
        nlayer["weight"] = dws[i]
        if "bias" in nlayer:
            nlayer["bias"] = dbs[i]
        nl["_layer"] = nlayer
        new_layers.append(nl)
    dp = dict(dp)
    dp["layers"] = type(params["layers"])(new_layers)
    return dp, dtc, dy


def _fused_bwd(matmul_dtype, res, cts):
    params, tc, y, e = res
    mode = _bwd_mode()
    if mode == "manual":
        dp, dtc, dy = _manual_dynamics_vjp(params, tc, y, e, *cts)
        return dp, dtc, dy, jnp.zeros_like(e)
    if mode == "xla":
        _, vjp = jax.vjp(
            lambda p, c, yy: _reference_dynamics(p, c, yy, e), params, tc, y
        )
        dp, dtc, dy = vjp(cts)
        return dp, dtc, dy, jnp.zeros_like(e)

    ct_dx, ct_div = cts
    gb = _context_gb(params, tc)
    w_first, w_hidden, w_last = _pack_weights(params)
    dy, dgb, dwf, dwh, dwl = _fused_bwd_call(
        w_first, w_hidden, w_last, gb, y, e, ct_dx, ct_div,
        matmul_dtype=matmul_dtype,
    )

    # chain the packed-gradient outputs back to the parameter pytree and
    # the [t, context] vector through the (tiny) packing/projection graph
    def packfn(p, c):
        return (_context_gb(p, c),) + _pack_weights(p)

    _, pvjp = jax.vjp(packfn, params, tc)
    dp, dtc = pvjp((dgb, dwf, dwh, dwl))
    return dp, dtc, dy, jnp.zeros_like(e)


fused_concatsquash_dynamics.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_concatsquash_primal(params, tc, y, matmul_dtype="f32"):
    """f(y) only — the sampling-path dynamics (reverse CNF with no
    log-density request, see models.cnf.cnf_block_apply).  Same layer
    math as ``fused_concatsquash_dynamics`` without the Hutchinson
    tangent: half the FLOPs and VMEM per point."""
    gb = _context_gb(params, tc)
    w_first, w_hidden, w_last = _pack_weights(params)
    return _fused_primal_call(
        w_first, w_hidden, w_last, gb, y, matmul_dtype=matmul_dtype
    )


def _fused_primal_fwd(params, tc, y, matmul_dtype):
    out = fused_concatsquash_primal(params, tc, y, matmul_dtype)
    return out, (params, tc, y)


def _fused_primal_bwd(matmul_dtype, res, ct):
    params, tc, y = res
    _, vjp = jax.vjp(_reference_primal, params, tc, y)
    return vjp(ct)


fused_concatsquash_primal.defvjp(_fused_primal_fwd, _fused_primal_bwd)


def can_fuse(cfg) -> bool:
    """The kernel covers CaSPR's flow configuration: concatsquash layers,
    softplus nonlinearity, 3-d points, uniform hidden width that is a
    lane multiple, >= 1 hidden layer."""
    dims = tuple(cfg.dims)
    return (
        cfg.layer_type == "concatsquash"
        and cfg.nonlinearity == "softplus"
        and cfg.input_dim <= 8
        and len(dims) in (2, 3)  # 2(L) gate+bias vectors must fit 8 rows
        and len(set(dims)) == 1
        and dims[0] % _LANES == 0
    )
