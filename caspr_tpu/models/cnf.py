"""Conditional continuous normalizing flow (CNF) decoder, TPU-native.

Functional re-design of the reference's PointFlow-derived flow stack
(reference caspr/models/{flow,cnf,odefunc,diffeq_layers,normalization}.py):

  - 7 context-conditioned linear layer types (diffeq_layers.py); CaSPR uses
    ``concatsquash``: y*sigmoid(Wg[t,c]) + Wb[t,c] (diffeq_layers.py:76-90)
  - ODEnet: layer stack with softplus between layers (odefunc.py:62-105)
  - Hutchinson divergence: the reference runs torch.autograd.grad inside
    the dynamics (odefunc.py:13-31); here it is a jax.jvp — e^T J e is the
    same scalar either way, and forward-mode composes cleanly with the
    adjoint's outer vjp
  - MovingBatchNorm1d: invertible running-stat norm with log-det terms
    (normalization.py:12-128), including the PointFlow transpose-reshape
    batch-statistics quirk, replicated bit-for-bit for training parity
  - CNF block integrating (x, logpx) from 0 to a trainable end time
    sqrt_end_time^2 (cnf.py:50-128); reverse flows integrate the
    time-reflected dynamics so the solver always runs forward
  - SequentialFlow chain MBN -> CNF x blocks -> MBN (flow.py:44-76)

Conditioning context, dynamics parameters, and the per-solve Hutchinson
noise all ride the adjoint's ``args`` pytree, so gradients flow to the
latent code and flow weights without storing trajectories.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..nn import linear, linear_init
from ..ops import odeint_adjoint


@dataclass(frozen=True)
class CNFConfig:
    """Defaults mirror reference PointCNFArgs (flow.py:86-100); zdim is
    overridden to the CaSPR latent size at model build (caspr.py:67-70)."""

    input_dim: int = 3
    dims: Tuple[int, ...] = (512, 512, 512)
    zdim: int = 512
    num_blocks: int = 1
    layer_type: str = "concatsquash"
    nonlinearity: str = "softplus"
    time_length: float = 0.5
    train_T: bool = True
    atol: float = 1e-5
    rtol: float = 1e-5
    batch_norm: bool = True
    bn_eps: float = 1e-4
    bn_decay: float = 0.1

    def chain(self) -> Tuple[str, ...]:
        blocks = ("cnf",) * self.num_blocks
        if self.batch_norm:
            return ("mbn",) + blocks + ("mbn",)
        return blocks


# ------------------------- diffeq layer types ------------------------------


def _layer_init(key, layer_type: str, dim_in: int, dim_out: int, dim_c: int):
    k = jax.random.split(key, 3)
    if layer_type == "ignore":
        return {"_layer": linear_init(k[0], dim_in, dim_out)}
    if layer_type == "concat":
        return {"_layer": linear_init(k[0], dim_in + 1 + dim_c, dim_out)}
    if layer_type == "concat_v2":
        return {
            "_layer": linear_init(k[0], dim_in, dim_out),
            "_hyper_bias": linear_init(k[1], 1 + dim_c, dim_out, bias=False),
        }
    if layer_type in ("squash", "scale"):
        return {
            "_layer": linear_init(k[0], dim_in, dim_out),
            "_hyper": linear_init(k[1], 1 + dim_c, dim_out),
        }
    if layer_type in ("concatsquash", "concatscale"):
        return {
            "_layer": linear_init(k[0], dim_in, dim_out),
            "_hyper_bias": linear_init(k[1], 1 + dim_c, dim_out, bias=False),
            "_hyper_gate": linear_init(k[2], 1 + dim_c, dim_out),
        }
    raise ValueError(f"unknown diffeq layer type {layer_type!r}")


def _layer_apply(params, layer_type: str, context, x):
    """context: (B, 1+zdim); x: (B, N, dim_in) -> (B, N, dim_out)."""
    if layer_type == "ignore":
        return linear(params["_layer"], x)
    if layer_type == "concat":
        ctx = jnp.broadcast_to(
            context[:, None, :], (x.shape[0], x.shape[1], context.shape[-1])
        )
        return linear(params["_layer"], jnp.concatenate([x, ctx], axis=-1))
    if layer_type == "concat_v2":
        return linear(params["_layer"], x) + linear(params["_hyper_bias"], context)[
            :, None, :
        ]
    if layer_type == "squash":
        gate = jax.nn.sigmoid(linear(params["_hyper"], context))[:, None, :]
        return linear(params["_layer"], x) * gate
    if layer_type == "scale":
        gate = linear(params["_hyper"], context)[:, None, :]
        return linear(params["_layer"], x) * gate
    if layer_type == "concatsquash":
        gate = jax.nn.sigmoid(linear(params["_hyper_gate"], context))[:, None, :]
        bias = linear(params["_hyper_bias"], context)[:, None, :]
        return linear(params["_layer"], x) * gate + bias
    if layer_type == "concatscale":
        gate = linear(params["_hyper_gate"], context)[:, None, :]
        bias = linear(params["_hyper_bias"], context)[:, None, :]
        return linear(params["_layer"], x) * gate + bias
    raise ValueError(f"unknown diffeq layer type {layer_type!r}")


_NONLINEARITIES = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "softplus": jax.nn.softplus,
    "elu": jax.nn.elu,
    "square": jnp.square,
    "identity": lambda x: x,
    # 'swish' has a trainable beta in the reference (odefunc.py:33-39);
    # supported with beta folded into the odenet params when selected.
}


def odenet_init(key, cfg: CNFConfig):
    dims_out = tuple(cfg.dims) + (cfg.input_dim,)
    keys = jax.random.split(key, len(dims_out) + 1)
    layers = []
    d_in = cfg.input_dim
    for i, d_out in enumerate(dims_out):
        layers.append(_layer_init(keys[i], cfg.layer_type, d_in, d_out, cfg.zdim))
        d_in = d_out
    params = {"layers": layers}
    if cfg.nonlinearity == "swish":
        params["swish_beta"] = jnp.ones((len(dims_out) - 1,), jnp.float32)
    return params


def odenet_apply(params, cfg: CNFConfig, context, y):
    """Dynamics network: dy/dt = ODEnet([t, z], y) (odefunc.py:98-105)."""
    if cfg.nonlinearity == "swish":
        acts = [
            lambda v, b=params["swish_beta"][i]: v * jax.nn.sigmoid(b * v)
            for i in range(len(params["layers"]) - 1)
        ]
    else:
        act = _NONLINEARITIES[cfg.nonlinearity]
        acts = [act] * (len(params["layers"]) - 1)
    dx = y
    n = len(params["layers"])
    for i, lp in enumerate(params["layers"]):
        dx = _layer_apply(lp, cfg.layer_type, context, dx)
        if i < n - 1:
            dx = acts[i](dx)
    return dx


def odenet_apply_with_jvp(params, cfg: CNFConfig, context, y, e):
    """(f(y), J_f(y) e) with the primal and tangent stacked along the point
    axis so every layer issues ONE matmul over 2N rows instead of two over
    N — better MXU pipelining for the dominant kernel of the model.

    Specialized to the concatsquash + softplus configuration CaSPR uses
    (gate/bias are constant w.r.t. y, so the tangent of L(y)*g + b is
    L(e)*g; softplus' tangent factor is sigmoid of the primal
    pre-activation).  Other configurations fall back to jax.jvp.
    """
    n = y.shape[1]
    z = jnp.concatenate([y, e], axis=1)  # (BT, 2N, D)
    layers = params["layers"]
    num = len(layers)
    for i, lp in enumerate(layers):
        gate = jax.nn.sigmoid(linear(lp["_hyper_gate"], context))[:, None, :]
        bias = linear(lp["_hyper_bias"], context)[:, None, :]
        # ONE stacked bias-free matmul; constants (the layer's own bias and
        # the hyper bias) belong to the primal half only
        m = jnp.matmul(z, lp["_layer"]["weight"].T,
                       preferred_element_type=z.dtype) * gate
        zp = m[:, :n] + lp["_layer"]["bias"] * gate[:, 0:1] + bias
        zt = m[:, n:]
        if i < num - 1:
            zt = jax.nn.sigmoid(zp) * zt  # d softplus = sigmoid
            zp = jax.nn.softplus(zp)
        z = jnp.concatenate([zp, zt], axis=1)
    return z[:, :n], z[:, n:]


def _can_fuse_jvp(cfg: CNFConfig) -> bool:
    """Measured on v5e: the stacked form wins on small batches (-8% solve
    time at BT=20) but the per-layer restack concats are HBM-bound and LOSE
    ~16% end-to-end at eval batch 16, so it is opt-in only."""
    import os

    if os.environ.get("CASPR_TPU_FUSED_JVP", "0") != "1":
        return False
    return cfg.layer_type == "concatsquash" and cfg.nonlinearity == "softplus"


def _dynamics_kernel_mode(cfg: CNFConfig) -> str:
    """Select the dynamics implementation: the fused Pallas kernel keeps
    all layer activations VMEM-resident (ops/cnf_fused.py) and is the
    default on TPU; 'xla' is the jax.jvp composition.
    CASPR_TPU_CNF_KERNEL=pallas|xla overrides; CASPR_TPU_CNF_MATMUL=bf16
    additionally runs the kernel's matmuls in bfloat16 (f32 accumulate).
    """
    import os

    from ..ops.cnf_fused import can_fuse

    if not can_fuse(cfg):
        return "xla"
    mode = os.environ.get("CASPR_TPU_CNF_KERNEL", "auto")
    if mode in ("pallas", "xla"):
        return mode
    try:
        import jax as _jax

        return "xla" if _jax.default_backend() in ("cpu", "gpu") else "pallas"
    except RuntimeError:
        return "xla"


# --------------------------- CNF dynamics ----------------------------------


def _cnf_matmul_dtype() -> str:
    """Matmul operand dtype for the fused CNF kernels.

    The explicit bf16 operand cast is bit-identical to JAX's default TPU
    matmul precision (one-pass bf16) and ~5% faster, so it is the default
    unless the user requested full-f32 matmuls via --matmul-precision (or
    forces f32 via CASPR_TPU_CNF_MATMUL)."""
    import os

    import jax as _jax

    env = os.environ.get("CASPR_TPU_CNF_MATMUL", "auto")
    if env in ("bf16", "f32"):
        return env
    # bit-identity to the default precision only holds on TPU (the MXU
    # truncates f32 operands to bf16 anyway); CPU/GPU default matmuls are
    # full f32, so keep f32 there
    global_prec = _jax.config.jax_default_matmul_precision
    try:
        on_tpu = _jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        on_tpu = False
    return (
        "bf16"
        if on_tpu and global_prec in (None, "bfloat16", "default", "fastest")
        else "f32"
    )


def _make_dynamics(cfg: CNFConfig, reverse: bool, with_div: bool = True):
    """Dynamics over states (x, logpx), or just x when ``with_div`` is
    False (the sampling path: no log-density requested, so the Hutchinson
    divergence — half the dynamics FLOPs — is never computed).

    Forward flows integrate t: 0 -> T_end directly.  Reverse flows
    (sampling; reference cnf.py:95-96 flips integration times) are recast as
    a forward integration in s = T_end - t of the negated field, so the
    dopri5 core only ever sees increasing time.
    """

    def dynamics(t, states, args):
        # Solver state rides flattened as (BT, N*D) / (BT, N): a D=3 lane
        # dimension would pad to 128 on TPU and make every solver
        # elementwise op (tableau sums, error norms, interpolation) ~40x
        # wider than necessary.  Reshape only here, around the network.
        x_flat = states if not with_div else states[0]
        bt = x_flat.shape[0]
        x = x_flat.reshape(bt, -1, cfg.input_dim)
        t_phys = args["t_end"] - t if reverse else t
        tc = jnp.concatenate(
            [jnp.full((bt, 1), 1.0, x.dtype) * t_phys, args["context"]], axis=1
        )

        if not with_div:
            if _dynamics_kernel_mode(cfg) == "pallas":
                from ..ops.cnf_fused import fused_concatsquash_primal

                dx = fused_concatsquash_primal(
                    args["params"], tc, x, _cnf_matmul_dtype()
                )
            else:
                dx = odenet_apply(args["params"], cfg, tc, x)
            dx = dx.reshape(bt, -1)
            return -dx if reverse else dx

        e = args["e"]
        if _dynamics_kernel_mode(cfg) == "pallas":
            from ..ops.cnf_fused import fused_concatsquash_dynamics

            dx, div = fused_concatsquash_dynamics(
                args["params"], tc, x, e, _cnf_matmul_dtype()
            )
        elif _can_fuse_jvp(cfg):
            dx, jvp_val = odenet_apply_with_jvp(args["params"], cfg, tc, x, e)
            div = jnp.sum(jvp_val * e, axis=-1)  # e^T J e, (BT, N)
        else:

            def f(x_):
                return odenet_apply(args["params"], cfg, tc, x_)

            dx, jvp_val = jax.jvp(f, (x,), (e,))
            div = jnp.sum(jvp_val * e, axis=-1)
        dx = dx.reshape(bt, -1)
        if reverse:
            return (-dx, div)
        return (dx, -div)

    return dynamics


def cnf_block_init(key, cfg: CNFConfig):
    k1, _ = jax.random.split(key)
    params = {"odenet": odenet_init(k1, cfg)}
    if cfg.train_T:
        params["sqrt_end_time"] = jnp.asarray(
            jnp.sqrt(cfg.time_length), jnp.float32
        )
    return params


def cnf_block_apply(
    params, cfg: CNFConfig, x, context, logpx, key, reverse, nfe_sink=None
):
    """One CNF block. x: (B, N, D); context: (B, zdim); logpx: (B, N, 1)
    or None.

    Returns (y, logpy, nfe).  The Hutchinson noise is sampled once per solve
    and held fixed across evaluations (odefunc.py:126-128).  ``nfe_sink``'s
    gradient reports adjoint-pass NFE (see ops.odeint.odeint_adjoint).

    ``logpx=None`` (the sampling path: decode/reconstruct never read the
    transformed log-density) integrates the x state ALONE — the Hutchinson
    divergence channel, half the dynamics FLOPs, is skipped entirely and
    the returned logpy is zeros.  The reference integrates the (unused)
    logp channel here too (cnf.py:85-99); skipping it leaves the x
    dynamics unchanged but removes the logp term from dopri5's error norm,
    so accepted steps — hence NFE and the result within tolerance — can
    differ slightly.  CASPR_TPU_SAMPLE_DIV=1 restores the reference's
    integrate-everything behavior for exact NFE/trajectory parity.
    """
    import os

    if cfg.train_T:
        t_end = params["sqrt_end_time"] * params["sqrt_end_time"]
    else:
        t_end = jnp.asarray(cfg.time_length, x.dtype)
    sample_mode = (
        logpx is None and os.environ.get("CASPR_TPU_SAMPLE_DIV", "0") != "1"
    )
    bt, n, d = x.shape
    ts = jnp.stack([jnp.zeros_like(t_end), t_end])
    args = {
        "params": params["odenet"],
        "context": context,
        "t_end": t_end,
    }
    if sample_mode:
        dyn = _make_dynamics(cfg, reverse, with_div=False)
        xs, nfe = odeint_adjoint(
            dyn, x.reshape(bt, n * d), ts, args,
            rtol=cfg.rtol, atol=cfg.atol, nfe_sink=nfe_sink,
        )
        return (
            xs[1].reshape(bt, n, d),
            jnp.zeros((bt, n, 1), x.dtype),
            nfe,
        )
    e = jax.random.normal(key, x.shape, x.dtype)
    args["e"] = jax.lax.stop_gradient(e)
    dyn = _make_dynamics(cfg, reverse)
    lp = jnp.zeros((bt, n, 1), x.dtype) if logpx is None else logpx
    # lane-packed solver state (see _make_dynamics)
    state0 = (x.reshape(bt, n * d), lp.reshape(bt, n))
    (xs, lps), nfe = odeint_adjoint(
        dyn, state0, ts, args, rtol=cfg.rtol, atol=cfg.atol, nfe_sink=nfe_sink
    )
    return xs[1].reshape(bt, n, d), lps[1].reshape(bt, n, 1), nfe


# ----------------------- moving batch norm ---------------------------------


def mbn_init(key, num_features: int):
    """Affine params start at zero — the forward scale is exp(weight)
    (normalization.py:36-41,70-74)."""
    del key
    return {
        "weight": jnp.zeros((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }


def mbn_init_state(num_features: int):
    return {
        "running_mean": jnp.zeros((num_features,), jnp.float32),
        "running_var": jnp.ones((num_features,), jnp.float32),
        "step": jnp.zeros((1,), jnp.float32),
    }


def _mbn_batch_stats(x):
    """Replicates PointFlow's update_running_mean statistics
    (normalization.py:43-51): transpose(0,1) then reshape(C, -1) — NOT a
    per-channel reduction; kept bit-identical for training parity."""
    c = x.shape[-1]
    xt = jnp.transpose(x, (1, 0) + tuple(range(2, x.ndim))).reshape(c, -1)
    mean = jnp.mean(xt, axis=1)
    var = jnp.var(xt, axis=1, ddof=1)
    return mean, var


def mbn_apply(params, state, cfg: CNFConfig, x, logpx, reverse, training):
    """Invertible running-stats norm with log-det (normalization.py:53-108).

    Returns (y, logpy, new_state).  Normalization always uses the
    pre-update running stats; training additionally updates them.
    """
    mean = jax.lax.stop_gradient(state["running_mean"])
    var = jax.lax.stop_gradient(state["running_var"])
    logdet_c = -0.5 * jnp.log(var + cfg.bn_eps) + params["weight"]
    logdet = jnp.sum(logdet_c)

    if reverse:
        y = (x - params["bias"]) * jnp.exp(-params["weight"])
        y = y * jnp.sqrt(var + cfg.bn_eps) + mean
        logp = None if logpx is None else logpx + logdet
        return y, logp, state

    new_state = state
    if training:
        bmean, bvar = _mbn_batch_stats(x)
        bmean = jax.lax.stop_gradient(bmean)
        bvar = jax.lax.stop_gradient(bvar)
        new_state = {
            "running_mean": mean - cfg.bn_decay * (mean - bmean),
            "running_var": var - cfg.bn_decay * (var - bvar),
            "step": state["step"] + 1.0,
        }
    y = (x - mean) * jnp.exp(-0.5 * jnp.log(var + cfg.bn_eps))
    y = y * jnp.exp(params["weight"]) + params["bias"]
    logp = None if logpx is None else logpx - logdet
    return y, logp, new_state


def flow_total_time(params, cfg: CNFConfig):
    """Sum of (trainable) flow end-times across CNF blocks, the analogue of
    reference flow.py:29-41 count_total_time."""
    total = 0.0
    for kind, p in zip(cfg.chain(), params):
        if kind == "cnf":
            if cfg.train_T:
                total = total + p["sqrt_end_time"] * p["sqrt_end_time"]
            else:
                total = total + cfg.time_length
    return total


# -------------------------- sequential flow --------------------------------


def flow_init(key, cfg: CNFConfig):
    """Build the SequentialFlow param/state lists for cfg.chain()."""
    kinds = cfg.chain()
    keys = jax.random.split(key, len(kinds))
    params, state = [], []
    for kind, k in zip(kinds, keys):
        if kind == "mbn":
            params.append(mbn_init(k, cfg.input_dim))
            state.append(mbn_init_state(cfg.input_dim))
        else:
            params.append(cnf_block_init(k, cfg))
            state.append({})
    return params, state


def flow_apply(
    params: List,
    state: List,
    cfg: CNFConfig,
    x,
    context,
    logpx,
    key,
    *,
    reverse: bool = False,
    training: bool = False,
    nfe_sink=None,
):
    """Run the full chain. Returns (y, logpy, new_state, nfe).

    Forward: data -> base (NLL training); reverse: base samples -> data
    (reconstruction), visiting the chain back-to-front with each layer
    inverted (reference cnf.py:33-48).
    """
    kinds = cfg.chain()
    order = range(len(kinds) - 1, -1, -1) if reverse else range(len(kinds))
    new_state = list(state)
    nfe = jnp.zeros((), jnp.float32)
    n_cnf = max(1, kinds.count("cnf"))
    keys = jax.random.split(key, n_cnf)
    ki = 0
    for i in order:
        if kinds[i] == "mbn":
            x, logpx, new_state[i] = mbn_apply(
                params[i], state[i], cfg, x, logpx, reverse, training
            )
        else:
            x, logpx_out, block_nfe = cnf_block_apply(
                params[i], cfg, x, context, logpx, keys[ki], reverse, nfe_sink
            )
            logpx = None if logpx is None else logpx_out
            # OR-combine the +0.5 exhaustion markers instead of adding
            # (two exhausted blocks would otherwise alias to an integer)
            from ..ops.odeint import nfe_add

            nfe = nfe_add(nfe, block_nfe)
            ki += 1
    return x, logpx, new_state, nfe
