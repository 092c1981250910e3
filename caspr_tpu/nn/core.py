"""Minimal functional neural-network layer for TPU.

Parameters are plain nested dicts of jnp arrays ("param pytrees"); every
layer is a pair of functions: ``*_init(key, ...) -> params`` and
``apply(params, x) -> y``.  This keeps the whole model a pure function
``f(params, inputs)`` that composes cleanly with jax.jit / pjit / custom_vjp
(the from-scratch ODE adjoint needs parameters as explicit pytree inputs).

Weight layout intentionally matches PyTorch (``weight: (out, in)``) so that
converting reference checkpoints (see caspr_tpu.compat.torch_convert) is a
mechanical re-keying with no transposes for linear/1x1-conv layers.

All feature maps in this framework are channels-LAST: ``(..., N, C)``.
That is the natural TPU layout (C rides the 128-wide lane dimension and
matmuls hit the MXU); the reference's channels-first torch layout
(e.g. reference caspr/models/pointnet.py:27-44) is a CUDA convention we do
not follow.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32, bias: bool = True):
    """Dense layer params with the PyTorch default init.

    torch.nn.Linear initializes weight with kaiming_uniform(a=sqrt(5)) and
    bias with U(-1/sqrt(fan_in), 1/sqrt(fan_in)); both reduce to
    U(-1/sqrt(in_dim), 1/sqrt(in_dim)).  Matching the init distribution
    keeps from-scratch training recipes comparable to the reference.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    params = {"weight": _uniform(kw, (out_dim, in_dim), bound, dtype)}
    if bias:
        params["bias"] = _uniform(kb, (out_dim,), bound, dtype)
    return params


def linear(params, x):
    """y = x @ W^T (+ b) over the last axis. x: (..., in) -> (..., out).

    CASPR_TPU_MATMUL_CAST=1 (opt-in, only under the default matmul
    precision) casts the operands to bf16 explicitly: TPU's default
    one-pass matmul converts f32 operands to bf16 inside the dot anyway
    (round-to-nearest-even, same as astype), so results are
    bit-identical there while the cast fuses into the producer and the
    operands move half the HBM bytes.  Respects --matmul-precision:
    high/highest disable it.
    """
    import os

    w = params["weight"].T
    mode = os.environ.get("CASPR_TPU_MATMUL_CAST", "0")
    if mode == "1":
        # TPU-class backends only: CPU/GPU default matmuls are full f32,
        # where the cast would be a real precision loss (same guard as
        # the CNF kernel's explicit-cast mode, models/cnf.py)
        try:
            if jax.default_backend() in ("cpu", "gpu"):
                mode = "0"
        except RuntimeError:
            mode = "0"
    if (
        mode in ("1", "force")
        and x.dtype == jnp.float32
        and jax.config.jax_default_matmul_precision in (None, "default")
    ):
        y = jnp.matmul(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        y = jnp.matmul(x, w, preferred_element_type=x.dtype)
    if "bias" in params:
        y = y + params["bias"]
    return y


# A kernel-size-1 Conv1d is exactly a per-point dense layer; the reference
# uses torch.nn.Conv1d(C_in, C_out, 1) everywhere (e.g. reference
# caspr/models/tpointnet2.py:59-60).  We keep a distinct name so model code
# reads like the architecture it implements.
conv1x1_init = linear_init
conv1x1 = linear


def normal_init_like(key, params, std: float = 0.1):
    """Re-initialize every 'weight' leaf with N(0, std) and zero biases.

    Mirrors the reference's dynamics-net init (reference
    caspr/models/latent_ode_model.py:152-156).
    """

    def _reinit(path, leaf):
        nonlocal key
        key, sub = jax.random.split(key)
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "weight":
            return std * jax.random.normal(sub, leaf.shape, leaf.dtype)
        if name == "bias":
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(_reinit, params)


def group_norm_init(key, num_channels: int, dtype=jnp.float32):
    """GroupNorm affine params (torch: weight=1, bias=0)."""
    del key
    return {
        "weight": jnp.ones((num_channels,), dtype),
        "bias": jnp.zeros((num_channels,), dtype),
    }


def group_norm(params, x, num_groups: int, eps: float = 1e-5):
    """GroupNorm over channels-last input ``(B, ..., C)``.

    Statistics are computed per (batch, group) over all spatial positions
    and the C/G channels of the group — identical semantics to
    torch.nn.GroupNorm applied to the channels-first mirror of ``x``
    (biased variance, eps=1e-5).

    Implementation note: the big tensor is only ever touched in its native
    ``(B, S, C)`` layout.  Reshaping it to (B, S, G, C/G) for the stats —
    the obvious transcription — leaves a trailing dim as small as 1 that
    TPU pads to the 128-lane tile, collapsing VPU efficiency and inserting
    relayouts around every op (measured: the encoder's SA stack spent more
    time in GN than in its matmuls).  Instead reduce over spatial to a
    tiny (B, C) tensor first and do all group gymnastics there.
    """
    orig_shape = x.shape
    b = orig_shape[0]
    c = orig_shape[-1]
    spatial = int(math.prod(orig_shape[1:-1])) if len(orig_shape) > 2 else 1
    g = num_groups
    cg = c // g
    x3 = x.reshape(b, spatial, c)

    def group_mean(t3):
        per_channel = jnp.mean(t3, axis=1)  # (B, C): lane-friendly reduce
        grp = jnp.mean(per_channel.reshape(b, g, cg), axis=-1)  # (B, G)
        return jnp.repeat(grp, cg, axis=-1).reshape(b, 1, c)  # back to (B,1,C)

    mean = group_mean(x3)
    var = group_mean(jnp.square(x3 - mean))
    out = ((x3 - mean) * jax.lax.rsqrt(var + eps)).reshape(orig_shape)
    return out * params["weight"] + params["bias"]


def mlp_init(key, dims: Sequence[int], dtype=jnp.float32):
    """Params for a plain MLP given layer widths [d0, d1, ..., dk]."""
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"layer{i}": linear_init(keys[i], dims[i], dims[i + 1], dtype)
        for i in range(len(dims) - 1)
    }


def mlp(params, x, activation, final_activation: Optional[object] = None):
    n = len(params)
    for i in range(n):
        x = linear(params[f"layer{i}"], x)
        if i < n - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
