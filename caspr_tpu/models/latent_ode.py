"""Latent Neural ODE advecting the dynamic ("motion") feature.

Functional re-design of reference caspr/models/latent_ode_model.py:11-156:
a tanh MLP dynamics net (N(0, 0.1) weight init, zero bias) integrated with
adaptive dopri5 at rtol=atol=1e-3 — the reference's ODESolver sets
``self.atol = rtol`` (latent_ode_model.py:83), so its advertised atol=1e-4
never takes effect; we reproduce the effective tolerances and note the
quirk here.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..nn import linear, linear_init, normal_init_like
from ..ops import odeint, odeint_adjoint


@dataclass(frozen=True)
class LatentODEConfig:
    input_size: int = 64
    hidden_size: int = 512
    num_layers: int = 2  # hidden-to-hidden layers (4 linear layers total)
    rtol: float = 1e-3
    atol: float = 1e-3  # reference effective value (see module docstring)
    # zero-augmentation of the initial state (ANODE-style; reference
    # latent_ode_model.py:28-29,60-65).  0 for CaSPR.
    augment_size: int = 0

    @property
    def output_size(self) -> int:
        return self.input_size + self.augment_size


def dynamics_init(key, cfg: LatentODEConfig):
    """Linear(in,h), tanh, [Linear(h,h), tanh] x num_layers, Linear(h,out);
    weights N(0, 0.1), biases 0 (latent_ode_model.py:129-136,152-156)."""
    dims = (
        [cfg.output_size]
        + [cfg.hidden_size] * (cfg.num_layers + 1)
        + [cfg.output_size]
    )
    keys = jax.random.split(key, len(dims))
    params = {
        f"layer{i}": linear_init(keys[i], dims[i], dims[i + 1])
        for i in range(len(dims) - 1)
    }
    return normal_init_like(keys[-1], params, std=0.1)


def dynamics_apply(params, z):
    n = len(params)
    for i in range(n):
        z = linear(params[f"layer{i}"], z)
        if i < n - 1:
            z = jnp.tanh(z)
    return z


def _ode_func(t, z, params):
    del t  # autonomous dynamics (latent_ode_model.py:139-147)
    return dynamics_apply(params, z)


def latent_ode_solve(
    params, cfg: LatentODEConfig, z0, t, *, adjoint: bool, nfe_sink=None
):
    """Advect z0 (B, H) to every time in t (T,), non-decreasing with t[0]
    the initial time.

    Times are shifted relative to t[0] like the reference
    (latent_ode_model.py:58); with augment_size > 0 the initial state is
    zero-padded and the returned latents carry the augmented dims
    (latent_ode_model.py:60-65).  Returns (pred_z (B, T, H'), nfe).
    """
    rel_t = t - t[0]
    if cfg.augment_size > 0:
        z0 = jnp.concatenate(
            [z0, jnp.zeros((z0.shape[0], cfg.augment_size), z0.dtype)], axis=1
        )
    if adjoint:
        zs, nfe = odeint_adjoint(
            _ode_func, z0, rel_t, params, rtol=cfg.rtol, atol=cfg.atol,
            nfe_sink=nfe_sink,
        )  # (T, B, H')
    else:
        zs, nfe = odeint(
            _ode_func, z0, rel_t, params, rtol=cfg.rtol, atol=cfg.atol
        )
    return jnp.transpose(zs, (1, 0, 2)), nfe
