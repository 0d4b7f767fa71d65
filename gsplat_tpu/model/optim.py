"""Functional Adam with per-group learning rates and moment surgery.

Matches torch.optim.Adam(eps=1e-15) as configured by the reference
(gaussian_model_static.py:200): betas (0.9, 0.999), bias correction, eps
added AFTER the sqrt. Learning rates are passed per step as a dict keyed by
parameter-group name, so the xyz exponential schedule
(gaussian_model_static.py:206-212) is just a scalar input to the jitted step.

``zero_moments_at`` replaces the reference's optimizer-state surgery
(replace_tensors_to_optimizer, gaussian_model_static.py:354-392): a masked
scatter of zeros into both moments at relocated/added rows.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


class AdamState(NamedTuple):
    mu: Params
    nu: Params
    count: jnp.ndarray  # [] int32


def init(params: Params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


def step(params: Params, grads: Params, state: AdamState, lrs: Dict[str, Any],
         b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """One Adam step. lrs[name] is a scalar (traced ok)."""
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_params, new_mu, new_nu = {}, {}, {}
    for name in params:
        g = grads[name]
        mu = b1 * state.mu[name] + (1 - b1) * g
        nu = b2 * state.nu[name] + (1 - b2) * (g * g)
        update = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
        new_params[name] = params[name] - lrs[name] * update
        new_mu[name] = mu
        new_nu[name] = nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)


def zero_moments_at(state: AdamState, row_mask: jnp.ndarray) -> AdamState:
    """Zero both moments at masked rows (all parameter groups).

    row_mask: [C] bool over Gaussian rows; broadcasts over trailing dims.
    """
    def zero(leaf):
        m = row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, 0.0, leaf)

    return AdamState(mu=jax.tree.map(zero, state.mu),
                     nu=jax.tree.map(zero, state.nu), count=state.count)
