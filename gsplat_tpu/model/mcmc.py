"""MCMC densification as pure functional updates over static buffers.

Reimplements, masked and jit-compatible, the reference's MCMC ops:
- relocation math, Eq. 9 of 3DGS-MCMC (cuda_rasterizer/utils.cu:6-36 and
  host wrapper utils/reloc_utils.py:7-15) — here in closed form: by the
  hockey-stick identity the reference's double sum collapses to
    denom = sum_{j=1..N} (-1)^(j-1) C(N, j) o_new^j / sqrt(j).
- relocate_gs: teleport dead Gaussians onto opacity-sampled live templates
  (scene/gaussian_model_static.py:425-455)
- add_new_gs: +5% growth per call up to cap_max
  (scene/gaussian_model_static.py:458-492)
- covariance-shaped opacity-gated noise injection
  (train_static.py:132-140)

All data-dependent sizes (number of dead, number added) are handled by
masks; shapes never change, so these run inside jit with zero retraces.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gsplat_tpu.core.covariance import build_scaling_rotation
from gsplat_tpu.model.gaussians import GaussianState, inverse_sigmoid
from gsplat_tpu.model import optim

N_MAX = 51  # same fan-out bound as utils/reloc_utils.py:7 (N clamped to 50)

# C(n, j) for n, j in [0, N_MAX); float32 is exact up to C(50, 25) ~ 1.3e14?
# no — use float64 table then cast per-term products; values up to 1.26e14
# are representable exactly in f64 and within 2^-24 relative in f32, which
# matches the reference's float binom table (reloc_utils.py:8).
from scipy.special import comb as _comb  # noqa: E402

_BINOM = np.zeros((N_MAX, N_MAX), np.float32)
for _n in range(N_MAX):
    for _j in range(_n + 1):
        _BINOM[_n, _j] = _comb(_n, _j)


def compute_relocation(opacity_old, scale_old, n_samples):
    """New (opacity, scale) when a Gaussian is split into N copies.

    opacity_old: [M]; scale_old: [M, 3] (activated); n_samples: [M] int.
    Returns (opacity_new [M], scale_new [M, 3]).
    """
    n = jnp.clip(n_samples, 1, N_MAX - 1)
    o_new = 1.0 - jnp.power(1.0 - opacity_old, 1.0 / n.astype(jnp.float32))

    binom = jnp.asarray(_BINOM)[n]  # [M, N_MAX]

    def body(j, carry):
        denom, power = carry
        power = power * o_new  # o_new^j
        sign = jnp.where(j % 2 == 1, 1.0, -1.0)
        term = sign * binom[:, j] * power / jnp.sqrt(j.astype(jnp.float32))
        return denom + term, power

    denom, _ = lax.fori_loop(
        1, N_MAX, body,
        (jnp.zeros_like(o_new), jnp.ones_like(o_new)))
    coeff = opacity_old / denom
    return o_new, coeff[:, None] * scale_old


def _relocated_raw(state: GaussianState, template_idx, counts_plus_one):
    """Raw (logit/log) opacity and scaling for rows cloned from templates,
    with the clamp of gaussian_model_static.py:405."""
    o_old = state.get_opacity()[template_idx, 0]
    s_old = state.get_scaling()[template_idx]
    o_new, s_new = compute_relocation(o_old, s_old, counts_plus_one)
    o_new = jnp.clip(o_new, 0.005, 1.0 - jnp.finfo(jnp.float32).eps)
    return inverse_sigmoid(o_new), jnp.log(s_new)


def _sample_templates(key, probs, capacity: int):
    """iid opacity-weighted template indices for every row (the fixed-shape
    analogue of _sample_alives / torch.multinomial-with-replacement,
    gaussian_model_static.py:412-422).

    Inverse-CDF sampling (cumsum + uniform + searchsorted), O(P log P).
    jax.random.categorical here would reduce a [draws, categories] =
    [C, C] Gumbel array: ~0.5 s per densify at C=100k (measured in the
    30k soak) and an outright TPU InvalidArgument at C=1M (> 2^31
    elements). side="left" with strictly-increasing cdf over positive
    probs means zero-prob rows (cdf flat) can never be selected when any
    positive mass exists.

    Known f32 limitation: the cumsum quantizes selection probabilities to
    the cdf's ULP (~total_mass * 2^-24); at C~1M with total opacity mass
    ~2e5 a template with opacity below ~0.01 contributes O(1) ULPs, so
    selection probabilities among near-transparent templates are distorted
    by up to ~50% of their own (tiny) mass. This only redistributes
    probability within the near-zero-opacity tail (which relocation
    weights lowest by design, gaussian_model_static.py:440); the
    reference's torch.multinomial carries the same class of error via its
    own f32 normalization."""
    cdf = jnp.cumsum(probs)
    u = jax.random.uniform(key, (capacity,), dtype=jnp.float32)
    # scale FIRST, then clamp away from 0: u > 0 strictly guarantees a
    # leading zero-prob row can never be selected whenever any positive
    # mass exists (clamping before the scale underflows back to 0 when
    # cdf[-1] < 1 under TPU flush-to-zero: tiny * small == 0)
    u = jnp.maximum(u * cdf[-1], jnp.finfo(jnp.float32).tiny)
    # method="sort": one 2C-element sort instead of the default binary
    # search (log2(C) sequential 1-per-query gather rounds — ~130 ms per
    # call at C=1M vs ~10 ms for the sort on v5e)
    idx = jnp.searchsorted(cdf, u, side="left", method="sort")
    return jnp.clip(idx, 0, capacity - 1).astype(jnp.int32)


def _clone_rows(state: GaussianState, row_mask, template_idx, o_raw, s_raw):
    """Rows in ``row_mask`` become clones of their template (xyz/features/
    rotation copied; opacity/scaling set to relocated values). The sampled
    templates are also weakened to the same relocated opacity/scaling
    (gaussian_model_static.py:452-453, 485-486)."""
    c = state.capacity
    p = state.params()
    t = template_idx

    def take(leaf):
        m = row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, leaf[t], leaf)

    new = {k: take(v) for k, v in p.items()}
    new["opacity"] = jnp.where(row_mask[:, None], o_raw[:, None], p["opacity"])
    new["scaling"] = jnp.where(row_mask[:, None], s_raw, p["scaling"])

    # weaken the templates: scatter relocated values at sampled indices
    scatter_idx = jnp.where(row_mask, t, c)  # drop non-selected rows
    new["opacity"] = new["opacity"].at[scatter_idx].set(o_raw[:, None],
                                                        mode="drop")
    new["scaling"] = new["scaling"].at[scatter_idx].set(s_raw, mode="drop")

    template_mask = (jnp.zeros((c,), jnp.bool_)
                     .at[scatter_idx].set(True, mode="drop"))
    return state.replace_params(new), template_mask


def _relocate_with(state: GaussianState, opt_state: optim.AdamState,
                   row_mask, t):
    """Core of relocate_gs given the dead-row mask and a per-row template
    map ``t`` ([C] int; only entries at masked rows are used). Shared by the
    sampled path and the RNG-replay path (tests/run_reference_trainer.py
    records the reference loop's draws; train_static --replay_rng injects
    them here)."""
    counts = jax.ops.segment_sum(row_mask.astype(jnp.int32), t,
                                 num_segments=state.capacity)
    n_per_dead = counts[t] + 1
    o_raw, s_raw = _relocated_raw(state, t, n_per_dead)
    new_state, template_mask = _clone_rows(state, row_mask, t, o_raw, s_raw)
    new_opt = optim.zero_moments_at(opt_state, template_mask)
    return new_state, new_opt


def _add_with(state: GaussianState, opt_state: optim.AdamState, t, target):
    """Core of add_new_gs given the template map and the post-growth alive
    count ``target`` (new rows are [n_alive, target))."""
    c = state.capacity
    n = state.n_alive
    target = jnp.maximum(jnp.asarray(target, jnp.int32), n)
    rows = jnp.arange(c, dtype=jnp.int32)
    new_mask = (rows >= n) & (rows < target)
    counts = jax.ops.segment_sum(new_mask.astype(jnp.int32), t,
                                 num_segments=c)
    n_per_new = counts[t] + 1
    o_raw, s_raw = _relocated_raw(state, t, n_per_new)
    new_state, template_mask = _clone_rows(state, new_mask, t, o_raw, s_raw)
    new_state = dataclasses.replace(new_state, n_alive=target)
    new_opt = optim.zero_moments_at(opt_state, template_mask | new_mask)
    return new_state, new_opt


def relocate_gs(state: GaussianState, opt_state: optim.AdamState, key,
                dead_opacity: float = 0.005):
    """Teleport dead Gaussians (opacity <= 0.005) onto live templates.

    Mirrors gaussian_model_static.py:425-455; Adam moments are zeroed at the
    sampled template rows only, exactly like the reference's
    replace_tensors_to_optimizer(inds=reinit_idx) (:455).
    """
    alive = state.alive_mask
    opa = state.get_opacity()[:, 0]
    dead = alive & (opa <= dead_opacity)
    src = alive & ~dead
    probs = jnp.where(src, opa, 0.0)
    # no live sources or no dead: no-op (handled by masks; probs all-zero
    # would make categorical ill-defined, so guard)
    any_src = jnp.any(probs > 0)
    probs = jnp.where(any_src, probs, jnp.where(alive, 1.0, 0.0))

    t = _sample_templates(key, probs, state.capacity)
    do_it = any_src & jnp.any(dead)
    return _relocate_with(state, opt_state, dead & do_it, t)


def relocate_gs_forced(state: GaussianState, opt_state: optim.AdamState,
                       dead_mask, templates):
    """Replay variant: dead mask and per-row templates injected from a
    recorded reference-loop schedule instead of sampled."""
    return _relocate_with(state, opt_state, dead_mask, templates)


def add_new_gs(state: GaussianState, opt_state: optim.AdamState, key,
               cap_max: int | None = None, growth: float = 1.05):
    """Activate up to +5% new rows (to cap) as clones of opacity-sampled
    templates (gaussian_model_static.py:458-492). Moments zeroed at both the
    new rows (cat_tensors semantics, :314-315) and the weakened templates
    (replace_tensors at add_idx, :490)."""
    c = state.capacity
    cap = c if cap_max is None else min(cap_max, c)
    n = state.n_alive
    target = jnp.minimum(jnp.asarray(cap, jnp.int32),
                         (growth * n.astype(jnp.float32)).astype(jnp.int32))
    target = jnp.maximum(target, n)

    alive = state.alive_mask
    opa = state.get_opacity()[:, 0]
    probs = jnp.where(alive, opa, 0.0)
    any_src = jnp.any(probs > 0)
    probs = jnp.where(any_src, probs, jnp.where(alive, 1.0, 0.0))

    t = _sample_templates(key, probs, c)
    return _add_with(state, opt_state, t, target)


def add_new_gs_forced(state: GaussianState, opt_state: optim.AdamState,
                      templates, target):
    """Replay variant: templates for the new rows [n_alive, target) injected
    from a recorded reference-loop schedule."""
    return _add_with(state, opt_state, templates, target)


def inject_noise(state: GaussianState, key, noise_lr, xyz_lr,
                 raw_noise=None):
    """Covariance-shaped positional noise on near-transparent Gaussians
    (train_static.py:132-140): xyz += Sigma @ randn * sigmoid(-100*((1-o) -
    0.995)^-)... precisely: gate = 1/(1+exp(-100*((1-opacity) - 0.995))).

    raw_noise ([C, 3], standard normal) overrides the key-drawn sample —
    the RNG-replay hook for exec-parity against the reference loop."""
    from gsplat_tpu.core.covariance import covariance_6

    opa = state.get_opacity()
    gate = jax.nn.sigmoid(100.0 * ((1.0 - opa) - 0.995))  # [C, 1]
    raw = (jax.random.normal(key, state.xyz.shape) if raw_noise is None
           else raw_noise)
    noise = raw * gate * noise_lr * xyz_lr
    # Sigma @ noise, elementwise from the packed 6-vector covariance
    # (batched 3x3 matmuls lower poorly on the MXU).
    xx, xy, xz, yy, yz, zz = (covariance_6(
        state.get_scaling(), state.get_rotation())[..., i] for i in range(6))
    nx, ny, nz = noise[:, 0], noise[:, 1], noise[:, 2]
    noise = jnp.stack([xx * nx + xy * ny + xz * nz,
                       xy * nx + yy * ny + yz * nz,
                       xz * nx + yz * ny + zz * nz], axis=-1)
    noise = jnp.where(state.alive_mask[:, None], noise, 0.0)
    return dataclasses.replace(state, xyz=state.xyz + noise)
