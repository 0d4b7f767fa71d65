"""Jit-compiled training steps for static 3DGS-MCMC.

One fused XLA program per iteration (render -> loss -> backward -> Adam ->
noise injection), mirroring the reference hot loop train_static.py:63-144 but
with no host round-trips except the scalar loss fetch. Densification runs as
a second jitted program every ``densification_interval`` iterations.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.core.schedule import expon_lr
from gsplat_tpu.model import mcmc, optim
from gsplat_tpu.model.gaussians import GaussianState
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
from gsplat_tpu.train import losses
from gsplat_tpu.train.config import OptimizationConfig


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_dup: jnp.ndarray
    psnr: jnp.ndarray


def masked_mean(x, mask, count):
    """Mean over alive rows only (the reference's .mean() runs over tensors
    that contain exactly the alive rows)."""
    per_row = jnp.mean(x, axis=tuple(range(1, x.ndim)))
    return jnp.sum(jnp.where(mask, per_row, 0.0)) / jnp.maximum(count, 1)


def make_train_step(opt: OptimizationConfig, settings: RasterizeSettings,
                    spatial_lr_scale: float):
    """Build the jitted train step. Static over (sh_degree, camera W/H).

    The render + loss run channel-first ([3, H, W]): a channels-minor image
    is lane-padded 3->128 on TPU, 42x the physical bytes for every loss op
    and its gradient. ``gt_image`` must arrive CHW (the trainer transposes
    the decoded numpy image once on host)."""
    settings = dataclasses.replace(settings, layout="chw")

    @functools.partial(jax.jit, static_argnames=("sh_degree",),
                       donate_argnames=("state", "adam_state"))
    def train_step(state: GaussianState, adam_state: optim.AdamState,
                   key, camera: CameraParams, gt_image, bg, iteration,
                   sh_degree: int):
        xyz_lr = expon_lr(
            iteration,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps)
        lrs = {
            "xyz": xyz_lr,
            "f_dc": opt.feature_lr,
            "f_rest": opt.feature_lr / 20.0,
            "opacity": opt.opacity_lr,
            "scaling": opt.scaling_lr,
            "rotation": opt.rotation_lr,
        }
        alive = state.alive_mask
        n_alive = state.n_alive

        def loss_fn(params):
            s = state.replace_params(params)
            out = rasterize(
                s.xyz, s.get_scaling(), s.get_rotation(),
                s.get_opacity()[:, 0], s.get_features(), camera, sh_degree,
                bg, settings, alive=alive)
            img = out.image
            ll1 = losses.l1_loss(img, gt_image)
            lssim = losses.ssim(img, gt_image)
            loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - lssim)
            # regularizers over alive rows (train_static.py:99-100)
            s_state = state.replace_params(params)
            loss = loss + opt.opacity_reg * masked_mean(
                jnp.abs(s_state.get_opacity()), alive, n_alive)
            loss = loss + opt.scale_reg * masked_mean(
                jnp.abs(s_state.get_scaling()), alive, n_alive)
            return loss, (ll1, out.num_dup, img)

        (loss, (ll1, num_dup, img)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params())

        new_params, new_adam = optim.step(state.params(), grads, adam_state, lrs)
        new_state = state.replace_params(new_params)

        # covariance-shaped noise after the optimizer step
        # (train_static.py:132-140); skipped at the final iteration exactly
        # like the reference's `if iteration < opt.iterations` guard (:131)
        eff_noise_lr = opt.noise_lr * (iteration < opt.iterations)
        new_state = mcmc.inject_noise(new_state, key, eff_noise_lr, xyz_lr)

        metrics = StepMetrics(loss=loss, l1=ll1, num_dup=num_dup,
                              psnr=losses.psnr(jnp.clip(img, 0, 1),
                                               jnp.clip(gt_image, 0, 1),
                                               channel_axis=0))
        return new_state, new_adam, metrics

    return train_step


def make_grad_step(opt: OptimizationConfig, settings: RasterizeSettings,
                   spatial_lr_scale: float):
    """Gradient half of the train step (no parameter update).

    Exists for densification iterations and RNG-replay runs: the reference
    loop's order is backward -> densify -> optimizer.step -> noise
    (train_static.py:102-140) — gradients are computed on the
    pre-densification parameters, densification mutates them (zeroing the
    touched Adam moments), and the optimizer then applies the stale
    gradients to the mutated parameters. The fused train_step cannot
    express that interleave, so the trainer switches to
    grad_step -> densify -> apply_step on those iterations."""
    settings = dataclasses.replace(settings, layout="chw")

    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def grad_step(state: GaussianState, camera: CameraParams, gt_image, bg,
                  sh_degree: int):
        alive = state.alive_mask
        n_alive = state.n_alive

        def loss_fn(params):
            s = state.replace_params(params)
            out = rasterize(
                s.xyz, s.get_scaling(), s.get_rotation(),
                s.get_opacity()[:, 0], s.get_features(), camera, sh_degree,
                bg, settings, alive=alive)
            img = out.image
            ll1 = losses.l1_loss(img, gt_image)
            lssim = losses.ssim(img, gt_image)
            loss = (1.0 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1.0 - lssim)
            loss = loss + opt.opacity_reg * masked_mean(
                jnp.abs(s.get_opacity()), alive, n_alive)
            loss = loss + opt.scale_reg * masked_mean(
                jnp.abs(s.get_scaling()), alive, n_alive)
            return loss, (ll1, out.num_dup, img)

        (loss, (ll1, num_dup, img)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params())
        metrics = StepMetrics(loss=loss, l1=ll1, num_dup=num_dup,
                              psnr=losses.psnr(jnp.clip(img, 0, 1),
                                               jnp.clip(gt_image, 0, 1),
                                               channel_axis=0))
        return grads, metrics

    return grad_step


def make_apply_step(opt: OptimizationConfig, spatial_lr_scale: float,
                    external_noise: bool = False):
    """Adam + noise half of the split step (see make_grad_step).

    ``do_adam`` (traced bool) mirrors a non-obvious reference semantic: the
    optimizer-state surgery in densification recreates every nn.Parameter
    (cat/replace_tensors_to_optimizer, gaussian_model_static.py:302-392),
    leaving them with grad=None — so torch's optimizer.step() SKIPS the
    entire update on any iteration where densification actually touched the
    model (the backward's gradients are discarded and the per-param Adam
    step count does not increment). Noise injection still runs. Callers
    pass do_adam=False exactly when relocation or growth performed surgery.

    With external_noise=True the signature gains a trailing raw_noise
    ([C, 3] standard normal) argument — the RNG-replay injection point."""

    @functools.partial(jax.jit,
                       donate_argnames=("state", "adam_state", "grads"))
    def apply_step(state: GaussianState, adam_state: optim.AdamState,
                   grads, key, iteration, do_adam, *extra):
        xyz_lr = expon_lr(
            iteration,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps)
        lrs = {
            "xyz": xyz_lr,
            "f_dc": opt.feature_lr,
            "f_rest": opt.feature_lr / 20.0,
            "opacity": opt.opacity_lr,
            "scaling": opt.scaling_lr,
            "rotation": opt.rotation_lr,
        }
        stepped, stepped_adam = optim.step(state.params(), grads,
                                           adam_state, lrs)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(do_adam, x, y), a, b)
        new_params = sel(stepped, state.params())
        new_adam = optim.AdamState(
            mu=sel(stepped_adam.mu, adam_state.mu),
            nu=sel(stepped_adam.nu, adam_state.nu),
            count=jnp.where(do_adam, stepped_adam.count,
                            adam_state.count))
        new_state = state.replace_params(new_params)
        eff_noise_lr = opt.noise_lr * (iteration < opt.iterations)
        raw = extra[0] if external_noise else None
        new_state = mcmc.inject_noise(new_state, key, eff_noise_lr, xyz_lr,
                                      raw_noise=raw)
        return new_state, new_adam

    return apply_step


def make_densify_replay_step(capacity: int):
    """Densify with injected draws (RNG replay of a recorded reference-loop
    schedule): dead mask + per-row relocation templates, then growth
    templates + post-growth target count."""

    @functools.partial(jax.jit, donate_argnames=("state", "adam_state"))
    def densify_replay_step(state: GaussianState,
                            adam_state: optim.AdamState,
                            dead_mask, reloc_templates, add_templates,
                            target):
        state, adam_state = mcmc.relocate_gs_forced(
            state, adam_state, dead_mask, reloc_templates)
        state, adam_state = mcmc.add_new_gs_forced(
            state, adam_state, add_templates, target)
        return state, adam_state

    return densify_replay_step


def make_densify_step(cap_max: int):
    """relocate dead + grow 5% (train_static.py:122-125)."""

    @functools.partial(jax.jit, donate_argnames=("state", "adam_state"))
    def densify_step(state: GaussianState, adam_state: optim.AdamState, key):
        k1, k2 = jax.random.split(key)
        state, adam_state = mcmc.relocate_gs(state, adam_state, k1)
        state, adam_state = mcmc.add_new_gs(state, adam_state, k2, cap_max)
        return state, adam_state

    return densify_step


def make_eval_step(settings: RasterizeSettings):
    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def eval_step(state: GaussianState, camera: CameraParams, gt_image, bg,
                  sh_degree: int):
        out = rasterize(
            state.xyz, state.get_scaling(), state.get_rotation(),
            state.get_opacity()[:, 0], state.get_features(), camera,
            sh_degree, bg, settings, alive=state.alive_mask)
        img = jnp.clip(out.image, 0.0, 1.0)
        gt = jnp.clip(gt_image, 0.0, 1.0)
        # trainer-report psnr semantics = mean of per-channel PSNRs
        # (train_static.py:197); the channel axis follows the layout
        ch = 0 if settings.layout == "chw" else -1
        return img, losses.l1_loss(img, gt), losses.psnr(img, gt,
                                                         channel_axis=ch)

    return eval_step
