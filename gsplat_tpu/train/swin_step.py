"""Jit-compiled training steps for sliding-window (SwinGS) training.

Mirrors the train_slide_window iteration body (reference
train_swin.py:148-273): frame-indexed deformable render of the
immature+matured union, L1+SSIM with MCMC regularizers over the ACTIVE set,
Adam over nine parameter groups (incl. rigid motion), noise injection on the
active immature subset, per-birth-frame relocation and genesis-only growth.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.core.schedule import expon_lr
from gsplat_tpu.model import optim, swin
from gsplat_tpu.model.swin import SwinState
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
from gsplat_tpu.train import losses
from gsplat_tpu.train.config import OptimizationConfig


class SwinMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_dup: jnp.ndarray
    psnr: jnp.ndarray
    n_active: jnp.ndarray


def _masked_mean(x, mask, axis_dims: int = 1):
    per_row = jnp.mean(x, axis=tuple(range(1, x.ndim))) if x.ndim > 1 else x
    cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(mask, per_row, 0.0)) / cnt


def swin_loss(opt: OptimizationConfig, settings: RasterizeSettings,
              state: SwinState, params, camera: CameraParams, gt_image, bg,
              frame, sh_degree: int):
    """The swin loss body (shared by the single-device and data-parallel
    steps): frame-indexed deformable render of the immature+matured union,
    L1+SSIM plus MCMC regularizers over the ACTIVE set
    (train_swin.py:148-200). Returns (loss, (l1, num_dup, img, n_active))."""
    s = state.replace_params(params)
    kw = swin.union_params_at(s, frame)
    out = rasterize(kw["means3d"], kw["scales"], kw["quats"],
                    kw["opacities"], kw["shs"], camera, sh_degree, bg,
                    settings, alive=kw["alive"])
    img = out.image
    ll1 = losses.l1_loss(img, gt_image)
    lssim = losses.ssim(img, gt_image)
    loss = (1 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1 - lssim)
    # MCMC regularizers over the ACTIVE union set
    # (train_swin.py:177-178 uses render_ret['input_gaussians'])
    active = kw["alive"]
    loss = loss + opt.opacity_reg * _masked_mean(
        jnp.abs(kw["opacities"]), active)
    loss = loss + opt.scale_reg * _masked_mean(
        jnp.abs(kw["scales"]), active)
    n_active = jnp.sum(active.astype(jnp.int32))
    return loss, (ll1, out.num_dup, img, n_active)


def make_swin_train_step(opt: OptimizationConfig,
                         settings: RasterizeSettings,
                         spatial_lr_scale: float,
                         arap_weights=None):
    """arap_weights: optional (w_v, w_rotvec, w_rotcen) enabling the ARAP
    rigidity regularizer over the immature KNN graph (the reference ships it
    gated off, train_swin.py:34,183-200). When set, the step takes a
    ``nbr_indices`` [C, K] neighbor array (rebuild periodically).

    Render + loss run channel-first; ``gt_image`` must arrive [3, H, W]
    (see step.py)."""
    settings = dataclasses.replace(settings, layout="chw")

    @functools.partial(jax.jit, static_argnames=("sh_degree",),
                       donate_argnames=("state", "adam"))
    def swin_train_step(state: SwinState, adam: optim.AdamState, key,
                        camera: CameraParams, gt_image, bg, iteration,
                        frame, sh_degree: int, nbr_indices=None):
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
            "rigid_v": opt.rigid_v_lr,
            "rigid_rotvec": opt.rigid_rotvec_lr,
            "rigid_rotcen": opt.rigid_rotcen_lr,
        }

        def loss_fn(params):
            loss, aux = swin_loss(opt, settings, state, params, camera,
                                  gt_image, bg, frame, sh_degree)
            if arap_weights is not None and nbr_indices is not None:
                pens = losses.arap_loss(
                    jax.lax.stop_gradient(
                        state.replace_params(params).im.xyz),
                    [params["rigid_v"], params["rigid_rotvec"],
                     params["rigid_rotcen"]], nbr_indices)
                loss = loss + jnp.sum(
                    pens * jnp.asarray(arap_weights, jnp.float32))
            return loss, aux

        (loss, (ll1, num_dup, img, n_active)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params())
        new_params, new_adam = optim.step(state.params(), grads, adam, lrs)
        new_state = state.replace_params(new_params)
        new_state = swin.inject_noise_active(new_state, key, opt.noise_lr,
                                             xyz_lr, frame)
        return new_state, new_adam, SwinMetrics(
            loss=loss, l1=ll1, num_dup=num_dup,
            psnr=losses.psnr(jnp.clip(img, 0, 1), jnp.clip(gt_image, 0, 1),
                             channel_axis=0),
            n_active=n_active)

    return swin_train_step


def make_swin_grad_step(opt: OptimizationConfig,
                        settings: RasterizeSettings,
                        spatial_lr_scale: float):
    """Gradient half of the swin step — densification iterations follow the
    reference interleave backward -> densify -> optimizer.step
    (train_swin.py:203-242). In the swin loop the Adam update is ALWAYS
    skipped on densify iterations: relocate_gs_immuture runs
    replace_tensors_to_optimizer unconditionally (gaussian_model.py:957,
    even with zero dead rows), recreating every nn.Parameter with
    grad=None, so the reference's optimizer.step() no-ops. The gradient
    computed here exists for metrics parity only."""
    settings = dataclasses.replace(settings, layout="chw")

    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def swin_grad_step(state: SwinState, camera: CameraParams, gt_image,
                       bg, frame, sh_degree: int):
        def loss_fn(params):
            return swin_loss(opt, settings, state, params, camera,
                             gt_image, bg, frame, sh_degree)

        (loss, (ll1, num_dup, img, n_active)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params())
        return grads, SwinMetrics(
            loss=loss, l1=ll1, num_dup=num_dup,
            psnr=losses.psnr(jnp.clip(img, 0, 1), jnp.clip(gt_image, 0, 1),
                             channel_axis=0),
            n_active=n_active)

    return swin_grad_step


def make_swin_apply_step(opt: OptimizationConfig, spatial_lr_scale: float):
    """Adam + noise half of the split swin step. ``do_adam`` mirrors the
    torch grad=None skip (see make_swin_grad_step); noise injection on the
    active immature set still runs (note: the REFERENCE's swin noise is a
    silent no-op — train_swin.py:261 ``_xyz[idx].add_()`` mutates an
    advanced-indexing COPY; we implement the intended MCMC perturbation,
    and parity tests pin --noise_lr 0 to compare loops)."""

    @functools.partial(jax.jit, donate_argnames=("state", "adam", "grads"))
    def swin_apply_step(state: SwinState, adam: optim.AdamState, grads,
                        key, iteration, frame, do_adam):
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
            "rigid_v": opt.rigid_v_lr,
            "rigid_rotvec": opt.rigid_rotvec_lr,
            "rigid_rotcen": opt.rigid_rotcen_lr,
        }
        stepped, stepped_adam = optim.step(state.params(), grads, adam, lrs)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(do_adam, x, y), a, b)
        new_params = sel(stepped, state.params())
        new_adam = optim.AdamState(
            mu=sel(stepped_adam.mu, adam.mu),
            nu=sel(stepped_adam.nu, adam.nu),
            count=jnp.where(do_adam, stepped_adam.count, adam.count))
        new_state = state.replace_params(new_params)
        new_state = swin.inject_noise_active(new_state, key, opt.noise_lr,
                                             xyz_lr, frame)
        return new_state, new_adam

    return swin_apply_step


def make_swin_densify_step(cap_max: int, window_size: int):
    @functools.partial(jax.jit, static_argnames=("genesis",),
                       donate_argnames=("state", "adam"))
    def densify(state: SwinState, adam: optim.AdamState, key, window_start,
                genesis: bool):
        k1, k2 = jax.random.split(key)
        state, adam = swin.relocate_immature(state, adam, k1, window_start,
                                             window_size=window_size)
        if genesis:  # growth only during genesis (train_swin.py:233-234)
            state, adam = swin.add_new_gs(state, adam, k2, cap_max)
        return state, adam

    return densify


def make_swin_eval_step(settings: RasterizeSettings):
    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def eval_step(state: SwinState, camera: CameraParams, gt_image, bg,
                  frame, sh_degree: int):
        kw = swin.union_params_at(state, frame)
        out = rasterize(kw["means3d"], kw["scales"], kw["quats"],
                        kw["opacities"], kw["shs"], camera, sh_degree, bg,
                        settings, alive=kw["alive"])
        img = jnp.clip(out.image, 0.0, 1.0)
        gt = jnp.clip(gt_image, 0.0, 1.0)
        # trainer-report psnr semantics = mean of per-channel PSNRs
        # (train_swin.py:99-101); the channel axis follows the layout
        ch = 0 if settings.layout == "chw" else -1
        return img, losses.l1_loss(img, gt), losses.psnr(img, gt,
                                                         channel_axis=ch)

    return eval_step


mature_and_rollover_jit = jax.jit(swin.mature_and_rollover,
                                  donate_argnames=("state", "adam"))
