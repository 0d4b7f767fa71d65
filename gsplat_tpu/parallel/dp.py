"""Camera-batch data-parallel training step.

Each device renders and differentiates ONE camera of the batch inside a
``shard_map`` over the mesh's ``dp`` axis; gradients are ``psum``-averaged
over ICI and the (replicated) Adam step is applied identically on every
device — the TPU-native replacement for "one CUDA device, one image"
(SURVEY.md §2c). Losses follow train_static.py:95-100.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.model import mcmc, optim
from gsplat_tpu.model.gaussians import GaussianState
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
from gsplat_tpu.train import losses
from gsplat_tpu.train.config import OptimizationConfig
from gsplat_tpu.train.step import masked_mean


class DPMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_dup: jnp.ndarray
    psnr: jnp.ndarray


def stack_cameras(cams: list[CameraParams]) -> CameraParams:
    """Stack per-device cameras into leading-axis-batched leaves (width and
    height are static metadata and must agree across the batch)."""
    assert len({(c.width, c.height) for c in cams}) == 1
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def make_dp_train_step(mesh: Mesh, opt: OptimizationConfig,
                       settings: RasterizeSettings, spatial_lr_scale: float,
                       axis: str = "dp"):
    """Build the jitted data-parallel train step.

    Inputs: ``cam_batch`` is a CameraParams with leading device axis,
    ``gt_batch`` is [n_dev, 3, H, W] channel-first (see step.py — a
    channels-minor image is lane-padded 3->128 on TPU); state/adam are
    replicated.
    """
    import dataclasses as _dc

    from gsplat_tpu.core.schedule import expon_lr

    settings = _dc.replace(settings, layout="chw")

    def per_device(state: GaussianState, adam: optim.AdamState, key,
                   cam_batch: CameraParams, gt_batch, bg, iteration,
                   *, sh_degree: int):
        # inside shard_map: leading axis is this device's shard (size 1)
        camera = jax.tree.map(lambda x: x[0], cam_batch)
        gt = gt_batch[0]
        alive = state.alive_mask
        n_alive = state.n_alive

        def loss_fn(params):
            s = state.replace_params(params)
            out = rasterize(
                s.xyz, s.get_scaling(), s.get_rotation(),
                s.get_opacity()[:, 0], s.get_features(), camera, sh_degree,
                bg, settings, alive=alive)
            img = out.image
            ll1 = losses.l1_loss(img, gt)
            lssim = losses.ssim(img, gt)
            loss = (1 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1 - lssim)
            loss = loss + opt.opacity_reg * masked_mean(
                jnp.abs(s.get_opacity()), alive, n_alive)
            loss = loss + opt.scale_reg * masked_mean(
                jnp.abs(s.get_scaling()), alive, n_alive)
            return loss, (img, ll1, out.num_dup)

        (loss, (img, ll1, num_dup)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params())
        # all-reduce over the camera-batch axis (rides ICI)
        grads = jax.tree.map(lambda g: lax.pmean(g, axis), grads)
        loss = lax.pmean(loss, axis)

        xyz_lr = expon_lr(iteration,
                          opt.position_lr_init * spatial_lr_scale,
                          opt.position_lr_final * spatial_lr_scale,
                          lr_delay_mult=opt.position_lr_delay_mult,
                          max_steps=opt.position_lr_max_steps)
        lrs = {"xyz": xyz_lr, "f_dc": opt.feature_lr,
               "f_rest": opt.feature_lr / 20.0, "opacity": opt.opacity_lr,
               "scaling": opt.scaling_lr, "rotation": opt.rotation_lr}
        new_params, new_adam = optim.step(state.params(), grads, adam, lrs)
        new_state = state.replace_params(new_params)
        new_state = mcmc.inject_noise(new_state, key, opt.noise_lr, xyz_lr)
        psnr = losses.psnr(jnp.clip(img, 0, 1), jnp.clip(gt, 0, 1),
                           channel_axis=0)
        return new_state, new_adam, DPMetrics(
            loss=loss, l1=lax.pmean(ll1, axis),
            num_dup=lax.pmax(num_dup, axis),
            psnr=lax.pmean(psnr, axis))

    rep = P()
    shd = P(axis)  # prefix spec: applies to every leaf of the camera pytree

    @functools.lru_cache(maxsize=None)
    def build(sh_degree: int):
        sharded = shard_map(
            functools.partial(per_device, sh_degree=sh_degree), mesh=mesh,
            in_specs=(rep, rep, rep, shd, shd, rep, rep),
            out_specs=(rep, rep, DPMetrics(loss=rep, l1=rep, num_dup=rep, psnr=rep)),
            check_vma=False)

        @functools.partial(jax.jit, donate_argnames=("state", "adam"))
        def stepfn(state, adam, key, cam_batch, gt_batch, bg, iteration):
            return sharded(state, adam, key, cam_batch, gt_batch, bg,
                           jnp.asarray(iteration, jnp.float32))

        return stepfn

    return build
