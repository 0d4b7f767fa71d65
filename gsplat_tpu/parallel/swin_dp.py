"""Camera-batch data-parallel SWIN training step.

Each device renders and differentiates ONE (camera, frame) sample of the
window batch inside a ``shard_map`` over the mesh's ``dp`` axis; gradients
are ``psum``-averaged over ICI and the replicated Adam + noise step is
applied identically on every device — the sliding-window counterpart of
parallel/dp.py (SURVEY.md §2c). Loss follows train_swin.py:148-200 via the
shared ``swin_step.swin_loss`` body, so single-device and DP training are
metrics-identical up to the gradient mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.core.schedule import expon_lr
from gsplat_tpu.model import optim, swin
from gsplat_tpu.model.swin import SwinState
from gsplat_tpu.raster.rasterize import RasterizeSettings
from gsplat_tpu.train import losses
from gsplat_tpu.train.config import OptimizationConfig
from gsplat_tpu.train.swin_step import SwinMetrics, swin_loss


def make_dp_swin_train_step(mesh: Mesh, opt: OptimizationConfig,
                            settings: RasterizeSettings,
                            spatial_lr_scale: float, axis: str = "dp"):
    """Build the jitted data-parallel swin train step.

    ``cam_batch`` is a CameraParams with leading device axis, ``gt_batch``
    is [n_dev, 3, H, W] channel-first (see step.py), ``frame_batch`` is
    [n_dev] f32 (one window frame per device); state/adam are replicated.
    """
    import dataclasses as _dc

    settings = _dc.replace(settings, layout="chw")

    def per_device(state: SwinState, adam: optim.AdamState, key,
                   cam_batch: CameraParams, gt_batch, frame_batch, bg,
                   iteration, *, sh_degree: int):
        camera = jax.tree.map(lambda x: x[0], cam_batch)
        gt = gt_batch[0]
        frame = frame_batch[0]

        def loss_fn(params):
            return swin_loss(opt, settings, state, params, camera, gt, bg,
                             frame, sh_degree)

        (loss, (ll1, num_dup, img, n_active)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params())
        grads = jax.tree.map(lambda g: lax.pmean(g, axis), grads)
        loss = lax.pmean(loss, axis)

        xyz_lr = expon_lr(iteration,
                          opt.position_lr_init * spatial_lr_scale,
                          opt.position_lr_final * spatial_lr_scale,
                          lr_delay_mult=opt.position_lr_delay_mult,
                          max_steps=opt.position_lr_max_steps)
        lrs = {"xyz": xyz_lr, "f_dc": opt.feature_lr,
               "f_rest": opt.feature_lr / 20.0, "opacity": opt.opacity_lr,
               "scaling": opt.scaling_lr, "rotation": opt.rotation_lr,
               "rigid_v": opt.rigid_v_lr,
               "rigid_rotvec": opt.rigid_rotvec_lr,
               "rigid_rotcen": opt.rigid_rotcen_lr}
        new_params, new_adam = optim.step(state.params(), grads, adam, lrs)
        new_state = state.replace_params(new_params)
        # noise on the active immature subset, gated at the batch's FIRST
        # frame on EVERY device (the state is replicated, so the injection
        # must be device-identical; the reference injects per sampled
        # camera, train_swin.py:244-261). Dose analysis: both modes run the
        # same iteration count and inject ONCE per iteration, and the batch
        # is drawn from the same shuffled (camera, frame) stack the
        # single-device loop pops from (train_swin.py:111-132), so frame0
        # has the single-device sample's marginal distribution — each
        # gaussian's expected injections/iteration are identical (verified
        # by simulation: tests/test_swin.py::
        # test_dp_noise_gate_frame_marginal). What
        # differs is only the within-step correlation: the gradient
        # averages n frames while the noise gates on one of them, a
        # second-order effect on an exploration term.
        frame0 = lax.all_gather(frame_batch, axis, tiled=True)[0]
        new_state = swin.inject_noise_active(new_state, key, opt.noise_lr,
                                             xyz_lr, frame0)
        psnr = losses.psnr(jnp.clip(img, 0, 1), jnp.clip(gt, 0, 1),
                           channel_axis=0)
        return new_state, new_adam, SwinMetrics(
            loss=loss, l1=lax.pmean(ll1, axis),
            num_dup=lax.pmax(num_dup, axis),
            psnr=lax.pmean(psnr, axis),
            n_active=lax.pmax(n_active, axis))

    rep = P()
    shd = P(axis)

    @functools.lru_cache(maxsize=None)
    def build(sh_degree: int):
        sharded = shard_map(
            functools.partial(per_device, sh_degree=sh_degree), mesh=mesh,
            in_specs=(rep, rep, rep, shd, shd, shd, rep, rep),
            out_specs=(rep, rep, SwinMetrics(loss=rep, l1=rep, num_dup=rep,
                                             psnr=rep, n_active=rep)),
            check_vma=False)

        @functools.partial(jax.jit, donate_argnames=("state", "adam"))
        def stepfn(state, adam, key, cam_batch, gt_batch, frame_batch, bg,
                   iteration):
            return sharded(state, adam, key, cam_batch, gt_batch,
                           jnp.asarray(frame_batch, jnp.float32), bg,
                           jnp.asarray(iteration, jnp.float32))

        return stepfn

    return build
