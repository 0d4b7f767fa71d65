"""Gaussian-sharded (P-sharded) rendering — the tensor-parallel analogue.

The reference's only cross-Gaussian coupling is the device-wide radix sort +
per-tile compositing (SURVEY.md §2c). To scale the Gaussian dimension across
devices we partition by CAMERA DEPTH SLAB and exploit the associativity of
front-to-back over-compositing:

  1. every device all-gathers the (raw) Gaussian parameters — the transpose
     of this gather under AD is exactly the psum-scatter that reduces
     per-shard gradients back to the owning shard;
  2. a psum'd log-depth histogram yields global slab boundaries with roughly
     equal occupancy; device d rasterizes only Gaussians whose depth falls
     in slab d (a mask — shapes stay static);
  3. per-device premultiplied (C_d, T_d) images are all-gathered and folded
     in slab order:  C = sum_d (prod_{e<d} T_e) * C_d,  T = prod_d T_d.

Because slabs partition camera depth, slab order == global depth order for
every pixel, so the result matches single-device rendering up to the
T<=1e-4 early-termination rule (each slab gates on its local transmittance;
cross-slab contributions beyond saturation are bounded by 1e-4 per channel
— the same deviation class as the kernel's own termination handling).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize

ZNEAR_CULL = 0.2  # frustum near-cull plane (auxiliary.h:154)
_HIST_BINS = 256


def _depth_hi(depth, alive, axis: str):
    """Upper end of the slab-binning depth range: the pmax'd deepest alive
    point (NOT a fixed constant — a magic zfar collapses any deeper scene
    content into the last bin and skews slab balance). Slab bounds are
    bookkeeping, not a differentiable quantity (pmax has no AD rule)."""
    d_max = lax.pmax(
        lax.stop_gradient(jnp.max(jnp.where(alive, depth, -jnp.inf))), axis)
    return jnp.maximum(d_max, 2.0 * ZNEAR_CULL)


def _log_depth(depth, hi):
    return jnp.log(jnp.clip(depth, ZNEAR_CULL, hi))


def _slab_bounds(depth, alive, n_dev: int, axis: str):
    """Global equal-occupancy depth boundaries from a psum'd histogram.

    Returns ([n_dev + 1] boundaries in log-depth space (first=-inf-ish,
    last=+inf), hi depth for ``_log_depth``)."""
    hi_d = _depth_hi(depth, alive, axis)
    logd = _log_depth(depth, hi_d)
    lo, hi = jnp.log(ZNEAR_CULL), jnp.log(hi_d)
    bins = jnp.clip(((logd - lo) / (hi - lo) * _HIST_BINS).astype(jnp.int32),
                    0, _HIST_BINS - 1)
    hist = jnp.zeros((_HIST_BINS,), jnp.int32).at[bins].add(
        alive.astype(jnp.int32))
    hist = lax.psum(hist, axis)
    cum = jnp.cumsum(hist)
    total = cum[-1]
    # boundary ranks at equal fractions; boundary value = bin upper edge
    edges = lo + (hi - lo) * (jnp.arange(1, _HIST_BINS + 1) / _HIST_BINS)
    targets = (jnp.arange(1, n_dev, dtype=jnp.float32) / n_dev
               * total.astype(jnp.float32))
    idx = jnp.searchsorted(cum, targets.astype(jnp.int32), side="left")
    inner = edges[jnp.clip(idx, 0, _HIST_BINS - 1)]
    return jnp.concatenate([jnp.asarray([-jnp.inf]), inner,
                            jnp.asarray([jnp.inf])]), hi_d


def make_pshard_render(mesh: Mesh, settings: RasterizeSettings,
                       sh_degree: int, axis: str = "ps"):
    """Build a jitted render over P-sharded Gaussian parameters.

    Inputs (leading axis sharded over ``axis``): means3d [P,3], scales,
    quats, opacities [P], shs [P,K,3], alive [P]; camera + bg replicated.
    Returns the composited [H, W, 3] image (replicated).
    """
    import dataclasses as _dc

    n_dev = mesh.shape[axis]
    # internal compositing runs channel-first (see step.py); the public
    # return stays [H, W, 3]
    settings = _dc.replace(settings, layout="chw")

    def per_device(means, scales, quats, opa, shs, alive, camera: CameraParams,
                   bg):
        d = lax.axis_index(axis)
        # gather the full parameter set (AD transpose: psum-scatter of grads)
        def gather(x):
            g = lax.all_gather(x, axis)  # [n_dev, P/n, ...]
            return g.reshape((-1,) + g.shape[2:])

        means_f, scales_f, quats_f, opa_f, shs_f = map(
            gather, (means, scales, quats, opa, shs))
        alive_f = gather(alive)

        view = camera.view
        depth_f = (means_f[:, 0] * view[2, 0] + means_f[:, 1] * view[2, 1]
                   + means_f[:, 2] * view[2, 2]) + view[2, 3]
        bounds, hi_d = _slab_bounds(depth_f, alive_f & (depth_f > ZNEAR_CULL),
                                    n_dev, axis)
        logd = _log_depth(depth_f, hi_d)
        my_mask = (logd >= bounds[d]) & (logd < bounds[d + 1])

        out = rasterize(means_f, scales_f, quats_f, opa_f, shs_f, camera,
                        sh_degree, jnp.zeros(3), settings,
                        alive=alive_f & my_mask)
        c_local = out.image          # [3, H, W] premultiplied (bg=0)
        t_local = out.final_t[None]  # [1, H, W]

        cs = lax.all_gather(c_local, axis)   # [n_dev, 3, H, W]
        ts = lax.all_gather(t_local, axis)   # [n_dev, 1, H, W]

        def fold(carry, xt):
            c_acc, t_acc = carry
            c_d, t_d = xt
            return (c_acc + t_acc * c_d, t_acc * t_d), None

        (c_fin, t_fin), _ = lax.scan(
            fold, (jnp.zeros_like(c_local), jnp.ones_like(t_local)),
            (cs, ts))
        return (c_fin + t_fin * bg[:, None, None]).transpose(1, 2, 0)

    rep = P()
    shd = P(axis)
    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(shd, shd, shd, shd, shd, shd, rep, rep),
        out_specs=rep, check_vma=False)
    return jax.jit(fn)


class PShardMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_dup: jnp.ndarray
    psnr: jnp.ndarray


def make_pshard_train_step(mesh: Mesh, opt, settings: RasterizeSettings,
                           spatial_lr_scale: float, sh_degree: int,
                           axis: str = "ps", dp_axis: str | None = None):
    """P-sharded (Gaussian-dimension, the tensor-parallel analogue) train
    step: render + loss + Adam + noise, completing SURVEY.md §2c.

    ``params`` (the GaussianState param dict), ``alive`` and ``adam`` are
    sharded on their leading (Gaussian) axis over ``axis``; camera, gt, bg,
    iteration and ``n_alive_total`` are replicated. Each device rasterizes
    its depth slab of the ALL-GATHERED parameters; the per-shard gradients
    arrive via the AD transpose of the gather (a psum-scatter over ICI —
    the distributed replacement for the reference's device-wide radix sort
    + atomicAdd, rasterizer_impl.cu:304-309 / backward.cu:523-554). Adam
    state never leaves the shard. MCMC densification runs OUTSIDE this step
    on gathered state (it is a once-per-100-iters host-paced op).

    ``gt`` must arrive channel-first [3, H, W] (see step.py).

    ``dp_axis``: when set, the step runs over a 2-D (dp x ps) mesh — the
    DP/TP-composition analogue. Each dp row trains its OWN camera of the
    batch on the same ps-sharded parameters (camera/gt gain a leading
    dp axis, one sample per row; see dp.stack_cameras); gradients are
    pmean'd over ``dp_axis`` before the shard-local Adam step, so the
    update equals the camera-batch mean exactly as in parallel/dp.py while
    parameters and optimizer state stay ps-sharded. All ps collectives
    (slab histogram psum, parameter all-gather, gradient psum-scatter)
    stay within a dp row.
    """
    import dataclasses as _dc

    from gsplat_tpu.core.covariance import covariance_6
    from gsplat_tpu.core.quaternion import normalize
    from gsplat_tpu.core.schedule import expon_lr
    from gsplat_tpu.model import optim
    from gsplat_tpu.train import losses

    n_dev = mesh.shape[axis]
    settings = _dc.replace(settings, layout="chw")

    def per_device(params, alive, adam, key, camera: CameraParams, gt, bg,
                   iteration, n_alive_total):
        d = lax.axis_index(axis)
        if dp_axis is not None:
            # one (camera, gt) sample per dp row; leading axis is 1 here
            camera = jax.tree.map(lambda x: x[0], camera)
            gt = gt[0]

        def gather(x):
            g = lax.all_gather(x, axis)
            return g.reshape((-1,) + g.shape[2:])

        def loss_fn(p):
            means = p["xyz"]
            scales = jnp.exp(p["scaling"])
            quats = normalize(p["rotation"])
            opa = jax.nn.sigmoid(p["opacity"])[:, 0]
            shs = jnp.concatenate([p["f_dc"], p["f_rest"]], axis=1)
            means_f, scales_f, quats_f, opa_f, shs_f = map(
                gather, (means, scales, quats, opa, shs))
            alive_f = gather(alive)

            view = camera.view
            depth_f = (means_f[:, 0] * view[2, 0] + means_f[:, 1] * view[2, 1]
                       + means_f[:, 2] * view[2, 2]) + view[2, 3]
            bounds, hi_d = _slab_bounds(depth_f,
                                        alive_f & (depth_f > ZNEAR_CULL),
                                        n_dev, axis)
            logd = _log_depth(depth_f, hi_d)
            my_mask = (logd >= bounds[d]) & (logd < bounds[d + 1])

            out = rasterize(means_f, scales_f, quats_f, opa_f, shs_f, camera,
                            sh_degree, jnp.zeros(3), settings,
                            alive=alive_f & my_mask)
            cs = lax.all_gather(out.image, axis)        # [n_dev, 3, H, W]
            ts = lax.all_gather(out.final_t[None], axis)  # [n_dev, 1, H, W]

            def fold(carry, xt):
                c_acc, t_acc = carry
                c_d, t_d = xt
                return (c_acc + t_acc * c_d, t_acc * t_d), None

            (c_fin, t_fin), _ = lax.scan(
                fold, (jnp.zeros_like(out.image),
                       jnp.ones_like(out.final_t[None])), (cs, ts))
            img = c_fin + t_fin * bg[:, None, None]

            ll1 = losses.l1_loss(img, gt)
            lssim = losses.ssim(img, gt)
            loss = (1 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1 - lssim)
            # regularizers: per-shard masked sums, psum'd to the global mean
            af = alive.astype(jnp.float32)
            opa_sum = lax.psum(jnp.sum(jnp.abs(jax.nn.sigmoid(p["opacity"]))
                                       * af[:, None]), axis)
            scl_sum = lax.psum(jnp.sum(
                jnp.mean(jnp.abs(jnp.exp(p["scaling"])), axis=1) * af), axis)
            denom = jnp.maximum(n_alive_total.astype(jnp.float32), 1.0)
            loss = loss + opt.opacity_reg * opa_sum / denom
            loss = loss + opt.scale_reg * scl_sum / denom
            # Dividing by n_dev makes the SUM of the per-device replicas
            # equal the true loss, so the psum-scatter transpose of the
            # all-gathers delivers exactly dL/d(shard) — no overcount.
            return loss / n_dev, (loss, img, ll1, out.num_dup)

        (_, (loss, img, ll1, num_dup)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if dp_axis is not None:
            # camera-batch mean, exactly as parallel/dp.py; the ps-shard
            # layout of every gradient leaf is identical across dp rows.
            grads = jax.tree.map(lambda g: lax.pmean(g, dp_axis), grads)
            loss = lax.pmean(loss, dp_axis)
            ll1 = lax.pmean(ll1, dp_axis)
            num_dup = lax.pmax(num_dup, dp_axis)

        xyz_lr = expon_lr(iteration,
                          opt.position_lr_init * spatial_lr_scale,
                          opt.position_lr_final * spatial_lr_scale,
                          lr_delay_mult=opt.position_lr_delay_mult,
                          max_steps=opt.position_lr_max_steps)
        lrs = {"xyz": xyz_lr, "f_dc": opt.feature_lr,
               "f_rest": opt.feature_lr / 20.0, "opacity": opt.opacity_lr,
               "scaling": opt.scaling_lr, "rotation": opt.rotation_lr}
        new_params, new_adam = optim.step(params, grads, adam, lrs)

        # covariance-shaped noise on the local shard (train_static.py:132-140)
        opa_act = jax.nn.sigmoid(new_params["opacity"])
        gate = jax.nn.sigmoid(100.0 * ((1.0 - opa_act) - 0.995))
        nkey = jax.random.fold_in(key, d)
        noise = (jax.random.normal(nkey, new_params["xyz"].shape)
                 * gate * opt.noise_lr * xyz_lr)
        cov6 = covariance_6(jnp.exp(new_params["scaling"]),
                            normalize(new_params["rotation"]))
        xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
        nx, ny, nz = noise[:, 0], noise[:, 1], noise[:, 2]
        noise = jnp.stack([xx * nx + xy * ny + xz * nz,
                           xy * nx + yy * ny + yz * nz,
                           xz * nx + yz * ny + zz * nz], axis=-1)
        noise = jnp.where(alive[:, None], noise, 0.0)
        new_params = dict(new_params, xyz=new_params["xyz"] + noise)

        psnr = losses.psnr(jnp.clip(img, 0, 1), jnp.clip(gt, 0, 1),
                           channel_axis=0)
        if dp_axis is not None:
            psnr = lax.pmean(psnr, dp_axis)
        return new_params, new_adam, PShardMetrics(
            loss=loss, l1=ll1, num_dup=lax.pmax(num_dup, axis), psnr=psnr)

    rep = P()
    shd = P(axis)
    cam_spec = rep if dp_axis is None else P(dp_axis)
    from gsplat_tpu.model.optim import AdamState
    adam_spec = AdamState(mu=shd, nu=shd, count=rep)  # count is a scalar
    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(shd, shd, adam_spec, rep, cam_spec, cam_spec, rep, rep,
                  rep),
        out_specs=(shd, adam_spec, PShardMetrics(loss=rep, l1=rep,
                                                 num_dup=rep, psnr=rep)),
        check_vma=False)

    @functools.partial(jax.jit, donate_argnames=("params", "adam"))
    def stepfn(params, alive, adam, key, camera, gt, bg, iteration,
               n_alive_total):
        return sharded(params, alive, adam, key, camera, gt, bg,
                       jnp.asarray(iteration, jnp.float32),
                       jnp.asarray(n_alive_total, jnp.int32))

    return stepfn
