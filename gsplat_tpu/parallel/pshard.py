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
_ZFAR = 120.0


def _slab_bounds(depth, alive, n_dev: int, axis: str):
    """Global equal-occupancy depth boundaries from a psum'd histogram.

    Returns [n_dev + 1] boundaries in log-depth space (first=-inf-ish,
    last=+inf)."""
    logd = jnp.log(jnp.clip(depth, ZNEAR_CULL, _ZFAR))
    lo, hi = jnp.log(ZNEAR_CULL), jnp.log(_ZFAR)
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
                            jnp.asarray([jnp.inf])])


def make_pshard_render(mesh: Mesh, settings: RasterizeSettings,
                       sh_degree: int, axis: str = "ps"):
    """Build a jitted render over P-sharded Gaussian parameters.

    Inputs (leading axis sharded over ``axis``): means3d [P,3], scales,
    quats, opacities [P], shs [P,K,3], alive [P]; camera + bg replicated.
    Returns the composited [H, W, 3] image (replicated).
    """
    n_dev = mesh.shape[axis]

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
        bounds = _slab_bounds(depth_f, alive_f & (depth_f > ZNEAR_CULL),
                              n_dev, axis)
        logd = jnp.log(jnp.clip(depth_f, ZNEAR_CULL, _ZFAR))
        my_mask = (logd >= bounds[d]) & (logd < bounds[d + 1])

        out = rasterize(means_f, scales_f, quats_f, opa_f, shs_f, camera,
                        sh_degree, jnp.zeros(3), settings,
                        alive=alive_f & my_mask)
        c_local = out.image          # premultiplied (bg=0)
        t_local = out.final_t[..., None]

        cs = lax.all_gather(c_local, axis)   # [n_dev, H, W, 3]
        ts = lax.all_gather(t_local, axis)   # [n_dev, H, W, 1]

        def fold(carry, xt):
            c_acc, t_acc = carry
            c_d, t_d = xt
            return (c_acc + t_acc * c_d, t_acc * t_d), None

        (c_fin, t_fin), _ = lax.scan(
            fold, (jnp.zeros_like(c_local), jnp.ones_like(t_local)),
            (cs, ts))
        return c_fin + t_fin * bg

    rep = P()
    shd = P(axis)
    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(shd, shd, shd, shd, shd, shd, rep, rep),
        out_specs=rep, check_vma=False)
    return jax.jit(fn)
