"""Image-band sharded rendering — the sequence/context-parallel analogue.

SURVEY.md §2c/§5 map the reference's "sequence" axis onto the tile grid:
where pshard.py splits the GAUSSIAN dimension (TP analogue, needs an
ordered compositing reduce), this mode splits the IMAGE rows — each device
renders a horizontal band of the frame against the full replicated
parameter set, and the bands concatenate into the frame with NO
compositing collective at all (bands are disjoint pixels; the only
communication is the output all-gather implied by the replicated
out-spec).

Per-device work scales ~1/n in pixels AND in duplicates (a Gaussian is
binned on a device only if its rect overlaps that device's band), so this
is the right mode for very large frames (4K/8K offline renders) or for
fitting a frame whose duplicate budget exceeds one chip's HBM. Unlike the
depth-slab mode it has zero cross-device numerical coupling: every band
pixel is computed by exactly one device with the exact single-device
compositing order (matches to fp rounding of one pixel-space translation;
the depth-slab mode's per-slab T<=1e-4 early-exit deviation class does
not arise).

The band itself is implemented in the rasterizer (rasterize(band_h=...,
band_y0=...)): a pure pixel-space y-shift between preprocess and binning,
so projection/EWA/clamp semantics are bit-identical to the full-frame
render (a cropped CAMERA would perturb the 1.3*tan_fov Jacobian clamp of
computeCov2D, forward.cu:86-93).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize


def band_height(height: int, n_dev: int, tile_y: int) -> int:
    """Rows per device: equal bands, padded up to the tile height so each
    band is a whole number of tile rows (the last band's pad rows are
    rendered and cropped by the caller)."""
    rows = -(-height // n_dev)
    return -(-rows // tile_y) * tile_y


def make_tileshard_render(mesh: Mesh, settings: RasterizeSettings,
                          sh_degree: int, axis: str = "sp"):
    """Build a jitted full-frame render with image rows sharded over
    ``axis``.

    Inputs (ALL replicated): means3d [P,3], scales, quats, opacities [P],
    shs [P,K,3], alive [P], camera, bg. Returns the [H, W, 3] frame
    (replicated). ``settings.k_dup`` is the PER-BAND duplicate budget
    (total across devices ~ the single-device budget: rect duplicates
    split across bands, plus one extra per band a rect straddles).
    """
    n_dev = mesh.shape[axis]
    settings = dataclasses.replace(settings, layout="chw")

    def per_device(means, scales, quats, opa, shs, alive,
                   camera: CameraParams, bg):
        hb = band_height(camera.height, n_dev, settings.tile_y)
        d = lax.axis_index(axis)
        out = rasterize(means, scales, quats, opa, shs, camera, sh_degree,
                        bg, settings, alive=alive,
                        band_h=hb, band_y0=(d * hb).astype(jnp.float32))
        return out.image[None]  # [1, 3, hb, W]; bands concat over axis 0

    rep = P()
    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(rep,) * 8, out_specs=P(axis), check_vma=False)

    def full(means, scales, quats, opa, shs, alive, camera, bg):
        bands = fn(means, scales, quats, opa, shs, alive, camera, bg)
        h, w = camera.height, camera.width
        img = jnp.moveaxis(bands, 1, 0).reshape(3, -1, w)[:, :h, :]
        return img.transpose(1, 2, 0)

    return jax.jit(full)


def tileshard_num_dup(mesh: Mesh, settings: RasterizeSettings,
                      sh_degree: int, axis: str = "sp"):
    """Jitted per-band duplicate-count probe (max over bands) for sizing
    the per-band ``k_dup`` budget before building the render."""
    n_dev = mesh.shape[axis]
    settings = dataclasses.replace(settings, layout="chw")

    def per_device(means, scales, quats, opa, shs, alive,
                   camera: CameraParams, bg):
        hb = band_height(camera.height, n_dev, settings.tile_y)
        d = lax.axis_index(axis)
        out = rasterize(means, scales, quats, opa, shs, camera, sh_degree,
                        bg, settings, alive=alive,
                        band_h=hb, band_y0=(d * hb).astype(jnp.float32))
        return lax.pmax(out.num_dup, axis)

    rep = P()
    fn = shard_map(per_device, mesh=mesh, in_specs=(rep,) * 8,
                   out_specs=rep, check_vma=False)
    return jax.jit(fn)
