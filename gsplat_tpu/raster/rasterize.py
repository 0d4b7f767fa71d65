"""Public differentiable rasterization API.

Mirrors the reference rasterizer contract
(diff_gaussian_rasterization/__init__.py:157-226): inputs are Gaussian
parameters (+ optional precomputed colors / 3D covariances) and camera
settings; outputs are the rendered image, per-Gaussian screen radii and an
``is_used`` visibility flag. Gradients flow to means3D, scales, rotations,
opacities, SHs (and colors/cov3D when precomputed) — the chain rules the
reference hand-writes in backward.cu come from XLA autodiff around the
Pallas tile-blend custom-VJP op.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.raster import binning as binning_lib
from gsplat_tpu.raster import project as project_lib
from gsplat_tpu.raster import tile_kernel


@dataclasses.dataclass(frozen=True)
class RasterizeSettings:
    """Static rasterizer configuration (hashable — safe as a jit static arg).

    k_dup is the static Gaussian->tile duplicate budget (the reference's
    dynamic ``num_rendered``, rasterizer_impl.cu:282). Overflow is reported
    via the returned ``num_dup`` — never silently truncated without signal.
    """

    k_dup: int
    tile_x: int = 16
    tile_y: int = 16
    chunk: int = 128
    interpret: bool = False


class RasterizeOutput(NamedTuple):
    image: jnp.ndarray     # [H, W, 3] composited over background
    radii: jnp.ndarray     # [P] int32 (0 => culled)
    is_used: jnp.ndarray   # [P] bool — Gaussian rasterized into >= 1 tile
    num_dup: jnp.ndarray   # [] int32 true duplicate count (check <= k_dup)
    final_t: jnp.ndarray   # [H, W] final transmittance


def _pad_tile_lists(tile_starts, num_tiles: int, k_dup: int, chunk: int):
    """Pad each tile's duplicate range to a CHUNK multiple (>= 1 chunk).

    Returns (pos [k_dup] target slot per sorted duplicate, chunk_tile,
    chunk_first, k_padded). Static size k_padded = k_dup rounded up plus one
    chunk per tile (worst-case padding) plus one spare chunk.
    """
    k_padded = (-(-k_dup // chunk) + num_tiles + 1) * chunk
    num_chunks = k_padded // chunk

    len_t = tile_starts[1:] - tile_starts[:-1]
    padded_len = -(-jnp.maximum(len_t, 1) // chunk) * chunk
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_len, dtype=jnp.int32)])

    d = jnp.arange(k_dup, dtype=jnp.int32)
    tile_of = jnp.clip(
        jnp.searchsorted(tile_starts, d, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1)
    pos = padded_starts[tile_of] + (d - tile_starts[tile_of])

    offs = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    chunk_tile = jnp.clip(
        jnp.searchsorted(padded_starts, offs, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1)
    chunk_first = (offs == padded_starts[chunk_tile]).astype(jnp.int32)
    return pos, tile_of, chunk_tile, chunk_first, k_padded


def _dup_features(proc, gid, tile_of, valid, grid_x: int,
                  tile_x: int, tile_y: int):
    """Per-duplicate packed features [K_dup, 16] (differentiable gather).

    The quadratic form is expanded over LOCAL pixel coordinates (pixel -
    tile origin) so fp32 stays accurate at large image sizes:
      power = -0.5*a*dx^2 - 0.5*c*dy^2 - b*dx*dy,  dx = px - x, dy = py - y
    with px = origin_x + px_local  =>  coefficients over (px_local, py_local).
    """
    x = proc.xy[gid, 0] - (tile_of % grid_x).astype(jnp.float32) * tile_x
    y = proc.xy[gid, 1] - (tile_of // grid_x).astype(jnp.float32) * tile_y
    a = proc.conic[gid, 0]
    b = proc.conic[gid, 1]
    c = proc.conic[gid, 2]
    c0 = -0.5 * a
    c1 = -0.5 * c
    c2 = -b
    c3 = a * x + b * y
    c4 = c * y + b * x
    c5 = -0.5 * (a * x * x + c * y * y) - b * x * y
    rgb = proc.rgb[gid]
    opa = proc.opacity[gid]
    zeros = jnp.zeros_like(a)
    feat = jnp.stack(
        [c0, c1, c2, c3, c4, c5, rgb[:, 0], rgb[:, 1], rgb[:, 2], opa,
         zeros, zeros, zeros, zeros, zeros, zeros], axis=0)  # [16, K_dup]
    return jnp.where(valid[None, :], feat, 0.0)


def rasterize(
    means3d, scales, quats, opacities, shs, camera: CameraParams,
    sh_degree: int, bg, settings: RasterizeSettings, *,
    colors_precomp=None, cov3d_precomp=None, scale_modifier: float = 1.0,
    alive=None,
) -> RasterizeOutput:
    """Render Gaussians through the full differentiable pipeline."""
    s = settings
    grid_x = -(-camera.width // s.tile_x)
    grid_y = -(-camera.height // s.tile_y)
    num_tiles = grid_x * grid_y
    n_pix = s.tile_x * s.tile_y

    proc = project_lib.preprocess(
        means3d, scales, quats, opacities, shs, camera, sh_degree,
        colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier, alive=alive)

    # Binning is integer bookkeeping — no gradients through the sort.
    proc_ng = jax.tree.map(lax.stop_gradient, proc)
    binn = binning_lib.bin_gaussians(
        proc_ng, tile_x=s.tile_x, tile_y=s.tile_y,
        grid_x=grid_x, grid_y=grid_y, k_dup=s.k_dup)

    pos, tile_of, chunk_tile, chunk_first, k_padded = _pad_tile_lists(
        binn.tile_starts, num_tiles, s.k_dup, s.chunk)

    valid = jnp.arange(s.k_dup, dtype=jnp.int32) < binn.num_dup
    feat = _dup_features(proc, binn.gid, tile_of, valid, grid_x,
                         s.tile_x, s.tile_y)
    feat_padded = (
        jnp.zeros((tile_kernel.NUM_FEAT, k_padded), jnp.float32)
        .at[:, jnp.where(valid, pos, k_padded)]
        .set(feat, mode="drop"))

    c_img, t_img = tile_kernel.tile_blend(
        feat_padded, chunk_tile, chunk_first, num_tiles, n_pix,
        s.tile_x, s.chunk, s.interpret)

    # Assemble tile-major buffers into the image and composite background.
    def assemble(img_t, ch):
        img = img_t.reshape(grid_y, grid_x, s.tile_y, s.tile_x, ch)
        img = img.transpose(0, 2, 1, 3, 4)
        img = img.reshape(grid_y * s.tile_y, grid_x * s.tile_x, ch)
        return img[: camera.height, : camera.width]

    color = assemble(c_img, 3)
    final_t = assemble(t_img, 1)
    image = color + final_t * jnp.asarray(bg, jnp.float32)

    is_used = binn.radius > 0
    return RasterizeOutput(image=image, radii=binn.radius, is_used=is_used,
                           num_dup=binn.num_dup, final_t=final_t[..., 0])
