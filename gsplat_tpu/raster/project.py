"""Per-Gaussian preprocessing: cull, project, conic, radius, SH color.

TPU-native equivalent of ``preprocessCUDA`` (reference:
cuda_rasterizer/forward.cu:156-256) as vectorized differentiable jnp.
The backward pass of this stage (reference backward.cu:144-396) is obtained
by XLA autodiff — no hand-written gradients needed.

Numerics matched to the reference:
- near cull at camera z <= 0.2 (auxiliary.h:139-164)
- perspective divide guarded by +1e-7 (forward.cu:199)
- EWA cov2d with +0.3 low-pass (forward.cu:110-111, via core.covariance)
- radius = ceil(3 * sqrt(max eigenvalue)), eigenvalue discriminant clamped
  at 0.1 (forward.cu:229-232)
- ndc2pix pixel mapping (auxiliary.h:41-44)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from gsplat_tpu.core import covariance as cov
from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core.camera import CameraParams, ndc_to_pix


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all [P, ...])."""

    xy: jnp.ndarray        # [P, 2] pixel-space mean
    depth: jnp.ndarray     # [P] camera-space z
    conic: jnp.ndarray     # [P, 3] inverse 2D covariance (a, b, c)
    rgb: jnp.ndarray       # [P, 3] view-dependent color (clamped >= 0)
    opacity: jnp.ndarray   # [P] activated opacity
    radius: jnp.ndarray    # [P] int32 screen radius (0 => culled)
    visible: jnp.ndarray   # [P] bool


def preprocess(
    means3d: jnp.ndarray,      # [P, 3]
    scales: jnp.ndarray,       # [P, 3] activated (positive)
    quats: jnp.ndarray,        # [P, 4] (w,x,y,z), normalized or not
    opacities: jnp.ndarray,    # [P] activated (0..1)
    shs: jnp.ndarray | None,   # [P, K, 3] or None if colors_precomp
    camera: CameraParams,
    sh_degree: int,
    *,
    colors_precomp: jnp.ndarray | None = None,  # [P, 3]
    cov3d_precomp: jnp.ndarray | None = None,   # [P, 6]
    scale_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,           # [P] bool (static-pad mask)
) -> Preprocessed:
    """Vectorized preprocess. Culled/dead Gaussians get radius 0, depth +inf."""
    # Camera-space position and near-plane cull (auxiliary.h:152-154).
    # Elementwise matvec (a [P,3]x[3,3] matmul lowers poorly on the MXU).
    depth = (camera.view[2, 0] * means3d[:, 0]
             + camera.view[2, 1] * means3d[:, 1]
             + camera.view[2, 2] * means3d[:, 2] + camera.view[2, 3])
    visible = depth > 0.2
    if alive is not None:
        visible = visible & alive

    # Projection to NDC then pixels (forward.cu:197-200, 233).
    fp = camera.full_proj
    hx, hy, hw = (fp[i, 0] * means3d[:, 0] + fp[i, 1] * means3d[:, 1]
                  + fp[i, 2] * means3d[:, 2] + fp[i, 3] for i in (0, 1, 3))
    p_w = 1.0 / (hw + 1e-7)
    x_pix = ndc_to_pix(hx * p_w, camera.width)
    y_pix = ndc_to_pix(hy * p_w, camera.height)
    xy = jnp.stack([x_pix, y_pix], axis=-1)

    # 3D covariance (6-vec) then EWA 2D covariance.
    if cov3d_precomp is not None:
        cov6 = cov3d_precomp
    else:
        cov6 = cov.covariance_6(scales, quats, scale_modifier)
    a, b, c = cov.project_cov2d(
        means3d, cov6, camera.view,
        camera.focal_x, camera.focal_y, camera.tan_fovx, camera.tan_fovy)

    det = a * c - b * b
    visible = visible & (det != 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # 3-sigma screen radius from eigenvalues (forward.cu:229-232).
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # Color: SH eval (with clamp handled by sh_to_rgb's max) or precomputed.
    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb = sh_lib.sh_to_rgb(sh_degree, shs, means3d, camera.cam_pos)

    depth = jnp.where(visible, depth, jnp.inf)
    return Preprocessed(
        xy=xy, depth=depth, conic=conic, rgb=rgb,
        opacity=opacities, radius=radius, visible=visible)


def tile_rect(xy, radius, tile_x: int, tile_y: int, grid_x: int, grid_y: int):
    """Tile bounding rect per Gaussian (auxiliary.h:46-56 getRect).

    Returns (min_x, min_y, max_x, max_y) int32, max exclusive, clamped to grid.
    Matches the CUDA int-division semantics for non-negative clamped values.
    """
    x, y = xy[..., 0], xy[..., 1]
    r = radius.astype(x.dtype)
    min_x = jnp.clip(jnp.floor((x - r) / tile_x), 0, grid_x).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor((y - r) / tile_y), 0, grid_y).astype(jnp.int32)
    max_x = jnp.clip(jnp.floor((x + r + tile_x - 1) / tile_x), 0, grid_x).astype(jnp.int32)
    max_y = jnp.clip(jnp.floor((y + r + tile_y - 1) / tile_y), 0, grid_y).astype(jnp.int32)
    return min_x, min_y, max_x, max_y
