"""High-level render entry — the equivalent of gaussian_renderer.render
(reference gaussian_renderer/__init__.py:19-102).

Returns the same bundle the reference training loops consume:
``render`` (image), ``viewspace_points`` (unused by MCMC training — the
reference returns the dummy grad-holder; we return None), ``visibility_filter``
(radii > 0), ``radii``, ``is_used``, plus TPU-specific diagnostics
(``num_dup``). ``deformable_render`` (the SwinGS path,
gaussian_renderer/__init__.py:105-172) lives in gsplat_tpu.model.swin.
"""

from __future__ import annotations

import jax.numpy as jnp

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.model.gaussians import GaussianState
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize


def render(camera: CameraParams, state: GaussianState, bg,
           settings: RasterizeSettings, sh_degree: int | None = None,
           scale_modifier: float = 1.0,
           convert_shs_python: bool = False,
           compute_cov3d_python: bool = False):
    """Render a GaussianState from a camera. sh_degree defaults to the
    model's max (pass the active degree during progressive SH training).

    ``convert_shs_python`` / ``compute_cov3d_python`` mirror the reference's
    pipe.convert_SHs_python / pipe.compute_cov3D_python switches
    (gaussian_renderer/__init__.py:63-83): the SH->RGB conversion and/or the
    scale+quat->3D-covariance build run OUTSIDE the rasterizer op and feed
    its ``colors_precomp`` / ``cov3d_precomp`` inputs. Both paths are
    image-identical to the fused path (same math, tested in
    tests/test_raster.py) — they exist for API parity and for callers that
    want to override colors/covariances wholesale."""
    deg = state.max_sh_degree if sh_degree is None else sh_degree
    colors_precomp = None
    cov3d_precomp = None
    if convert_shs_python:
        from gsplat_tpu.core.sh import sh_to_rgb

        colors_precomp = sh_to_rgb(deg, state.get_features(), state.xyz,
                                   camera.cam_pos)
    if compute_cov3d_python:
        cov3d_precomp = state.get_covariance(scale_modifier)
    out = rasterize(
        state.xyz, state.get_scaling(), state.get_rotation(),
        state.get_opacity()[:, 0],
        None if convert_shs_python else state.get_features(), camera, deg,
        jnp.asarray(bg, jnp.float32), settings,
        colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier, alive=state.alive_mask)
    return {
        "render": out.image,
        "viewspace_points": None,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "is_used": out.is_used,
        "used_tile": out.used_tile,
        "num_dup": out.num_dup,
        "final_t": out.final_t,
    }


def deformable_render(camera: CameraParams, state, frame, bg,
                      settings: RasterizeSettings,
                      sh_degree: int | None = None):
    """Frame-indexed render of a SwinState (the reference deformable_render,
    gaussian_renderer/__init__.py:105-172): applies the rigid temporal
    deformation and returns the active-set parameters alongside the image
    (the reference's ``input_gaussians``, used by the regularizers)."""
    from gsplat_tpu.model import swin as swin_lib

    deg = state.im.max_sh_degree if sh_degree is None else sh_degree
    kw = swin_lib.union_params_at(state, frame)
    out = rasterize(kw["means3d"], kw["scales"], kw["quats"],
                    kw["opacities"], kw["shs"], camera, deg,
                    jnp.asarray(bg, jnp.float32), settings,
                    alive=kw["alive"])
    return {
        "render": out.image,
        "viewspace_points": None,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "is_used": out.is_used,
        "used_tile": out.used_tile,
        "num_dup": out.num_dup,
        "final_t": out.final_t,
        "input_gaussians": kw,
    }
