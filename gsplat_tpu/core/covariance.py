"""Gaussian covariance construction and EWA screen-space projection.

Parity targets:
- scale+quat -> 3D covariance (reference: cuda_rasterizer/forward.cu:118-152,
  utils/general_utils.py:101-110): Sigma = R S S R^T, quaternion (w,x,y,z).
- EWA 2D projection with frustum clamping at 1.3*tan_fov and the +0.3
  low-pass on the diagonal (reference: cuda_rasterizer/forward.cu:74-113).
- symmetric 3x3 <-> 6-vector packing (utils/general_utils.py:64-76) in the
  order (xx, xy, xz, yy, yz, zz).
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import quat_to_rotmat


def build_scaling_rotation(scales, quats):
    """L = R @ diag(s): [..., 3, 3] (utils/general_utils.py:101-110).

    Note: the torch helper normalizes the quaternion (build_rotation,
    general_utils.py:79-81) while the CUDA kernel does NOT
    (forward.cu:127 has the normalization commented out). We normalize, which
    matches every in-training call site (quaternions reach the kernel already
    normalized by the rotation activation).
    """
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]  # R @ diag(s)


def covariance_3d(scales, quats, scale_modifier=1.0):
    """Sigma = L L^T, [..., 3, 3]."""
    L = build_scaling_rotation(scale_modifier * scales, quats)
    # Explicit f32 contraction: TPU's default matmul precision is bf16,
    # which is far too coarse for covariance geometry.
    return jnp.einsum("...ik,...jk->...ij", L, L, precision="highest")


def strip_symmetric(cov):
    """[..., 3, 3] symmetric -> [..., 6] = (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def unstrip_symmetric(v):
    """[..., 6] -> [..., 3, 3] symmetric."""
    xx, xy, xz, yy, yz, zz = (v[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def covariance_6(scales, quats, scale_modifier=1.0):
    """Packed 6-vector covariance (the ``cov3D_precomp`` contract)."""
    return strip_symmetric(covariance_3d(scales, quats, scale_modifier))


def project_cov2d(mean3d, cov3d_6, view, focal_x, focal_y, tan_fovx, tan_fovy):
    """EWA projection of a 3D covariance to screen space.

    Reproduces cuda_rasterizer/forward.cu:74-113 exactly:
      t = view @ mean (camera space), with t.xy clamped so |t.x/t.z| <= 1.3*tanfov
      J = perspective Jacobian rows for x,y (third row zero)
      cov2d = J W Sigma W^T J^T ; then cov2d[0,0] += 0.3, cov2d[1,1] += 0.3

    Args:
      mean3d [..., 3]; cov3d_6 [..., 6]; view [4, 4] world->camera
      (column-vector convention: x_cam = view @ [x_world, 1]).
    Returns (cov2d_a, cov2d_b, cov2d_c) = (xx, xy, yy) each [...].
    """
    t = jnp.einsum("ij,...j->...i", view[:3, :3], mean3d,
                   precision="highest") + view[:3, 3]
    tz = t[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J: d(image_xy)/d(cam_xyz), 2x3 rows
    zeros = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1),
            jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # [..., 2, 3]
    W = view[:3, :3]  # world->cam rotation
    Sigma = unstrip_symmetric(cov3d_6)
    M = jnp.einsum("...ij,jk->...ik", J, W, precision="highest")  # [..., 2, 3]
    cov2d = jnp.einsum("...ij,...jk,...lk->...il", M, Sigma, M,
                       precision="highest")  # [..., 2, 2]
    a = cov2d[..., 0, 0] + 0.3
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + 0.3
    return a, b, c
