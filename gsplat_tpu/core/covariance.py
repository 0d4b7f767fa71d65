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
    return unstrip_symmetric(covariance_6(scales, quats, scale_modifier))


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
    """Packed 6-vector covariance (the ``cov3D_precomp`` contract).

    Fully elementwise (Sigma_il = sum_j R_ij R_lj s_j^2): TPU lowers batched
    3x3 matmuls onto the 128x128 MXU catastrophically, so no einsum here.
    """
    R = quat_to_rotmat(quats)
    s2 = (scale_modifier * scales) ** 2  # [..., 3]

    def entry(i, l):
        return (R[..., i, 0] * R[..., l, 0] * s2[..., 0]
                + R[..., i, 1] * R[..., l, 1] * s2[..., 1]
                + R[..., i, 2] * R[..., l, 2] * s2[..., 2])

    return jnp.stack([entry(0, 0), entry(0, 1), entry(0, 2),
                      entry(1, 1), entry(1, 2), entry(2, 2)], axis=-1)


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
    # Elementwise throughout — batched tiny matmuls are MXU poison on TPU.
    w = view[:3, :3]  # world->cam rotation (scalars below)
    tx_ = (w[0, 0] * mean3d[..., 0] + w[0, 1] * mean3d[..., 1]
           + w[0, 2] * mean3d[..., 2] + view[0, 3])
    ty_ = (w[1, 0] * mean3d[..., 0] + w[1, 1] * mean3d[..., 1]
           + w[1, 2] * mean3d[..., 2] + view[1, 3])
    tz = (w[2, 0] * mean3d[..., 0] + w[2, 1] * mean3d[..., 1]
          + w[2, 2] * mean3d[..., 2] + view[2, 3])
    # z==0 only happens for culled/padding rows (visible needs z > 0.2),
    # but its 0/0 and 1/0 partials would poison reverse-mode AD even under
    # a zero cotangent — keep them finite.
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(tx_ / tz, -limx, limx) * tz
    ty = jnp.clip(ty_ / tz, -limy, limy) * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows: j0 = [fx/z, 0, -fx tx/z^2], j1 = [0, fy/z, -fy ty/z^2]
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    # M = J @ W (rows of the 2x3 projection in world space)
    m0 = [j00 * w[0, k] + j02 * w[2, k] for k in range(3)]
    m1 = [j11 * w[1, k] + j12 * w[2, k] for k in range(3)]

    xx, xy, xz, yy, yz, zz = (cov3d_6[..., i] for i in range(6))

    def quad(u, v):
        # u^T Sigma v for row vectors u, v (lists of 3 arrays)
        return (u[0] * (xx * v[0] + xy * v[1] + xz * v[2])
                + u[1] * (xy * v[0] + yy * v[1] + yz * v[2])
                + u[2] * (xz * v[0] + yz * v[1] + zz * v[2]))

    a = quad(m0, m0) + 0.3
    b = quad(m0, m1)
    c = quad(m1, m1) + 0.3
    return a, b, c
