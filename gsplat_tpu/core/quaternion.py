"""Quaternion / rotation-vector math and the rigid temporal deformation model.

Parity targets:
- quat -> rotation matrix (reference: utils/general_utils.py:78-99,
  cuda_rasterizer/forward.cu:118-152) — quaternion layout is (w, x, y, z).
- rotvec2quat / rotvec2mat / quat_mul / rigid_deform
  (reference: utils/tempo_utils.py:4-84).

Everything is batched jnp and differentiable. Unlike the torch reference,
these take the leading batch dims implicitly (shape [..., 3] / [..., 4]).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def normalize(v, axis=-1):
    """Unit-normalize with torch.nn.functional.normalize semantics: the norm
    is clamped at eps, so zero vectors map to zero (finite) instead of NaN —
    critical for padding rows whose raw quaternion is all-zero (their inf/NaN
    would otherwise poison reverse-mode AD even under a zero cotangent)."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v / jnp.sqrt(jnp.maximum(n2, 1e-24))


def quat_to_rotmat(q, normalize_q: bool = True):
    """(w,x,y,z) quaternion(s) [..., 4] -> rotation matrices [..., 3, 3]."""
    if normalize_q:
        q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotvec_to_quat(v):
    """Axis-angle vector [..., 3] -> (w,x,y,z) quaternion [..., 4].

    utils/tempo_utils.py:4-16. Safe at ||v|| -> 0 (returns identity quat with
    well-defined gradients).
    """
    # Double-where guard: sqrt/1/x at theta=0 would poison reverse-mode
    # grads even inside an unselected where-branch, so the small-angle
    # branch must never see the singular expressions.
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = sq < _EPS
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = angle / 2.0
    w = jnp.where(small, 1.0, jnp.cos(half))
    xyz = jnp.where(small, 0.5 * v, v * (jnp.sin(half) / angle))
    return jnp.concatenate([w, xyz], axis=-1)


def rotvec_to_rotmat(v):
    """Rodrigues formula: axis-angle [..., 3] -> [..., 3, 3].

    utils/tempo_utils.py:18-39. Smooth at the identity.
    """
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    small = sq < _EPS
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    k = v / angle  # unit axis for the regular branch, raw v for the small one

    def skew(u):
        ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
        zeros = jnp.zeros_like(ux)
        return jnp.stack(
            [
                jnp.stack([zeros, -uz, uy], axis=-1),
                jnp.stack([uz, zeros, -ux], axis=-1),
                jnp.stack([-uy, ux, zeros], axis=-1),
            ],
            axis=-2,
        )

    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), v.shape[:-1] + (3, 3))
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    # For unit k, K^2 = k k^T - I, so R = cos*I + sin*K + (1-cos)*k k^T.
    # (Closed form avoids a matmul that TPU would otherwise run in bf16.)
    kkT = k[..., :, None] * k[..., None, :]
    R = c * eye + s * skew(k) + (1.0 - c) * kkT
    R_small = eye + skew(v)  # first-order exponential map
    return jnp.where(small[..., None], R_small, R)


def quat_mul(q1, q2):
    """Hamilton product of (w,x,y,z) quaternions (utils/tempo_utils.py:41-49)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rigid_deform(xyz, rot, rigid_v, rigid_rotvec, rigid_rotcen, time_span,
                 mode: str = "screw"):
    """Screw-like rigid motion over a time span (utils/tempo_utils.py:51-84).

    Rotate about ``rigid_rotcen`` by axis-angle ``rigid_rotvec * t``, then
    translate by ``rigid_v * t``; the Gaussian's own orientation quaternion is
    pre-multiplied by the same rotation.

    Args:
      xyz [..., 3], rot [..., 4] (w,x,y,z), rigid_v [..., 3],
      rigid_rotvec [..., 3], rigid_rotcen [..., 3], time_span [...].
      mode: "screw" (full model), "linear" (translation only),
            "skip" (identity — unlike the reference we need no zero-mul hack
            to keep grads alive; JAX grads of unused leaves are simply zero).

    Returns (xyz', rot').
    """
    if mode == "skip":
        return xyz, rot
    t = time_span[..., None]
    if mode == "linear":
        return xyz + rigid_v * t, rot
    assert mode == "screw"
    shift = rigid_v * t
    rvec = rigid_rotvec * t
    dq = rotvec_to_quat(rvec)
    R = rotvec_to_rotmat(rvec)
    d = xyz - rigid_rotcen
    # elementwise batched matvec (tiny batched matmuls are MXU-hostile)
    xyz_new = jnp.stack(
        [R[..., i, 0] * d[..., 0] + R[..., i, 1] * d[..., 1]
         + R[..., i, 2] * d[..., 2] for i in range(3)], axis=-1)
    xyz_new = xyz_new + rigid_rotcen + shift
    rot_new = quat_mul(dq, rot)
    return xyz_new, rot_new
