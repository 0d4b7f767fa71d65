"""Unit tests for gsplat_tpu.core (SURVEY.md §4(a): pure-function tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.core import covariance as cov
from gsplat_tpu.core import quaternion as quat
from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core.camera import fov2focal, focal2fov, make_camera, ndc_to_pix
from gsplat_tpu.core.schedule import expon_lr


def test_sh_degree0_is_constant():
    shs = np.zeros((4, 16, 3), np.float32)
    shs[:, 0, :] = 1.0
    rgb = sh_lib.sh_to_rgb(0, jnp.asarray(shs), jnp.zeros((4, 3)) + 1.0,
                           jnp.zeros(3))
    np.testing.assert_allclose(rgb, sh_lib.C0 * 1.0 + 0.5, rtol=1e-6)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray([[0.1, 0.5, 0.9]])
    np.testing.assert_allclose(sh_lib.sh_to_rgb_dc(sh_lib.rgb_to_sh(rgb)), rgb,
                               rtol=1e-6)


def test_sh_clamp_at_zero():
    shs = np.zeros((1, 1, 3), np.float32)
    shs[:, 0, :] = -10.0  # drives rgb negative pre-clamp
    rgb = sh_lib.sh_to_rgb(0, jnp.asarray(shs), jnp.ones((1, 3)), jnp.zeros(3))
    assert np.all(np.asarray(rgb) == 0.0)


def test_quat_identity():
    q = jnp.asarray([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(quat.quat_to_rotmat(q)[0], np.eye(3), atol=1e-7)


def test_quat_90deg_z():
    # 90 deg about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    s = np.sin(np.pi / 4)
    q = jnp.asarray([[np.cos(np.pi / 4), 0, 0, s]], dtype=jnp.float32)
    R = np.asarray(quat.quat_to_rotmat(q)[0])
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_rotvec_quat_mat_consistency():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    R1 = quat.rotvec_to_rotmat(v)
    R2 = quat.quat_to_rotmat(quat.rotvec_to_quat(v))
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)


def test_rotvec_zero_is_identity_with_grads():
    v = jnp.zeros((2, 3))
    R = quat.rotvec_to_rotmat(v)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)),
                               atol=1e-7)
    g = jax.grad(lambda x: jnp.sum(quat.rotvec_to_rotmat(x)))(v)
    assert np.all(np.isfinite(np.asarray(g)))


def test_quat_mul_matches_matrix_product():
    rng = np.random.default_rng(1)
    q1 = quat.normalize(jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32)))
    q2 = quat.normalize(jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32)))
    R12 = quat.quat_to_rotmat(quat.quat_mul(q1, q2))
    np.testing.assert_allclose(
        np.asarray(R12),
        np.asarray(quat.quat_to_rotmat(q1) @ quat.quat_to_rotmat(q2)),
        atol=1e-5)


def test_rigid_deform_zero_motion_identity():
    rng = np.random.default_rng(2)
    xyz = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    rot = quat.normalize(jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32)))
    zeros = jnp.zeros((6, 3))
    t = jnp.ones((6,))
    x2, r2 = quat.rigid_deform(xyz, rot, zeros, zeros, zeros, t)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(xyz), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2)[:, 0], np.asarray(rot)[:, 0], atol=1e-6)


def test_rigid_deform_known_rotation():
    # Rotate a point at (1,0,0) by 90deg/unit-time about z through origin.
    xyz = jnp.asarray([[1.0, 0.0, 0.0]])
    rot = jnp.asarray([[1.0, 0, 0, 0]])
    v = jnp.zeros((1, 3))
    rotvec = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    cen = jnp.zeros((1, 3))
    x2, _ = quat.rigid_deform(xyz, rot, v, rotvec, cen, jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(x2)[0], [0.0, 1.0, 0.0], atol=1e-6)


def test_covariance_matches_direct():
    rng = np.random.default_rng(3)
    s = jnp.asarray(np.abs(rng.normal(size=(4, 3))).astype(np.float32) + 0.1)
    q = quat.normalize(jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32)))
    Sigma = np.asarray(cov.covariance_3d(s, q))
    R = np.asarray(quat.quat_to_rotmat(q))
    for i in range(4):
        S = np.diag(np.asarray(s)[i])
        expected = R[i] @ S @ S @ R[i].T
        np.testing.assert_allclose(Sigma[i], expected, atol=1e-5)
    # strip/unstrip roundtrip
    v6 = cov.strip_symmetric(jnp.asarray(Sigma))
    np.testing.assert_allclose(np.asarray(cov.unstrip_symmetric(v6)), Sigma,
                               atol=1e-7)


def test_project_cov2d_isotropic_center():
    """An isotropic Gaussian on the optical axis projects to an isotropic
    2D covariance of (f * s / z)^2 + 0.3 low-pass."""
    view = jnp.eye(4)
    z, sigma, f = 4.0, 0.2, 100.0
    cov6 = cov.covariance_6(jnp.asarray([[sigma] * 3]),
                            jnp.asarray([[1.0, 0, 0, 0]]))
    a, b, c2 = cov.project_cov2d(jnp.asarray([[0.0, 0.0, z]]), cov6, view,
                                 f, f, 1.0, 1.0)
    expected = (f * sigma / z) ** 2 + 0.3
    np.testing.assert_allclose(float(a[0]), expected, rtol=1e-5)
    np.testing.assert_allclose(float(c2[0]), expected, rtol=1e-5)
    np.testing.assert_allclose(float(b[0]), 0.0, atol=1e-6)


def test_fov_focal_roundtrip():
    assert abs(focal2fov(fov2focal(0.8, 640), 640) - 0.8) < 1e-12


def test_camera_projection_pinhole():
    """Projection through make_camera matches direct pinhole math."""
    width, height = 640, 480
    fovx, fovy = 0.9, 0.7
    cam = make_camera(np.eye(3), np.zeros(3), fovx, fovy, width, height)
    pt = np.array([0.3, -0.2, 5.0], np.float32)
    hom = np.asarray(cam.full_proj) @ np.append(pt, 1.0)
    ndc = hom[:3] / (hom[3] + 1e-7)
    x_pix = float(ndc_to_pix(ndc[0], width))
    y_pix = float(ndc_to_pix(ndc[1], height))
    fx = fov2focal(fovx, width)
    fy = fov2focal(fovy, height)
    np.testing.assert_allclose(x_pix, fx * pt[0] / pt[2] + (width - 1) / 2,
                               rtol=1e-4)
    np.testing.assert_allclose(y_pix, fy * pt[1] / pt[2] + (height - 1) / 2,
                               rtol=1e-4)
    # camera at origin looking down +z => camera center at origin
    np.testing.assert_allclose(np.asarray(cam.cam_pos), np.zeros(3), atol=1e-6)


def test_expon_lr_endpoints():
    lr0 = float(expon_lr(0, 1e-2, 1e-4, max_steps=1000))
    lr_end = float(expon_lr(1000, 1e-2, 1e-4, max_steps=1000))
    np.testing.assert_allclose(lr0, 1e-2, rtol=1e-5)
    np.testing.assert_allclose(lr_end, 1e-4, rtol=1e-5)
    assert float(expon_lr(-1, 1e-2, 1e-4)) == 0.0
    # delay easing: at step 0 with delay, lr is scaled by delay_mult
    lr_delayed = float(expon_lr(0, 1e-2, 1e-4, lr_delay_steps=100,
                                lr_delay_mult=0.01, max_steps=1000))
    np.testing.assert_allclose(lr_delayed, 1e-4, rtol=1e-5)


def test_ssim_matches_torch_reference():
    """Separable SSIM must match the reference's torch conv2d implementation
    (utils/loss_utils.py:27-67) to float precision."""
    import torch
    import torch.nn.functional as F
    from math import exp as _exp

    from gsplat_tpu.train.losses import ssim

    def torch_ssim(img1, img2, window_size=11):
        channel = img1.size(-3)
        g = torch.Tensor([_exp(-(x - window_size // 2) ** 2 / (2 * 1.5 ** 2))
                          for x in range(window_size)])
        g = (g / g.sum()).unsqueeze(1)
        w = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0).expand(
            channel, 1, window_size, window_size).contiguous()
        mu1 = F.conv2d(img1, w, padding=5, groups=channel)
        mu2 = F.conv2d(img2, w, padding=5, groups=channel)
        mu1_sq, mu2_sq, mu12 = mu1.pow(2), mu2.pow(2), mu1 * mu2
        s1 = F.conv2d(img1 * img1, w, padding=5, groups=channel) - mu1_sq
        s2 = F.conv2d(img2 * img2, w, padding=5, groups=channel) - mu2_sq
        s12 = F.conv2d(img1 * img2, w, padding=5, groups=channel) - mu12
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        return (((2 * mu12 + c1) * (2 * s12 + c2))
                / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))).mean()

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    ours = float(__import__("gsplat_tpu.train.losses", fromlist=["ssim"])
                 .ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch_ssim(torch.tensor(a).permute(2, 0, 1)[None],
                           torch.tensor(b).permute(2, 0, 1)[None]))
    assert abs(ours - ref) < 2e-6

    # channel-first input (the train steps' layout) is value-identical
    from gsplat_tpu.train.losses import ssim as _ssim

    chw = float(_ssim(jnp.asarray(a).transpose(2, 0, 1),
                      jnp.asarray(b).transpose(2, 0, 1)))
    assert abs(chw - ours) < 1e-6


def test_debug_snapshot_dump(tmp_path):
    """Non-finite loss aborts with a pickled reproducer snapshot (the
    reference debug-mode snapshot_fw.dump analogue,
    diff_gaussian_rasterization/__init__.py:83-90)."""
    import pickle

    import pytest as _pytest

    from gsplat_tpu.utils import debug as debug_lib

    # finite: no-op, no file
    debug_lib.check_finite_loss(0.5, 10, str(tmp_path), params={"x": 1})
    assert not (tmp_path / "snapshot_fw.dump").exists()

    arr = jnp.arange(4.0)
    with _pytest.raises(RuntimeError, match="snapshot"):
        debug_lib.check_finite_loss(
            float("nan"), 20, str(tmp_path),
            params={"xyz": arr}, key=jax.random.PRNGKey(0))
    snap = pickle.loads((tmp_path / "snapshot_fw.dump").read_bytes())
    assert snap["iteration"] == 20
    np.testing.assert_array_equal(snap["params"]["xyz"], np.arange(4.0))
