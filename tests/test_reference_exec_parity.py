"""Parity by EXECUTION against the reference's own pure-Python modules.

These tests import the reference's utils/arguments modules from
/root/reference (torch-cpu / argparse only — no CUDA extensions) and run
them on the same inputs as gsplat_tpu's equivalents. Unlike transliterated
oracles, the reference code itself produces the expected values, so a
misreading of its semantics cannot leak into the expectation. Skipped
without the reference checkout.
"""

import importlib.util
import math
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "utils")),
    reason="reference checkout not present")


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- graphics


def test_world_to_view_matches_reference():
    gu = _load("utils/graphics_utils.py", "ref_graphics_utils")
    from gsplat_tpu.core.camera import world_to_view

    rng = np.random.default_rng(0)
    a = rng.normal(size=(3,))
    th = np.linalg.norm(a)
    k = a / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
    t = rng.normal(size=(3,))
    translate = rng.normal(size=(3,))
    scale = 1.7

    # the reference stores R TRANSPOSED in CameraInfo (colmap_loader
    # convention) and getWorld2View2 transposes it back
    ref = gu.getWorld2View2(R, t, translate, scale)
    got = world_to_view(R, t, translate=translate, scale=scale)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_projection_matrix_matches_reference():
    import torch

    gu = _load("utils/graphics_utils.py", "ref_graphics_utils")
    from gsplat_tpu.core.camera import projection_matrix

    for fovx, fovy in [(0.9, 0.7), (1.4, 1.2)]:
        ref = gu.getProjectionMatrix(znear=0.01, zfar=100.0, fovX=fovx,
                                     fovY=fovy).numpy()
        got = projection_matrix(0.01, 100.0, fovx, fovy)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_projection_matrix_shift_matches_reference():
    gu = _load("utils/graphics_utils.py", "ref_graphics_utils")
    from gsplat_tpu.core.camera import projection_matrix

    w, h = 640, 480
    fovx, fovy = 0.9, 0.7
    focal_x = gu.fov2focal(fovx, w)
    focal_y = gu.fov2focal(fovy, h)
    cx, cy = w / 2 + 13.0, h / 2 - 7.5  # shifted principal point
    ref = gu.getProjectionMatrixShift(0.01, 100.0, fovx, fovy, focal_x,
                                      focal_y, cx, cy, w, h).numpy()
    got = projection_matrix(0.01, 100.0, fovx, fovy,
                            cx_offset=cx, cy_offset=cy,
                            width=w, height=h,
                            focal_x=focal_x, focal_y=focal_y)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_fov_focal_roundtrip_matches_reference():
    gu = _load("utils/graphics_utils.py", "ref_graphics_utils")
    from gsplat_tpu.core.camera import focal2fov, fov2focal

    assert fov2focal(0.9, 640) == pytest.approx(gu.fov2focal(0.9, 640))
    assert focal2fov(500.0, 480) == pytest.approx(gu.focal2fov(500.0, 480))


# ----------------------------------------------------------------- general


def test_expon_lr_matches_reference():
    gnu = _load("utils/general_utils.py", "ref_general_utils")
    from gsplat_tpu.core.schedule import expon_lr

    ref_fn = gnu.get_expon_lr_func(
        lr_init=1.6e-4, lr_final=1.6e-6, lr_delay_mult=0.01,
        lr_delay_steps=500, max_steps=30_000)
    for step in [0, 1, 100, 499, 500, 2_000, 15_000, 30_000, 31_000]:
        got = float(expon_lr(jnp.asarray(float(step)), 1.6e-4, 1.6e-6,
                             lr_delay_steps=500, lr_delay_mult=0.01,
                             max_steps=30_000))
        assert got == pytest.approx(ref_fn(step), rel=1e-6), step


class _CpuZeros:
    """The reference helpers hardcode device='cuda' in torch.zeros
    (general_utils.py:65,83,102); run them on CPU by dropping the kwarg."""

    def __enter__(self):
        import torch

        self._orig = torch.zeros
        def zeros(*a, **kw):
            kw.pop("device", None)
            return self._orig(*a, **kw)
        torch.zeros = zeros
        return self

    def __exit__(self, *exc):
        import torch

        torch.zeros = self._orig


def test_build_rotation_and_covariance_match_reference():
    import torch

    gnu = _load("utils/general_utils.py", "ref_general_utils")
    from gsplat_tpu.core.covariance import (build_scaling_rotation,
                                            covariance_6, strip_symmetric,
                                            unstrip_symmetric)
    from gsplat_tpu.core.quaternion import quat_to_rotmat

    rng = np.random.default_rng(4)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    s = np.exp(rng.normal(size=(32, 3))).astype(np.float32)

    # reference build_rotation normalizes internally; ours does too
    with _CpuZeros():
        ref_R = gnu.build_rotation(torch.from_numpy(q)).numpy()
        ref_L = gnu.build_scaling_rotation(torch.from_numpy(s),
                                           torch.from_numpy(q)).numpy()
        # actual covariance: L L^T then strip, exactly like
        # gaussian_model_static.py:36-41
        ref_cov = ref_L @ np.transpose(ref_L, (0, 2, 1))
        ref_strip = gnu.strip_symmetric(torch.from_numpy(ref_cov)).numpy()
    got_R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(got_R, ref_R, atol=2e-6)

    got_L = np.asarray(build_scaling_rotation(jnp.asarray(s),
                                              jnp.asarray(q)))
    np.testing.assert_allclose(got_L, ref_L, atol=2e-5)
    got_cov6 = np.asarray(covariance_6(jnp.asarray(s), jnp.asarray(q)))
    np.testing.assert_allclose(got_cov6, ref_strip, rtol=2e-4, atol=2e-4)

    # strip/unstrip roundtrip agrees with the reference's element order
    np.testing.assert_allclose(
        np.asarray(strip_symmetric(unstrip_symmetric(jnp.asarray(got_cov6)))),
        got_cov6, atol=0)


def test_inverse_sigmoid_matches_reference():
    import torch

    gnu = _load("utils/general_utils.py", "ref_general_utils")
    from gsplat_tpu.model.gaussians import inverse_sigmoid

    x = np.linspace(0.01, 0.99, 23).astype(np.float32)
    ref = gnu.inverse_sigmoid(torch.from_numpy(x)).numpy()
    got = np.asarray(inverse_sigmoid(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ---------------------------------------------------------------------- SH


def test_eval_sh_matches_reference_execution():
    import torch

    shu = _load("utils/sh_utils.py", "ref_sh_utils")
    from gsplat_tpu.core.sh import eval_sh, rgb_to_sh, sh_to_rgb_dc

    rng = np.random.default_rng(8)
    for deg in range(4):
        k = (deg + 1) ** 2
        sh = rng.normal(size=(40, 3, k)).astype(np.float32)
        dirs = rng.normal(size=(40, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        ref = shu.eval_sh(deg, torch.from_numpy(sh),
                          torch.from_numpy(dirs)).numpy()
        got = np.asarray(eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs)))
        np.testing.assert_allclose(got, ref, atol=3e-6, err_msg=f"deg{deg}")

    rgb = rng.uniform(0, 1, size=(16, 3)).astype(np.float32)
    ref_sh = shu.RGB2SH(torch.from_numpy(rgb)).numpy()
    np.testing.assert_allclose(np.asarray(rgb_to_sh(jnp.asarray(rgb))),
                               ref_sh, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh_to_rgb_dc(jnp.asarray(ref_sh))), rgb, atol=1e-6)


# ------------------------------------------------------------------ images


def test_psnr_matches_reference():
    import torch

    iu = _load("utils/image_utils.py", "ref_image_utils")
    from gsplat_tpu.train import losses

    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, size=(3, 24, 32)).astype(np.float32)
    b = rng.uniform(0, 1, size=(3, 24, 32)).astype(np.float32)
    # trainer semantics: [3, H, W] -> mean of per-channel PSNRs
    # (train_static.py:197 calls psnr(image, gt).mean() on CHW images)
    ref = float(iu.psnr(torch.from_numpy(a), torch.from_numpy(b)).mean())
    got = float(losses.psnr(jnp.asarray(a), jnp.asarray(b), channel_axis=0))
    assert got == pytest.approx(ref, rel=1e-5)
    # metrics semantics: [1, 3, H, W] -> whole-image PSNR (metrics.py)
    ref_w = float(iu.psnr(torch.from_numpy(a[None]),
                          torch.from_numpy(b[None])).mean())
    got_w = float(losses.psnr(jnp.asarray(a), jnp.asarray(b)))
    assert got_w == pytest.approx(ref_w, rel=1e-5)
    ref_mse = float(iu.mse(torch.from_numpy(a), torch.from_numpy(b)).mean())
    got_mse = float(losses.mse(jnp.asarray(a), jnp.asarray(b)))
    assert got_mse == pytest.approx(ref_mse, rel=1e-5)


# ----------------------------------------------------------------- configs


def test_config_defaults_match_reference_argparse():
    """Execute the reference's reflective argparse groups and diff every
    default against our dataclasses (ModelConfig / OptimizationConfig /
    PipelineConfig). Documented intentional deviations are excluded."""
    from argparse import ArgumentParser

    args_mod = _load("arguments/__init__.py", "ref_arguments")
    from gsplat_tpu.train.config import (ModelConfig, OptimizationConfig,
                                         PipelineConfig)

    parser = ArgumentParser()
    groups = {
        "model": args_mod.ModelParams(parser),
        "pipe": args_mod.PipelineParams(parser),
        "opt": args_mod.OptimizationParams(parser),
    }
    ns = parser.parse_args([])
    ref_vals = {
        name: vars(grp.extract(ns)) for name, grp in groups.items()
    }

    ours = {"model": ModelConfig(), "pipe": PipelineConfig(),
            "opt": OptimizationConfig()}
    skip = {
        # torch device string; ours is TPU-resident by construction
        ("model", "data_device"),
        # abspath'd by extract(); both default to ""
        ("model", "source_path"),
    }
    import dataclasses

    for name in ref_vals:
        our_fields = {f.name for f in dataclasses.fields(ours[name])}
        for key, ref_default in ref_vals[name].items():
            if (name, key) in skip:
                continue
            assert key in our_fields, f"{name}.{key} missing from our config"
            got = getattr(ours[name], key)
            assert got == ref_default, (
                f"{name}.{key}: ours={got!r} reference={ref_default!r}")


# ----------------------------------------------------------------- cameras


def test_loadcam_resolution_and_matrices_match_reference(tmp_path):
    """Execute the reference's loadCam (scene/cameras.py Camera + the
    camera_utils resolution policy) on PIL images of awkward sizes and
    compare the resulting image resolution AND the camera tensors
    (world_view_transform / full_proj_transform / camera_center) against
    our LazyCamera load. Catches truncation-vs-rounding drift (the
    reference ROUNDS for -r in {1,2,4,8} but TRUNCATES otherwise)."""
    import types

    from PIL import Image

    # scene/__init__.py needs plyfile (absent); register scene.cameras
    # standalone so camera_utils' ``from scene.cameras import Camera``
    # resolves without importing the package initializer
    sys.path.insert(0, REF_ROOT)
    try:
        pkg = types.ModuleType("scene")
        pkg.__path__ = [os.path.join(REF_ROOT, "scene")]
        sys.modules.setdefault("scene", pkg)
        spec = importlib.util.spec_from_file_location(
            "scene.cameras", os.path.join(REF_ROOT, "scene", "cameras.py"))
        cams_mod = importlib.util.module_from_spec(spec)
        sys.modules["scene.cameras"] = cams_mod
        spec.loader.exec_module(cams_mod)
        ref_cu = _load("utils/camera_utils.py", "ref_camera_utils")
    finally:
        sys.path.remove(REF_ROOT)

    from gsplat_tpu.data.cameras import CameraInfo, LazyCamera

    rng = np.random.default_rng(0)
    R = np.eye(3)
    T = np.array([0.1, -0.2, 3.0])
    fovx, fovy = 0.9, 0.7

    for (ow, oh), res, rs, rgba in [((1003, 755), 2, 1.0, False),
                                    ((1003, 755), 4, 2.0, False),
                                    ((1700, 900), -1, 1.0, False),
                                    ((642, 480), 321, 1.0, False),
                                    ((642, 481), 1, 1.0, True)]:
        img_path = str(tmp_path / f"im_{ow}x{oh}_{res}_{rs}.png")
        ch = 4 if rgba else 3
        arr = rng.integers(0, 255, size=(oh, ow, ch)).astype(np.uint8)
        Image.fromarray(arr, "RGBA" if rgba else "RGB").save(img_path)

        ref_info = types.SimpleNamespace(
            uid=0, R=R, T=T, FovX=fovx, FovY=fovy,
            image=Image.open(img_path), image_name="im", extra_para=None)
        ref_args = types.SimpleNamespace(resolution=res, data_device="cpu")
        # Camera hardcodes .cuda() on its matrices (scene/cameras.py:63-70)
        import torch

        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            ref_cam = ref_cu.loadCam(ref_args, 0, ref_info, rs)
        finally:
            torch.Tensor.cuda = orig_cuda

        info = CameraInfo(uid=0, R=R, T=T, fovx=fovx, fovy=fovy,
                          image_path=img_path, image_name="im",
                          width=ow, height=oh)
        cam, img = LazyCamera(info, resolution_scale=rs,
                              args_resolution=res).load()

        assert (ref_cam.image_width, ref_cam.image_height) == \
            (cam.width, cam.height), (ow, oh, res, rs)
        assert img.shape[:2] == (cam.height, cam.width)
        # pixel-exact GT (same PIL resize). RGBA: the reference's
        # alpha-mask branch NEVER fires — loadCam tests
        # ``resized_image_rgb.shape[1] == 4`` (camera_utils.py:46), which
        # is the HEIGHT after the CHW permute, an upstream bug — so its
        # Camera keeps raw RGB. We implement the INTENDED gt_alpha_mask
        # premultiply (scene/cameras.py:51-52); assert both facts.
        ref_px = ref_cam.original_image.numpy()
        if rgba:
            with Image.open(img_path) as im_chk:
                alpha = (np.asarray(im_chk.convert("RGBA"))[:, :, 3:4]
                         .astype(np.float32) / 255.0)
            np.testing.assert_allclose(
                img, ref_px.transpose(1, 2, 0) * alpha, atol=1e-6)
        else:
            np.testing.assert_allclose(
                img.transpose(2, 0, 1), ref_px, atol=1e-6,
                err_msg=str((ow, oh, res, rs)))

        # camera tensors: reference stores the math matrices TRANSPOSED
        np.testing.assert_allclose(
            np.asarray(cam.view).T, ref_cam.world_view_transform.numpy(),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cam.full_proj).T,
            ref_cam.full_proj_transform.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(cam.cam_pos), ref_cam.camera_center.numpy(),
            atol=1e-5)


# ------------------------------------------------------------------- SSIM


def test_ssim_l1_match_reference_execution():
    """Execute the reference's own ssim/l1_loss (loss_utils.py — the exact
    windowed-SSIM every training loss uses; open3d is stubbed, it is only
    needed by the unrelated ARAP KNN helper)."""
    import types as _types

    import torch

    sys.modules.setdefault("open3d", _types.ModuleType("open3d"))
    lu = _load("utils/loss_utils.py", "ref_loss_utils")
    from gsplat_tpu.train import losses

    rng = np.random.default_rng(12)
    a = rng.uniform(0, 1, size=(3, 40, 56)).astype(np.float32)
    # correlated pair (SSIM is trivial at 1.0 or ~0 otherwise)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)

    ref_ssim = float(lu.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    got_ssim = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert got_ssim == pytest.approx(ref_ssim, abs=2e-6)
    assert 0.2 < ref_ssim < 0.999

    ref_l1 = float(lu.l1_loss(torch.from_numpy(a), torch.from_numpy(b)))
    got_l1 = float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b)))
    assert got_l1 == pytest.approx(ref_l1, rel=1e-6)
