"""COLMAP binary-format interop against the REFERENCE's own parser.

Writes COLMAP binary model files with gsplat_tpu's test writers and parses
them with the reference's scene/colmap_loader.py (pure numpy/struct,
executed from /root/reference) — our binary layout must be exactly what
the reference (and COLMAP itself) reads, including the per-image 2D point
payloads and quaternion conventions. Also pins qvec2rotmat/rotmat2qvec
against the executed reference math. Skipped without the checkout."""

import importlib.util
import os

import numpy as np
import pytest

REF_LOADER = "/root/reference/scene/colmap_loader.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_LOADER), reason="reference checkout not present")


def _ref():
    spec = importlib.util.spec_from_file_location("ref_colmap_loader",
                                                  REF_LOADER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_qvec_rotmat_matches_reference():
    ref = _ref()
    from gsplat_tpu.data.colmap import qvec2rotmat, rotmat2qvec

    rng = np.random.default_rng(1)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R_ref = ref.qvec2rotmat(q)
        R_got = qvec2rotmat(q)
        np.testing.assert_allclose(R_got, R_ref, atol=1e-12)
        q_ref = ref.rotmat2qvec(R_ref)
        q_got = rotmat2qvec(R_got)
        # both return a unit quaternion up to sign
        s = np.sign(np.dot(q_ref, q_got)) or 1.0
        np.testing.assert_allclose(q_got, s * q_ref, atol=1e-9)


def test_binary_model_readable_by_reference_parser(tmp_path):
    ref = _ref()
    from gsplat_tpu.data import colmap

    rng = np.random.default_rng(6)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                   np.array([520.0, 510.0, 320.0, 240.0]))}
    imgs = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        imgs[i] = colmap.ColmapImage(i, q, rng.normal(size=3), 1,
                                     f"frame_{i:04d}.png")
    xyz = rng.normal(size=(50, 3))
    rgb = rng.integers(0, 255, size=(50, 3)).astype(np.uint8)

    colmap.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    colmap.write_images_binary(str(tmp_path / "images.bin"), imgs)
    colmap.write_points3d_binary(str(tmp_path / "points3D.bin"), xyz, rgb)

    ref_cams = ref.read_intrinsics_binary(str(tmp_path / "cameras.bin"))
    assert set(ref_cams) == {1}
    assert ref_cams[1].model == "PINHOLE"
    assert (ref_cams[1].width, ref_cams[1].height) == (640, 480)
    np.testing.assert_allclose(ref_cams[1].params, cams[1].params)

    ref_imgs = ref.read_extrinsics_binary(str(tmp_path / "images.bin"))
    assert set(ref_imgs) == {1, 2, 3}
    for i in ref_imgs:
        np.testing.assert_allclose(ref_imgs[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(ref_imgs[i].tvec, imgs[i].tvec)
        assert ref_imgs[i].camera_id == 1
        assert ref_imgs[i].name == imgs[i].name

    ref_xyz, ref_rgb, ref_err = ref.read_points3D_binary(
        str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(ref_xyz, xyz)
    np.testing.assert_array_equal(ref_rgb, rgb)

    # and our own readers (incl. the native gsio fast path) agree
    got_imgs = colmap.read_images_binary(str(tmp_path / "images.bin"))
    for i in got_imgs:
        np.testing.assert_allclose(got_imgs[i].qvec, ref_imgs[i].qvec)
    got_xyz, got_rgb, _ = colmap.read_points3d_binary(
        str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(got_xyz, ref_xyz)
