"""Data-stack tests with synthetic on-disk fixtures: PLY roundtrip, COLMAP
binary/text parsing, Blender reader, SwinGS layout, scene containers."""

import json
import os

import numpy as np
import pytest

from gsplat_tpu.data import colmap, ply
from gsplat_tpu.data.readers import (detect_scene_type, nerfpp_norm,
                                     read_blender_scene, read_colmap_scene,
                                     read_dynamic_scene)
from gsplat_tpu.data.scene import DynamicScene, Scene
from gsplat_tpu.model import gaussians


def test_ply_point_cloud_roundtrip(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    rgb255 = np.random.default_rng(1).integers(0, 255, size=(10, 3))
    p = str(tmp_path / "pc.ply")
    ply.store_point_cloud(p, xyz, rgb255)
    xyz2, rgb2, normals = ply.fetch_point_cloud(p)
    np.testing.assert_allclose(xyz2, xyz, rtol=1e-6)
    np.testing.assert_allclose(rgb2 * 255, rgb255, atol=0.5)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    st = gaussians.create_from_points(
        rng.normal(size=(12, 3)).astype(np.float32),
        rng.uniform(0, 1, size=(12, 3)).astype(np.float32),
        capacity=32, max_sh_degree=2)
    p = str(tmp_path / "model.ply")
    gaussians.save_ply(st, p)
    st2 = gaussians.load_ply(p, capacity=32, max_sh_degree=2)
    assert int(st2.n_alive) == 12
    for name in ["xyz", "features_dc", "features_rest", "opacity", "scaling",
                 "rotation"]:
        np.testing.assert_allclose(
            np.asarray(getattr(st, name))[:12],
            np.asarray(getattr(st2, name))[:12], rtol=1e-6,
            err_msg=f"mismatch in {name}")


def test_colmap_binary_roundtrip(tmp_path):
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                   np.array([500.0, 480.0, 320.0, 240.0]))}
    q = np.array([0.9848, 0.0, 0.1736, 0.0])
    imgs = {1: colmap.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1,
                                  "img_001.png")}
    xyz = np.random.default_rng(0).normal(size=(7, 3))
    rgb = np.random.default_rng(1).integers(0, 255, size=(7, 3)).astype(np.uint8)

    colmap.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    colmap.write_images_binary(str(tmp_path / "images.bin"), imgs)
    colmap.write_points3d_binary(str(tmp_path / "points3D.bin"), xyz, rgb)

    cams2 = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
    imgs2 = colmap.read_images_binary(str(tmp_path / "images.bin"))
    xyz2, rgb2, _ = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))

    assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    assert imgs2[1].name == "img_001.png"
    np.testing.assert_allclose(imgs2[1].qvec, q)
    np.testing.assert_allclose(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(3)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)


def _write_png(path, h=8, w=8, alpha=False):
    from PIL import Image

    rng = np.random.default_rng(0)
    channels = 4 if alpha else 3
    arr = rng.integers(0, 255, size=(h, w, channels)).astype(np.uint8)
    Image.fromarray(arr, "RGBA" if alpha else "RGB").save(path)


def _make_blender_fixture(root, n_cams=3):
    os.makedirs(root / "train", exist_ok=True)
    os.makedirs(root / "test", exist_ok=True)
    frames_tr, frames_te = [], []
    for i in range(n_cams):
        c2w = np.eye(4)
        c2w[2, 3] = -(3.0 + i)
        _write_png(root / "train" / f"r_{i}.png", alpha=True)
        _write_png(root / "test" / f"r_{i}.png", alpha=True)
        frames_tr.append({"file_path": f"train/r_{i}",
                          "transform_matrix": c2w.tolist()})
        frames_te.append({"file_path": f"test/r_{i}",
                          "transform_matrix": c2w.tolist()})
    for name, frames in [("transforms_train.json", frames_tr),
                         ("transforms_test.json", frames_te)]:
        with open(root / name, "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)


def test_blender_reader(tmp_path):
    _make_blender_fixture(tmp_path)
    assert detect_scene_type(str(tmp_path)) == "Blender"
    info = read_blender_scene(str(tmp_path), num_pts=50)
    assert len(info.train_cameras) == 3 and len(info.test_cameras) == 3
    assert info.points.shape == (50, 3)
    assert info.radius > 0
    # image decoded and alpha-baked over background
    img = info.train_cameras[0].image
    assert img.shape == (8, 8, 3) and img.dtype == np.float32


def test_colmap_reader(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    os.makedirs(tmp_path / "images")
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 16, 12,
                                   np.array([20.0, 20.0, 8.0, 6.0]))}
    imgs = {}
    for i in range(4):
        q = np.array([1.0, 0, 0, 0])
        imgs[i + 1] = colmap.ColmapImage(i + 1, q,
                                         np.array([0.0, 0.0, 3.0 + i]), 1,
                                         f"im_{i}.png")
        _write_png(tmp_path / "images" / f"im_{i}.png", h=12, w=16)
    colmap.write_cameras_binary(str(sparse / "cameras.bin"), cams)
    colmap.write_images_binary(str(sparse / "images.bin"), imgs)
    colmap.write_points3d_binary(
        str(sparse / "points3D.bin"),
        np.random.default_rng(0).normal(size=(9, 3)),
        np.full((9, 3), 128, np.uint8))

    assert detect_scene_type(str(tmp_path)) == "Colmap"
    info = read_colmap_scene(str(tmp_path), init_type="sfm")
    assert len(info.train_cameras) == 3 and len(info.test_cameras) == 1
    assert info.points.shape == (9, 3)

    scene = Scene(str(tmp_path), str(tmp_path / "out"), init_type="sfm")
    cam, img = scene.train_cameras[0].load()
    assert img.shape == (12, 16, 3)
    assert cam.width == 16 and cam.height == 12
    assert os.path.exists(tmp_path / "out" / "cameras.json")

    # Multi-scale camera sets (reference scene/__init__.py:31,74-80): each
    # requested scale gets its own LazyCamera list, scale multiplying the
    # resolution divisor.
    ms = Scene(str(tmp_path), "", init_type="sfm", shuffle=False,
               resolution_scales=[1.0, 2.0])
    cam1, img1 = ms.get_train_cameras(1.0)[0].load()
    cam2, img2 = ms.get_train_cameras(2.0)[0].load()
    assert img1.shape == (12, 16, 3)
    assert img2.shape == (6, 8, 3)
    assert cam2.width == 8 and cam2.height == 6
    assert ms.train_cameras is ms.get_train_cameras(1.0)
    assert len(ms.get_test_cameras(2.0)) == len(ms.get_test_cameras(1.0))


def _make_swings_fixture(root, n_cams=3, n_frames=4):
    cam_json = {}
    for i in range(n_cams):
        cam_json[f"camera_{i:02d}.png"] = {
            "extrinsic": {"SO3": np.eye(3).tolist(),
                          "T": [0.0, 0.0, 2.0 + i]},
            "intrinsic": {"width": 16, "height": 12,
                          "matrix": [[20.0, 0, 8.0], [0, 20.0, 6.0],
                                     [0, 0, 1]]},
        }
    with open(root / "cam.json", "w") as f:
        json.dump(cam_json, f)
    for t in range(n_frames):
        d = root / "images_per_frame" / str(t)
        os.makedirs(d)
        for i in range(n_cams):
            _write_png(d / f"camera_{i:02d}.png", h=12, w=16)


def test_swings_reader_and_dynamic_scene(tmp_path):
    _make_swings_fixture(tmp_path)
    assert detect_scene_type(str(tmp_path)) == "SwinGS"
    info = read_dynamic_scene(str(tmp_path), max_frame=4, num_pts=20)
    assert len(info.train_cam_at) == 4
    assert len(info.train_cam_at[0]) == 2  # 3 cams, every-3rd... llffhold=8
    assert len(info.test_cam_at[0]) == 1

    scene = DynamicScene(str(tmp_path), str(tmp_path / "out"), max_frame=4,
                         num_pts=20, max_in_memory=2)
    cams = scene.get_train_cams_at([0, 1])
    assert all(c.loaded for c in cams)
    scene.get_train_cams_at([2])  # evicts frame 0 (LRU, limit 2)
    assert not scene.train_cam_at[0][0].loaded
    assert scene.train_cam_at[1][0].loaded
    scene.unload_all()
    assert not scene.train_cam_at[2][0].loaded


def test_swings_reader_min_frame(tmp_path):
    """min_frame loads + REBASES frames (reference scene/__init__.py:167-168,
    camera_utils.py:92): frames min..max-1 come back as 0..span-1 with image
    paths still pointing at the on-disk frame directories."""
    _make_swings_fixture(tmp_path, n_cams=3, n_frames=6)
    info = read_dynamic_scene(str(tmp_path), min_frame=2, max_frame=6,
                              num_pts=20)
    assert len(info.train_cam_at) == 4
    for t, cams in enumerate(info.train_cam_at):
        for c in cams:
            assert c.frame == t  # rebased
            assert f"/{t + 2}/" in c.image_path  # on-disk frame number
    from gsplat_tpu.data.scene import DynamicScene

    scene = DynamicScene(str(tmp_path), "", min_frame=2, max_frame=6,
                         shuffle=False)
    assert scene.num_frames == 4
    cams = scene.get_train_cams_at([0])
    cam, img = cams[0].load()
    assert img.shape[2] == 3


def test_camera_prefetcher(tmp_path):
    """Background prefetch (data/prefetch.py): scheduled frames load off
    the main thread, activation waits on in-flight loads, eviction never
    races a pending load into a leak, and unload_all frees frames that
    were prefetched but never activated."""
    import threading
    import time as _time

    from gsplat_tpu.data.prefetch import CameraPrefetcher

    class SlowCam:
        def __init__(self):
            self.loads = 0
            self.loaded = False
            self.loader_thread = None

        def load(self):
            _time.sleep(0.05)
            self.loads += 1
            self.loaded = True
            self.loader_thread = threading.current_thread().name
            return None, None

        def unload(self):
            self.loaded = False

    pf = CameraPrefetcher(max_workers=2)
    cams = [SlowCam() for _ in range(3)]
    assert pf.schedule("f0", cams) == 3
    assert pf.schedule("f0", cams) == 0  # pending key: no resubmission
    pf.wait("f0")
    assert all(c.loaded for c in cams)
    assert all(c.loader_thread.startswith("cam-prefetch")
               for c in cams)
    assert pf.schedule("f0", cams) == 0  # all loaded: nothing to submit
    pf.wait("never-scheduled")  # no-op
    pf.shutdown()

    # end-to-end through DynamicScene: prefetched frames are already
    # resident at activation time and get freed by unload_all
    _make_swings_fixture(tmp_path)
    scene = DynamicScene(str(tmp_path), "", max_frame=4, num_pts=20,
                         max_in_memory=2, prefetch_workers=2)
    scene.prefetch_train_frames([0, 1, 99])  # out-of-range is ignored
    scene._prefetcher.drain()
    assert scene.train_cam_at[0][0].loaded  # resident before activation
    cams = scene.get_train_cams_at([0, 1])
    assert all(c.loaded for c in cams)
    scene.prefetch_train_frames([3])  # prefetched, never activated
    scene.get_train_cams_at([2])  # evicts frame 0
    assert not scene.train_cam_at[0][0].loaded
    scene.unload_all()
    assert not scene.train_cam_at[3][0].loaded  # freed despite no activate
