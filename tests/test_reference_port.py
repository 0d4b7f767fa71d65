"""Cross-check gsplat_tpu against the independent CUDA-port oracle.

tests/reference_port.py is a numpy transliteration of the reference CUDA
forward pass written FROM the CUDA source — these tests would fail if
raster/naive.py and the fast path shared a misinterpretation of the
reference semantics (VERDICT r2 missing #1).

Tile-size note: the reference's 3-sigma rect TRUNCATES real contributions
(outside the rect a Gaussian can still have alpha up to ~opa*exp(-4.5) ~
0.011 >= 1/255), so per-pixel list membership is part of the semantics and
depends on the tile grid. Comparisons therefore run the fast path at the
reference's 16x16 BLOCK size (config.h:16-17), where membership — and hence
the image — must match exactly. At coarser production tiles the fast path
composites a superset (strictly less tail truncation, never less).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.core.quaternion import normalize
from gsplat_tpu.raster import project
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize

try:
    import reference_port as refp  # pytest inserts tests/ on sys.path
except ImportError:  # running from the repo root
    from tests import reference_port as refp

WIDTH, HEIGHT = 64, 48
SH_DEGREE = 3
BG = np.asarray([0.15, 0.25, 0.35], np.float32)

SETTINGS = RasterizeSettings(k_dup=1 << 14, tile_x=16, tile_y=16,
                             chunk=128, interpret=True)


def cam_arrays(cam):
    """CUDA-side flat buffers: the torch tensors are the math matrices
    stored transposed (column-major flat), see
    scene/cameras.py:57-72 / diff_gaussian_rasterization/__init__.py:187."""
    view_flat = np.asarray(cam.view, np.float32).T.flatten()
    proj_flat = np.asarray(cam.full_proj, np.float32).T.flatten()
    campos = np.asarray(cam.cam_pos, np.float32)
    return view_flat, proj_flat, campos


def make_scene(p=160, seed=0, opa_logit_hi=6.0, stack=0):
    """Random scene; ``stack`` adds near-opaque Gaussians piled on one spot
    (exercises the 0.99 alpha clamp and the T<1e-4 stop rule) and two
    far-off-axis Gaussians (exercises the 1.3*tanfov t.xy clamp)."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.2, 1.2, size=(p, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2.0, 6.0, size=p)
    scales = np.exp(rng.uniform(-3.5, -1.5, size=(p, 3))).astype(np.float32)
    quats = rng.normal(size=(p, 4)).astype(np.float32)
    opa = 1.0 / (1.0 + np.exp(-rng.uniform(-2.0, opa_logit_hi, size=p)
                              .astype(np.float32)))
    shs = (0.3 * rng.normal(size=(p, (SH_DEGREE + 1) ** 2, 3))
           ).astype(np.float32)
    shs[:, 0, :] += 1.0
    if stack:
        means[:stack] = (np.array([0.1, 0.05, 3.0], np.float32)
                         + 0.02 * rng.normal(size=(stack, 3))
                         .astype(np.float32))
        opa[:stack] = 0.998  # alpha hits the 0.99 clamp at the center
        scales[:stack] = 0.08
    # off-axis means beyond the 1.3*tanfov frustum guard band
    means[p - 2] = [8.0, 0.3, 2.5]
    means[p - 1] = [-0.2, 7.0, 2.6]
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return means, scales, quats, opa, shs


def run_oracle(scene, cam, bg=BG):
    view_flat, proj_flat, campos = cam_arrays(cam)
    means, scales, quats, opa, shs = scene
    return refp.render_full(
        means, scales, quats, opa, shs, SH_DEGREE, view_flat, proj_flat,
        campos, cam.width, cam.height, float(cam.tan_fovx),
        float(cam.tan_fovy), bg, block_x=16, block_y=16)


def run_fast(scene, cam, bg=BG):
    means, scales, quats, opa, shs = map(jnp.asarray, scene)
    return rasterize(means, scales, quats, opa, shs, cam, SH_DEGREE,
                     jnp.asarray(bg), SETTINGS)


@pytest.fixture(scope="module")
def cam():
    return make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, WIDTH, HEIGHT)


@pytest.fixture(scope="module")
def scene():
    return make_scene(p=160, seed=3, stack=40)


@pytest.fixture(scope="module")
def oracle(scene, cam):
    return run_oracle(scene, cam)


def test_preprocess_matches_cuda_port(scene, cam, oracle):
    means, scales, quats, opa, shs = map(jnp.asarray, scene)
    proc = project.preprocess(means, scales, quats, opa, shs, cam, SH_DEGREE)
    pre = oracle["pre"]
    vis_ref = pre["radii"] > 0
    vis = np.asarray(proc.visible)
    # radii: identical up to f32 rounding at a ceil boundary
    r_ref = pre["radii"]
    r_got = np.asarray(proc.radius)
    # (repo zeroes radius only with the rect-empty rule applied in binning;
    #  at preprocess level compare where the oracle kept the gaussian)
    assert np.all(np.abs(r_got[vis_ref] - r_ref[vis_ref]) <= 1)
    assert np.mean(r_got[vis_ref] == r_ref[vis_ref]) > 0.98
    np.testing.assert_allclose(np.asarray(proc.xy)[vis_ref],
                               pre["xy"][vis_ref], atol=2e-3)
    np.testing.assert_allclose(np.asarray(proc.depth)[vis_ref],
                               pre["depths"][vis_ref], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(proc.conic)[vis_ref],
                               pre["conic_opacity"][vis_ref, :3],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(proc.rgb)[vis_ref],
                               pre["rgb"][vis_ref], rtol=1e-4, atol=2e-5)
    # the fast path may cull a superset only via det==0/z-cull, which the
    # oracle also applies: visibility must agree wherever the oracle kept
    # a non-empty rect
    assert np.all(vis[vis_ref])


def test_forward_image_matches_cuda_port(scene, cam, oracle):
    out = run_fast(scene, cam)
    got = np.asarray(out.image)
    ref = np.transpose(oracle["color"], (1, 2, 0))
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), oracle["final_t"],
                               atol=5e-5, rtol=1e-4)


def test_saturation_and_clamp_edge_cases(cam):
    """Dense near-opaque stack: the 0.99 clamp fires, pixels hit the
    T*(1-alpha) < 1e-4 stop rule, and the frozen final_T must match the
    CUDA drop-the-violator semantics (forward.cu:347-352)."""
    scene = make_scene(p=120, seed=7, stack=90)
    oracle = run_oracle(scene, cam)
    # the stop rule must actually trigger for this to test anything
    assert (oracle["final_t"] < 2e-4).sum() > 30
    out = run_fast(scene, cam)
    np.testing.assert_allclose(np.asarray(out.image),
                               np.transpose(oracle["color"], (1, 2, 0)),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.final_t), oracle["final_t"],
                               atol=5e-5, rtol=1e-4)


def test_det_zero_culled_identically():
    """cov2d with det == 0.0 exactly (via cov3d_precomp crafted so the
    +0.3 low-pass cancels): both implementations must cull
    (forward.cu:258-260 early return)."""
    w = h = 32
    fov = 2.0 * np.arctan(w / 2.0)  # focal_x = focal_y = 1.0
    cam = make_camera(np.eye(3), np.zeros(3), fov, fov, w, h)
    means = np.array([[0.0, 0.0, 1.0], [0.3, 0.1, 1.5]], np.float32)
    cov6 = np.array([[-0.3, 0.0, 0.0, 0.5, 0.0, 0.1],
                     [0.01, 0.0, 0.0, 0.01, 0.0, 0.01]], np.float32)
    opa = np.array([0.9, 0.9], np.float32)
    colors = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    view_flat, proj_flat, campos = cam_arrays(cam)
    pre = refp.preprocess(
        means, None, None, opa, None, 0, view_flat, proj_flat, campos,
        w, h, float(cam.tan_fovx), float(cam.tan_fovy),
        cov3d_precomp=cov6, colors_precomp=colors)
    assert pre["radii"][0] == 0 and pre["radii"][1] > 0
    settings = RasterizeSettings(k_dup=1 << 10, tile_x=16, tile_y=16,
                                 interpret=True)
    proc = project.preprocess(
        jnp.asarray(means), None, None, jnp.asarray(opa), None, cam, 0,
        colors_precomp=jnp.asarray(colors), cov3d_precomp=jnp.asarray(cov6))
    assert not bool(proc.visible[0]) and bool(proc.visible[1])
    out = rasterize(jnp.asarray(means), None, None, jnp.asarray(opa), None,
                    cam, 0, jnp.zeros(3), settings,
                    colors_precomp=jnp.asarray(colors),
                    cov3d_precomp=jnp.asarray(cov6))
    img = np.asarray(out.image)
    assert int(out.radii[0]) == 0
    assert img[:, :, 0].max() == 0.0  # the red (det==0) gaussian is culled
    assert img[:, :, 1].max() > 0.01  # the healthy one renders


GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                      "reference_port_golden.npz")


def test_oracle_matches_golden_vectors(scene, cam, oracle):
    """Pin the oracle itself to committed golden vectors so later edits to
    reference_port.py cannot silently drift from the CUDA semantics."""
    g = np.load(GOLDEN)
    np.testing.assert_allclose(oracle["color"], g["color"], atol=1e-6)
    np.testing.assert_allclose(oracle["final_t"], g["final_t"], atol=1e-6)
    np.testing.assert_array_equal(oracle["pre"]["radii"], g["radii"])
    np.testing.assert_array_equal(oracle["n_contrib"], g["n_contrib"])
    np.testing.assert_array_equal(oracle["is_used"], g["is_used"])
