"""End-to-end training smoke test (SURVEY.md §4(e)): optimize a fresh
Gaussian model against ground-truth renders of a known scene; PSNR must
climb substantially. Self-contained — no dataset on disk required."""

import pytest

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.core.quaternion import normalize
from gsplat_tpu.model import gaussians, optim
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
from gsplat_tpu.train import step as step_lib
from gsplat_tpu.train.config import OptimizationConfig

pytestmark = pytest.mark.slow

W, H = 64, 64
SH_DEGREE = 1
SETTINGS = RasterizeSettings(k_dup=16384, tile_x=16, tile_y=16, chunk=128,
                             interpret=True)
BG = jnp.zeros(3)


def _orbit_cameras(n, radius=4.0):
    cams = []
    for i in range(n):
        theta = 2 * np.pi * i / n
        # camera at (r sin, 0, -r cos) looking at origin: build R (cam->world
        # rotation, dataset-reader convention) and t (world->cam translation).
        fwd = np.array([-np.sin(theta), 0.0, np.cos(theta)])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        Rcw = np.stack([right, up, fwd], axis=1)  # world<-cam columns
        pos = -fwd * radius
        t = -Rcw.T @ pos
        cams.append(make_camera(Rcw, t, 0.9, 0.9, W, H))
    return cams


def _gt_scene(p=24, seed=3):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.8, 0.8, size=(p, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-2.2, -1.2, size=(p, 3))).astype(np.float32)
    quats = normalize(jnp.asarray(rng.normal(size=(p, 4)).astype(np.float32)))
    opa = jax.nn.sigmoid(jnp.asarray(rng.uniform(1.0, 3.0, size=p)
                                     .astype(np.float32)))
    shs = np.zeros((p, (SH_DEGREE + 1) ** 2, 3), np.float32)
    shs[:, 0] = rng.uniform(-1.0, 2.0, size=(p, 3))
    return (jnp.asarray(means), jnp.asarray(scales), quats, opa,
            jnp.asarray(shs))


def test_training_improves_psnr():
    cams = _orbit_cameras(6)
    gt_params = _gt_scene()
    # train steps consume channel-first gt (see step.py)
    chw = dataclasses.replace(SETTINGS, layout="chw")
    gts = [rasterize(*gt_params, c, SH_DEGREE, BG, chw).image
           for c in cams]

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.0, 1.0, size=(64, 3)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, size=(64, 3)).astype(np.float32)
    state = gaussians.create_from_points(pts, colors, capacity=256,
                                         max_sh_degree=SH_DEGREE)
    adam = optim.init(state.params())

    opt = OptimizationConfig(
        iterations=300, position_lr_max_steps=300,
        densify_from_iter=40, densify_until_iter=250,
        densification_interval=60, noise_lr=5e4,
        scale_reg=0.01, opacity_reg=0.01)
    train_step = step_lib.make_train_step(opt, SETTINGS, spatial_lr_scale=4.0)
    densify = step_lib.make_densify_step(cap_max=256)
    eval_step = step_lib.make_eval_step(SETTINGS)

    def mean_psnr(st):
        return float(np.mean([
            float(eval_step(st, c, g.transpose(1, 2, 0), BG, SH_DEGREE)[2])
            for c, g in zip(cams, gts)]))

    psnr0 = mean_psnr(state)
    key = jax.random.PRNGKey(0)
    for it in range(1, opt.iterations + 1):
        key, k1, k2 = jax.random.split(key, 3)
        i = int(jax.random.randint(k2, (), 0, len(cams)))
        state, adam, metrics = train_step(
            state, adam, k1, cams[i], gts[i], BG, jnp.asarray(it, jnp.float32),
            SH_DEGREE)
        assert np.isfinite(float(metrics.loss)), f"loss blew up at {it}"
        if (opt.densify_from_iter < it < opt.densify_until_iter
                and it % opt.densification_interval == 0):
            key, kd = jax.random.split(key)
            state, adam = densify(state, adam, kd)

    psnr1 = mean_psnr(state)
    assert int(state.n_alive) > 64, "densification never grew the model"
    assert psnr1 > psnr0 + 6.0, f"PSNR did not improve enough: {psnr0:.2f} -> {psnr1:.2f}"
    assert psnr1 > 20.0, f"final PSNR too low: {psnr1:.2f}"
