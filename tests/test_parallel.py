"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4(f)):
data-parallel training step == single-device step over the same batch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.model import gaussians, optim
from gsplat_tpu.parallel.dp import make_dp_train_step, stack_cameras
from gsplat_tpu.parallel.mesh import make_mesh
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
from gsplat_tpu.train.config import OptimizationConfig

SH = 1
SETTINGS = RasterizeSettings(k_dup=8192, tile_x=16, tile_y=16, chunk=128,
                             interpret=True)
BG = jnp.zeros(3)
W = H = 32


def _cams(n):
    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n
        fwd = np.array([-np.sin(th), 0.0, np.cos(th)])
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        Rcw = np.stack([right, up, fwd], 1)
        t = -Rcw.T @ (-fwd * 3.0)
        cams.append(make_camera(Rcw, t, 0.9, 0.9, W, H))
    return cams


def test_dp_train_step_runs_and_matches_mean_grad():
    n_dev = jax.device_count()
    assert n_dev == 8, "conftest should fake 8 cpu devices"
    mesh = make_mesh(n_dev)

    rng = np.random.default_rng(0)
    state = gaussians.create_from_points(
        rng.uniform(-1, 1, (32, 3)).astype(np.float32),
        rng.uniform(0, 1, (32, 3)).astype(np.float32),
        capacity=64, max_sh_degree=SH)
    adam = optim.init(state.params())

    cams = _cams(n_dev)
    # DP steps consume channel-first gt ([n_dev, 3, H, W], see step.py)
    chw = dataclasses.replace(SETTINGS, layout="chw")
    gts = jnp.stack([
        rasterize(state.xyz, state.get_scaling(), state.get_rotation(),
                  state.get_opacity()[:, 0], state.get_features(), c, SH,
                  BG, chw, alive=state.alive_mask).image * 0.5
        for c in cams])
    cam_batch = stack_cameras(cams)

    opt = OptimizationConfig()
    build = make_dp_train_step(mesh, opt, SETTINGS, spatial_lr_scale=1.0)
    step = build(SH)
    key = jax.random.PRNGKey(0)
    new_state, new_adam, metrics = step(
        jax.tree.map(jnp.copy, state), optim.init(state.params()), key,
        cam_batch, gts, BG, 1.0)
    assert np.isfinite(float(metrics.loss))
    assert np.all(np.isfinite(np.asarray(new_state.xyz)))

    # Cross-check against an explicit single-device mean-of-grads step.
    from gsplat_tpu.train import losses
    from gsplat_tpu.train.step import masked_mean

    def loss_one(params, cam, gt):
        s = state.replace_params(params)
        out = rasterize(s.xyz, s.get_scaling(), s.get_rotation(),
                        s.get_opacity()[:, 0], s.get_features(), cam, SH,
                        BG, chw, alive=s.alive_mask)
        ll1 = losses.l1_loss(out.image, gt)
        lssim = losses.ssim(out.image, gt)
        loss = (1 - opt.lambda_dssim) * ll1 + opt.lambda_dssim * (1 - lssim)
        loss = loss + opt.opacity_reg * masked_mean(
            jnp.abs(s.get_opacity()), s.alive_mask, s.n_alive)
        loss = loss + opt.scale_reg * masked_mean(
            jnp.abs(s.get_scaling()), s.alive_mask, s.n_alive)
        return loss

    grads = [jax.grad(loss_one)(state.params(), c, g)
             for c, g in zip(cams, gts)]
    mean_grads = jax.tree.map(lambda *g: sum(g) / len(g), *grads)
    from gsplat_tpu.core.schedule import expon_lr

    xyz_lr = expon_lr(1.0, opt.position_lr_init, opt.position_lr_final,
                      lr_delay_mult=opt.position_lr_delay_mult,
                      max_steps=opt.position_lr_max_steps)
    lrs = {"xyz": xyz_lr, "f_dc": opt.feature_lr,
           "f_rest": opt.feature_lr / 20.0, "opacity": opt.opacity_lr,
           "scaling": opt.scaling_lr, "rotation": opt.rotation_lr}
    ref_params, _ = optim.step(state.params(), mean_grads,
                               optim.init(state.params()), lrs)
    from gsplat_tpu.model import mcmc

    ref_state = state.replace_params(ref_params)
    ref_state = mcmc.inject_noise(ref_state, key, opt.noise_lr, xyz_lr)
    for name in ["xyz", "scaling", "rotation", "opacity"]:
        np.testing.assert_allclose(
            np.asarray(getattr(new_state, name)),
            np.asarray(getattr(ref_state, name)), atol=1e-5,
            err_msg=f"DP mismatch in {name}")


def test_pshard_render_matches_single_device():
    """Gaussian-sharded rendering (depth slabs + ordered compositing) must
    reproduce the single-device image, and gradients must flow back to the
    sharded parameters."""
    from gsplat_tpu.parallel.pshard import make_pshard_render

    n_dev = jax.device_count()
    mesh = make_mesh(n_dev, axis_name="ps")
    rng = np.random.default_rng(5)
    p = 128  # divisible by 8
    means = rng.uniform(-1.0, 1.0, (p, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(1.0, 8.0, p)
    scales = np.exp(rng.uniform(-2.5, -1.5, (p, 3))).astype(np.float32)
    from gsplat_tpu.core.quaternion import normalize as qnorm

    quats = qnorm(jnp.asarray(rng.normal(size=(p, 4)).astype(np.float32)))
    opa = jax.nn.sigmoid(jnp.asarray(rng.uniform(0, 3, p).astype(np.float32)))
    shs = jnp.asarray(
        np.concatenate([rng.uniform(-0.5, 1.5, (p, 1, 3)),
                        0.1 * rng.normal(size=(p, 3, 3))],
                       axis=1).astype(np.float32))
    alive = jnp.ones((p,), bool)
    cam = _cams(1)[0]
    bg = jnp.asarray([0.3, 0.2, 0.1])

    ref = rasterize(jnp.asarray(means), jnp.asarray(scales), quats, opa, shs,
                    cam, SH, bg, SETTINGS, alive=alive).image

    render = make_pshard_render(mesh, SETTINGS, SH, axis="ps")
    img = render(jnp.asarray(means), jnp.asarray(scales), quats, opa, shs,
                 alive, cam, bg)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=3e-4,
                               rtol=1e-3)

    # gradients flow through the all-gather back to sharded params
    def loss(m):
        return jnp.mean(render(m, jnp.asarray(scales), quats, opa, shs,
                               alive, cam, bg) ** 2)

    g = jax.grad(loss)(jnp.asarray(means))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


def _mini_state(p=96, cap=128, seed=0):
    rng = np.random.default_rng(seed)
    return gaussians.create_from_points(
        rng.uniform(-1, 1, (p, 3)).astype(np.float32),
        rng.uniform(0, 1, (p, 3)).astype(np.float32),
        capacity=cap, max_sh_degree=1)


def test_pshard_gather_grad_scaling():
    """The /n_dev loss convention must make shard_map's all_gather
    transpose deliver exactly dL/d(shard) — no device-count overcount."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    mesh = make_mesh(8, axis_name="ps")
    x = jnp.arange(64, dtype=jnp.float32) / 7.0

    def per_device(xs):
        def loss_fn(xl):
            full = jax.lax.all_gather(xl, "ps").reshape(-1)
            return jnp.sum(full ** 3) / 8
        return jax.grad(loss_fn)(xs)

    g = shard_map(per_device, mesh=mesh, in_specs=P("ps"),
                  out_specs=P("ps"), check_vma=False)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(3 * x ** 2),
                               rtol=1e-5)


def _run_pshard_step(n_dev, state, opt, settings, cam, gt):
    from gsplat_tpu.parallel.pshard import make_pshard_train_step

    mesh = make_mesh(n_dev, axis_name="ps")
    step = make_pshard_train_step(mesh, opt, settings, spatial_lr_scale=1.0,
                                  sh_degree=1, axis="ps")
    params = jax.tree.map(jnp.copy, state.params())  # step donates its args
    adam = optim.init(params)
    return step(params, state.alive_mask, adam,
                jax.random.PRNGKey(3), cam, gt, jnp.zeros(3), 1.0,
                int(state.n_alive))


def test_pshard_train_step_matches_replicated():
    """n_dev=1 P-shard step == plain replicated step EXACTLY (same render);
    n_dev=8 must reproduce the loss and stay finite (slab compositing
    differs from the global render only via per-slab T early-stop)."""
    from gsplat_tpu.train import step as step_lib
    from gsplat_tpu.train.config import OptimizationConfig

    opt = OptimizationConfig(noise_lr=0.0)  # deterministic parity
    settings = RasterizeSettings(k_dup=4096, tile_x=16, tile_y=16, chunk=128,
                                 interpret=True)
    state = _mini_state()
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, 48, 32)
    gt = jnp.full((3, 32, 48), 0.5)  # channel-first (see step.py)

    ref_step = step_lib.make_train_step(opt, settings, spatial_lr_scale=1.0)
    state_in = jax.tree.map(jnp.copy, state)  # ref_step donates its args
    ref_state, _, ref_m = ref_step(state_in, optim.init(state.params()),
                                   jax.random.PRNGKey(3), cam, gt,
                                   jnp.zeros(3), jnp.asarray(1.0), 1)

    p1, _, m1 = _run_pshard_step(1, state, opt, settings, cam, gt)
    np.testing.assert_allclose(float(m1.loss), float(ref_m.loss), rtol=1e-6)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]),
                                   np.asarray(ref_state.params()[k]),
                                   atol=1e-5, err_msg=k)

    p8, _, m8 = _run_pshard_step(8, state, opt, settings, cam, gt)
    np.testing.assert_allclose(float(m8.loss), float(ref_m.loss), rtol=3e-3)
    for k in p8:
        assert np.isfinite(np.asarray(p8[k])).all(), k
        # same optimizer scale: per-group update magnitude must agree
        du8 = np.abs(np.asarray(p8[k]) - np.asarray(state.params()[k])).max()
        duref = np.abs(np.asarray(ref_state.params()[k])
                       - np.asarray(state.params()[k])).max()
        assert du8 <= 2.0 * duref + 1e-7, (k, du8, duref)


def test_dp_swin_step_matches_single_device():
    """8 identical (camera, gt, frame) samples through the DP swin step must
    reproduce the single-device swin step exactly (pmean of equal grads ==
    the grads; replicated noise)."""
    from tests.test_swin import _make_swin_state
    from gsplat_tpu.parallel.dp import stack_cameras
    from gsplat_tpu.parallel.swin_dp import make_dp_swin_train_step
    from gsplat_tpu.train import swin_step as sstep
    from gsplat_tpu.train.config import OptimizationConfig

    opt = OptimizationConfig()
    settings = RasterizeSettings(k_dup=4096, tile_x=16, tile_y=16, chunk=128,
                                 interpret=True)
    state = _make_swin_state(n=32, capacity=64)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, 48, 32)
    gt = jnp.full((3, 32, 48), 0.4)  # channel-first (see step.py)
    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(11)

    ref_step = sstep.make_swin_train_step(opt, settings, spatial_lr_scale=1.0)
    s_in = jax.tree.map(jnp.copy, state)
    ref_state, _, ref_m = ref_step(s_in, optim.init(state.params()), key,
                                   cam, gt, bg, jnp.asarray(1.0),
                                   jnp.asarray(1.0), 1)

    mesh = make_mesh(8, axis_name="dp")
    build = make_dp_swin_train_step(mesh, opt, settings, spatial_lr_scale=1.0)
    step = build(1)
    cam_batch = stack_cameras([cam] * 8)
    gt_batch = jnp.stack([gt] * 8)
    frames = jnp.ones((8,), jnp.float32)
    s_in2 = jax.tree.map(jnp.copy, state)
    dp_state, _, dp_m = step(s_in2, optim.init(state.params()), key,
                             cam_batch, gt_batch, frames, bg, 1.0)

    np.testing.assert_allclose(float(dp_m.loss), float(ref_m.loss), rtol=1e-6)
    np.testing.assert_allclose(float(dp_m.psnr), float(ref_m.psnr), rtol=1e-5)
    for k in state.params():
        np.testing.assert_allclose(np.asarray(dp_state.params()[k]),
                                   np.asarray(ref_state.params()[k]),
                                   atol=1e-5, err_msg=k)


def test_pshard_dp_2d_step_matches_dp():
    """2-D (dp x ps) composed step: gradients pmean'd over the camera
    batch while params/Adam stay Gaussian-sharded. On a 2x4 mesh with
    TWO IDENTICAL (camera, gt) samples it must reproduce the ps=4
    1-D P-shard step exactly (pmean of equal grads == the grads)."""
    from gsplat_tpu.parallel.dp import stack_cameras
    from gsplat_tpu.parallel.mesh import make_mesh_2d
    from gsplat_tpu.parallel.pshard import make_pshard_train_step
    from gsplat_tpu.train.config import OptimizationConfig

    opt = OptimizationConfig(noise_lr=0.0)  # deterministic parity
    settings = RasterizeSettings(k_dup=4096, tile_x=16, tile_y=16, chunk=128,
                                 interpret=True)
    state = _mini_state()
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, 48, 32)
    gt = jnp.full((3, 32, 48), 0.5)
    bg = jnp.zeros(3)

    # reference: 1-D P-shard over ps=4
    mesh1 = make_mesh(4, axis_name="ps")
    step1 = make_pshard_train_step(mesh1, opt, settings,
                                   spatial_lr_scale=1.0, sh_degree=1)
    p_ref, _, m_ref = step1(jax.tree.map(jnp.copy, state.params()),
                            state.alive_mask, optim.init(state.params()),
                            jax.random.PRNGKey(3), cam, gt, bg, 1.0,
                            int(state.n_alive))

    mesh2 = make_mesh_2d(2, 4)
    step2 = make_pshard_train_step(mesh2, opt, settings,
                                   spatial_lr_scale=1.0, sh_degree=1,
                                   dp_axis="dp")
    cam_batch = stack_cameras([cam, cam])
    gt_batch = jnp.stack([gt, gt])
    p_2d, _, m_2d = step2(jax.tree.map(jnp.copy, state.params()),
                          state.alive_mask, optim.init(state.params()),
                          jax.random.PRNGKey(3), cam_batch, gt_batch, bg,
                          1.0, int(state.n_alive))

    np.testing.assert_allclose(float(m_2d.loss), float(m_ref.loss),
                               rtol=1e-6)
    for k in p_2d:
        np.testing.assert_allclose(np.asarray(p_2d[k]),
                                   np.asarray(p_ref[k]), atol=1e-6,
                                   err_msg=k)


def test_pshard_dp_2d_distinct_cameras():
    """With distinct cameras per dp row, the 2-D step applies the
    camera-batch MEAN gradient: loss == mean of per-camera 1-D losses and
    the update stays bounded by the largest per-camera update."""
    from gsplat_tpu.parallel.dp import stack_cameras
    from gsplat_tpu.parallel.mesh import make_mesh_2d
    from gsplat_tpu.parallel.pshard import make_pshard_train_step
    from gsplat_tpu.train.config import OptimizationConfig

    opt = OptimizationConfig(noise_lr=0.0)
    settings = RasterizeSettings(k_dup=4096, tile_x=16, tile_y=16, chunk=128,
                                 interpret=True)
    state = _mini_state()
    cams = _cams(2)
    gts = [jnp.full((3, H, W), 0.3), jnp.full((3, H, W), 0.7)]
    bg = jnp.zeros(3)

    losses_1d = []
    mesh1 = make_mesh(4, axis_name="ps")
    step1 = make_pshard_train_step(mesh1, opt, settings,
                                   spatial_lr_scale=1.0, sh_degree=1)
    for c, g in zip(cams, gts):
        _, _, m = step1(jax.tree.map(jnp.copy, state.params()),
                        state.alive_mask, optim.init(state.params()),
                        jax.random.PRNGKey(3), c, g, bg, 1.0,
                        int(state.n_alive))
        losses_1d.append(float(m.loss))

    mesh2 = make_mesh_2d(2, 4)
    step2 = make_pshard_train_step(mesh2, opt, settings,
                                   spatial_lr_scale=1.0, sh_degree=1,
                                   dp_axis="dp")
    p_2d, _, m_2d = step2(jax.tree.map(jnp.copy, state.params()),
                          state.alive_mask, optim.init(state.params()),
                          jax.random.PRNGKey(3), stack_cameras(cams),
                          jnp.stack(gts), bg, 1.0, int(state.n_alive))
    np.testing.assert_allclose(float(m_2d.loss), np.mean(losses_1d),
                               rtol=1e-5)
    for k in p_2d:
        assert np.isfinite(np.asarray(p_2d[k])).all(), k


def _cloud(p, seed, depth_range=(1.0, 8.0)):
    rng = np.random.default_rng(seed)
    from gsplat_tpu.core.quaternion import normalize as qnorm

    means = rng.uniform(-1.0, 1.0, (p, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(*depth_range, p)
    scales = np.exp(rng.uniform(-2.5, -1.5, (p, 3))).astype(np.float32)
    quats = qnorm(jnp.asarray(rng.normal(size=(p, 4)).astype(np.float32)))
    opa = jax.nn.sigmoid(jnp.asarray(rng.uniform(0, 3, p).astype(np.float32)))
    shs = jnp.asarray(
        np.concatenate([rng.uniform(-0.5, 1.5, (p, 1, 3)),
                        0.1 * rng.normal(size=(p, 3, 3))],
                       axis=1).astype(np.float32))
    return jnp.asarray(means), jnp.asarray(scales), quats, opa, shs


def test_band_rasterize_matches_full_rows():
    """rasterize(band_h, band_y0) must reproduce exactly those rows of the
    full-frame render (pixel-space y-shift; preprocess untouched)."""
    from gsplat_tpu.core.camera import make_camera

    p = 96
    means, scales, quats, opa, shs = _cloud(p, seed=11)
    alive = jnp.ones((p,), bool)
    cam = _cams(1)[0]
    bg = jnp.asarray([0.25, 0.1, 0.4])

    full = rasterize(means, scales, quats, opa, shs, cam, SH, bg, SETTINGS,
                     alive=alive).image  # [32, 32, 3] hwc
    for y0 in (0, 16):
        band = rasterize(means, scales, quats, opa, shs, cam, SH, bg,
                         SETTINGS, alive=alive, band_h=16,
                         band_y0=float(y0)).image
        np.testing.assert_allclose(np.asarray(band),
                                   np.asarray(full[y0:y0 + 16]),
                                   atol=2e-5, rtol=1e-4)


def test_tileshard_render_matches_single_device():
    """Image-band sharded rendering (replicated params, one band per
    device, no compositing collective) must reproduce the single-device
    frame to fp rounding."""
    from gsplat_tpu.core.camera import make_camera
    from gsplat_tpu.parallel.tileshard import (make_tileshard_render,
                                               tileshard_num_dup)

    n_dev = jax.device_count()
    mesh = make_mesh(n_dev, axis_name="sp")
    p = 128
    means, scales, quats, opa, shs = _cloud(p, seed=12)
    alive = jnp.ones((p,), bool)

    w, h = 32, 128  # 8 devices x one 16-row tile band each
    th = 0.0
    Rcw = np.eye(3)
    t = np.array([0.0, 0.0, 3.0])
    cam = make_camera(Rcw, t, 0.9, 0.9, w, h)
    bg = jnp.asarray([0.3, 0.2, 0.1])

    ref = rasterize(means, scales, quats, opa, shs, cam, SH, bg, SETTINGS,
                    alive=alive).image

    probe = tileshard_num_dup(mesh, SETTINGS, SH, axis="sp")
    per_band = int(probe(means, scales, quats, opa, shs, alive, cam, bg))
    assert per_band <= SETTINGS.k_dup

    render = make_tileshard_render(mesh, SETTINGS, SH, axis="sp")
    img = render(means, scales, quats, opa, shs, alive, cam, bg)
    assert img.shape == (h, w, 3)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
