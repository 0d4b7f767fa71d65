"""Static 3DGS-MCMC training entry point.

CLI and behavior mirror the reference train_static.py:212-243 / training()
(:36-144): per-iteration random camera, L1+SSIM loss with opacity/scale
regularizers, MCMC relocation + capped growth every densification_interval,
covariance-shaped noise injection, periodic PSNR eval, PLY saves, and
checkpoint/resume. The hot loop is one fused jitted XLA program per
iteration (see gsplat_tpu.train.step).

Note on datasets: the reference's "static" trainer reads a SwinGS video
dataset through a frame window (SURVEY.md §7 quirks). Here train_static
trains on any supported dataset; for SwinGS-layout videos pass --frame to
train one static model for that frame (the run_swin.sh recipe).

Usage:
  python -m gsplat_tpu.train.train_static -s <dataset> -m <out> --cap_max N
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from random import randint

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.data.scene import DynamicScene, Scene
from gsplat_tpu.data.readers import detect_scene_type
from gsplat_tpu.model import gaussians, optim
from gsplat_tpu.raster.rasterize import RasterizeSettings
from gsplat_tpu.train import step as step_lib
from gsplat_tpu.train.config import (ModelConfig, OptimizationConfig,
                                     PipelineConfig, add_config_args,
                                     auto_dup_budget, extract_config,
                                     save_cfg_args)
from gsplat_tpu.utils import checkpoint as ckpt_lib
from gsplat_tpu.utils import debug as debug_lib


def next_dup_budget(num_dup: int, k_dup: int, iteration: int,
                    dup_peak: int, dup_tightened: bool,
                    densify_until_iter: int,
                    chunk: int) -> tuple[int | None, int, bool]:
    """Adaptive duplicate-budget policy (pure, unit-tested): returns
    (new_k_dup or None, updated dup_peak, updated dup_tightened).

    - GROW to 1.5x on (near-)overflow at every loss fetch — never train
      long on silent truncation. Loose on purpose: during densification
      counts grow ~5% per interval, and every resize is a ~40 s XLA
      recompile on real TPUs.
    - SHRINK to 1.6x when grossly oversized (< 0.35x), checked every
      1000 iters.
    - TIGHTEN once to 1.12x the observed peak shortly after
      densification ends: counts are stable there, and every padded
      slot feeds the K-proportional gather/sort/expand/kernel stages
      (~linear step-time waste; 1.3x vs 1.12x measured ~7 ms/it at the
      1M-cap scale on v5e)."""
    dup_peak = max(dup_peak, num_dup)
    new_k = None
    if num_dup > 0.95 * k_dup:
        new_k = int(num_dup * 1.5)
    elif (iteration % 1000 == 0 and k_dup > 1 << 16
          and num_dup < 0.35 * k_dup):
        new_k = max(int(num_dup * 1.6), 1 << 16)
    elif (not dup_tightened and dup_peak > 0
          and iteration > densify_until_iter + 300
          and k_dup > 1.25 * dup_peak):
        new_k = max(int(dup_peak * 1.12), 1 << 16)
        dup_tightened = True
    if new_k is not None:
        new_k = -(-new_k // chunk) * chunk
    return new_k, dup_peak, dup_tightened


def make_settings(pipe: PipelineConfig, cap_max: int) -> RasterizeSettings:
    return RasterizeSettings(
        k_dup=auto_dup_budget(cap_max, pipe),
        tile_x=pipe.tile_x, tile_y=pipe.tile_y, chunk=pipe.chunk,
        interpret=jax.default_backend() == "cpu")


def training(model_cfg: ModelConfig, opt: OptimizationConfig,
             pipe: PipelineConfig, args) -> dict:
    if model_cfg.cap_max == -1:
        print("Please specify the maximum number of Gaussians with --cap_max.")
        sys.exit(1)

    # safe_state parity (general_utils.py:112-133): pin the python-random
    # camera draw so runs are reproducible and CI gates deterministic
    import random as _random

    _random.seed(getattr(args, "camera_seed", 0))

    tb_writer = _prepare_output_and_logger(model_cfg, args)

    scene_type = detect_scene_type(model_cfg.source_path)
    if scene_type == "SwinGS":
        dyn = DynamicScene(model_cfg.source_path, model_cfg.model_path,
                           eval_split=model_cfg.eval,
                           resolution=model_cfg.resolution,
                           init_type=model_cfg.init_type,
                           num_pts=model_cfg.init_pts,
                           max_frame=model_cfg.max_frame,
                           min_frame=model_cfg.min_frame)
        train_cams = dyn.get_train_cams_at([args.frame])
        test_cams = dyn.get_test_cams_at([args.frame])
        info_points, info_colors = dyn.info.points, dyn.info.colors
        cameras_extent = dyn.cameras_extent
        scene = dyn
    else:
        scene = Scene(model_cfg.source_path, model_cfg.model_path,
                      images=model_cfg.images, eval_split=model_cfg.eval,
                      resolution=model_cfg.resolution,
                      white_background=model_cfg.white_background,
                      init_type=model_cfg.init_type,
                      num_pts=model_cfg.init_pts)
        train_cams, test_cams = scene.train_cameras, scene.test_cameras
        info_points, info_colors = scene.info.points, scene.info.colors
        cameras_extent = scene.cameras_extent

    capacity = model_cfg.cap_max
    n_init = min(info_points.shape[0], capacity)
    state = gaussians.create_from_points(
        info_points[:n_init], info_colors[:n_init], capacity,
        model_cfg.sh_degree)
    adam = optim.init(state.params())

    first_iter = 0
    if args.start_checkpoint:
        state, adam, first_iter, _ = ckpt_lib.load(args.start_checkpoint)
        print(f"restored checkpoint at iteration {first_iter}")

    settings = make_settings(pipe, capacity)

    n_dp = getattr(args, "data_parallel", 1)
    n_ps = getattr(args, "pshard", 1)
    if n_dp > 1 or n_ps > 1:
        assert jax.device_count() >= n_dp * n_ps, (
            f"--data_parallel {n_dp} x --pshard {n_ps} needs "
            f"{n_dp * n_ps} devices, have {jax.device_count()}")
    if n_dp > 1 and n_ps == 1:
        from gsplat_tpu.parallel.dp import make_dp_train_step, stack_cameras
        from gsplat_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dp)
        print(f"data-parallel training over {n_dp} devices")
    if n_ps > 1:
        assert capacity % n_ps == 0, (
            f"--cap_max {capacity} must be divisible by --pshard {n_ps} "
            "(the Gaussian axis is sharded evenly)")
        from gsplat_tpu.parallel.mesh import make_mesh, make_mesh_2d
        from gsplat_tpu.parallel.pshard import make_pshard_train_step

        if n_dp > 1:
            # 2-D composed mode: camera-batch DP rows x Gaussian-shard cols
            from gsplat_tpu.parallel.dp import stack_cameras

            mesh_ps = make_mesh_2d(n_dp, n_ps)
            print(f"2-D dp x ps training over {n_dp}x{n_ps} devices")
        else:
            mesh_ps = make_mesh(n_ps, axis_name="ps")
            print(f"P-sharded (Gaussian-axis) training over {n_ps} devices")

    replay = None
    if getattr(args, "replay_rng", None):
        from gsplat_tpu.train.replay import ReplaySchedule

        assert n_dp == 1 and n_ps == 1, (
            "--replay_rng replays a single-device reference schedule")
        replay = ReplaySchedule(args.replay_rng, capacity)
        print(f"replaying recorded RNG schedule from {args.replay_rng} "
              f"({replay.iterations} iterations, "
              f"{len(replay._densify)} densify events)")

    def build_steps(s):
        if n_dp > 1 and n_ps == 1:
            dp_builder = make_dp_train_step(mesh, opt, s, cameras_extent)
            return (dp_builder, step_lib.make_densify_step(capacity),
                    step_lib.make_eval_step(s))
        if n_ps > 1:
            # sh_degree is static in the pshard step; cache one jitted step
            # per degree (<= 4 compiles over a run)
            import functools as _ft

            @_ft.lru_cache(maxsize=8)
            def ps_builder(sh):
                return make_pshard_train_step(
                    mesh_ps, opt, s, cameras_extent, sh,
                    dp_axis="dp" if n_dp > 1 else None)

            return (ps_builder, step_lib.make_densify_step(capacity),
                    step_lib.make_eval_step(s))
        return (step_lib.make_train_step(opt, s, cameras_extent),
                step_lib.make_densify_step(capacity),
                step_lib.make_eval_step(s))

    train_step, densify_step, eval_step = build_steps(settings)

    # split grad/apply programs for densification iterations (and for RNG
    # replay): the reference's order is backward -> densify ->
    # optimizer.step -> noise (train_static.py:102-140) — gradients are
    # computed on PRE-densification parameters, then applied to the
    # mutated ones. Only used on the single-device path; the dp/pshard
    # paths keep the fused step (densify after apply), a documented
    # ordering deviation at densify iterations.
    split_ok = n_dp == 1 and n_ps == 1
    grad_step = apply_step = densify_replay_step = None
    if split_ok:
        grad_step = step_lib.make_grad_step(opt, settings, cameras_extent)
        apply_step = step_lib.make_apply_step(
            opt, cameras_extent, external_noise=replay is not None)
        if replay is not None:
            densify_replay_step = step_lib.make_densify_replay_step(capacity)

    bg = jnp.asarray([1.0, 1.0, 1.0] if model_cfg.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)
    key = jax.random.PRNGKey(0)
    # pshard mode trains on a bare (sharded, donated) param dict; the
    # GaussianState is re-synced for host-paced ops (densify/eval/save)
    ps_params = state.params() if n_ps > 1 else None

    profile_range = getattr(args, "profile_iterations", None) or ()
    replay_losses: list = []
    cams_by_name = {}
    if replay is not None:
        for c in train_cams:
            assert c.image_name not in cams_by_name, (
                f"duplicate camera name {c.image_name}: replay needs "
                "unique image names")
            cams_by_name[c.image_name] = c
    viewpoint_stack: list = []
    ema_loss = 0.0
    dup_peak, dup_tightened = 0, False
    last_metrics = None
    t_start = time.time()
    for iteration in range(first_iter + 1, opt.iterations + 1):
        if iteration == getattr(args, "debug_from", -1):
            # arm runtime NaN localization from here on (reference
            # semantics: debug checks start at debug_from)
            jax.config.update("jax_debug_nans", True)
            print(f"debug: jax_debug_nans armed at iteration {iteration}")
        if profile_range and iteration == profile_range[0]:
            jax.profiler.start_trace(os.path.join(model_cfg.model_path,
                                                  "profile"))
        if profile_range and iteration == profile_range[-1]:
            jax.profiler.stop_trace()
            print(f"profile trace -> {model_cfg.model_path}/profile")
        sh_degree = min(iteration // 1000, model_cfg.sh_degree)

        key, k_step, k_bg = jax.random.split(key, 3)
        step_bg = (jax.random.uniform(k_bg, (3,)) if opt.random_background
                   else bg)
        if n_dp > 1 and n_ps == 1:
            # one camera per device per step; gradients psum-averaged
            from gsplat_tpu.parallel.dp import stack_cameras

            cams, gts = [], []
            for _ in range(n_dp):
                if not viewpoint_stack:
                    viewpoint_stack = list(train_cams)
                c, g = viewpoint_stack.pop(
                    randint(0, len(viewpoint_stack) - 1)).load()
                cams.append(c)
                # CHW on host: the jitted steps run channel-first (step.py)
                gts.append(jnp.asarray(np.ascontiguousarray(
                    g.transpose(2, 0, 1))))
            state, adam, metrics = train_step(sh_degree)(
                state, adam, k_step, stack_cameras(cams), jnp.stack(gts),
                step_bg, jnp.asarray(iteration, jnp.float32))
        elif n_ps > 1:
            if n_dp > 1:
                # 2-D mode: one camera per dp row (gradient pmean over dp)
                from gsplat_tpu.parallel.dp import stack_cameras

                cams, gts = [], []
                for _ in range(n_dp):
                    if not viewpoint_stack:
                        viewpoint_stack = list(train_cams)
                    c, g = viewpoint_stack.pop(
                        randint(0, len(viewpoint_stack) - 1)).load()
                    cams.append(c)
                    gts.append(jnp.asarray(np.ascontiguousarray(
                        g.transpose(2, 0, 1))))
                camera, gt_dev = stack_cameras(cams), jnp.stack(gts)
            else:
                if not viewpoint_stack:
                    viewpoint_stack = list(train_cams)
                cam_obj = viewpoint_stack.pop(
                    randint(0, len(viewpoint_stack) - 1))
                camera, gt = cam_obj.load()
                gt_dev = jnp.asarray(np.ascontiguousarray(
                    gt.transpose(2, 0, 1)))
            ps_params, adam, metrics = train_step(sh_degree)(
                ps_params, state.alive_mask, adam, k_step, camera,
                gt_dev, step_bg, iteration, int(state.n_alive))
        else:
            densify_now = (
                opt.densify_from_iter < iteration < opt.densify_until_iter
                and iteration % opt.densification_interval == 0)
            if replay is not None:
                cam_obj = cams_by_name[replay.camera_name(iteration)]
            else:
                if not viewpoint_stack:
                    viewpoint_stack = list(train_cams)
                cam_obj = viewpoint_stack.pop(
                    randint(0, len(viewpoint_stack) - 1))
            camera, gt = cam_obj.load()
            gt_dev = jnp.asarray(np.ascontiguousarray(
                gt.transpose(2, 0, 1)))
            it_f = jnp.asarray(iteration, jnp.float32)
            if replay is not None or densify_now:
                # reference interleave: backward -> densify -> Adam -> noise
                grads, metrics = grad_step(state, camera, gt_dev, step_bg,
                                           sh_degree)
                surgery = False
                if densify_now:
                    key, kd = jax.random.split(key)
                    if replay is not None and replay.has_densify(iteration):
                        dm, rt, at_, target = replay.densify_arrays(
                            iteration, state=state)
                        surgery = bool(dm.any()) or target > int(
                            state.n_alive)
                        state, adam = densify_replay_step(
                            state, adam, jnp.asarray(dm), jnp.asarray(rt),
                            jnp.asarray(at_),
                            jnp.asarray(target, jnp.int32))
                    else:
                        # did relocation or growth actually touch the
                        # model? (decides the reference grad=None Adam
                        # skip, see make_apply_step)
                        n = int(state.n_alive)
                        tgt = min(capacity, int(1.05 * n))
                        dead_any = bool(jnp.any(
                            state.alive_mask
                            & (state.get_opacity()[:, 0] <= 0.005)))
                        surgery = dead_any or tgt > n
                        state, adam = densify_step(state, adam, kd)
                key, kn = jax.random.split(key)
                extra = ((jnp.asarray(replay.noise(iteration)),)
                         if replay is not None else ())
                state, adam = apply_step(state, adam, grads, kn, it_f,
                                         jnp.asarray(not surgery), *extra)
            else:
                state, adam, metrics = train_step(
                    state, adam, k_step, camera, gt_dev, step_bg, it_f,
                    sh_degree)
            if replay is not None:
                replay_losses.append((iteration, float(metrics.l1),
                                      float(metrics.loss)))
        last_metrics = metrics

        if (not split_ok
                and opt.densify_from_iter < iteration < opt.densify_until_iter
                and iteration % opt.densification_interval == 0):
            key, kd = jax.random.split(key)
            if n_ps > 1:
                # densification runs on gathered state (host-paced, every
                # densification_interval); params reshard on the next step
                state, adam = densify_step(
                    state.replace_params(ps_params), adam, kd)
                ps_params = state.params()
            else:
                state, adam = densify_step(state, adam, kd)

        if iteration % 10 == 0:
            loss = float(metrics.loss)
            # non-finite loss: dump a reproducer snapshot and abort
            # (the reference's debug-mode snapshot_fw.dump analogue,
            # diff_gaussian_rasterization/__init__.py:83-90)
            debug_lib.check_finite_loss(
                loss, iteration, model_cfg.model_path,
                params=(ps_params if n_ps > 1 else state.params()),
                adam=adam, key=key,
                camera=None if (n_dp > 1 and n_ps == 1) else camera)
            ema_loss = 0.4 * loss + 0.6 * ema_loss
            num_dup = int(metrics.num_dup)
            if tb_writer:
                tb_writer.add_scalar("train_loss_patches/l1_loss",
                                     float(metrics.l1), iteration)
                tb_writer.add_scalar("train_loss_patches/total_loss", loss,
                                     iteration)
            # adaptive duplicate budget (policy + rationale in
            # next_dup_budget above)
            if num_dup > settings.k_dup:
                print(f"  WARNING: duplicate budget overflowed "
                      f"({num_dup} > {settings.k_dup}); recent steps "
                      f"trained on truncated tile lists")
            new_k, dup_peak, dup_tightened = next_dup_budget(
                num_dup, settings.k_dup, iteration, dup_peak,
                dup_tightened, opt.densify_until_iter, settings.chunk)
            if new_k is not None:
                settings = dataclasses.replace(settings, k_dup=new_k)
                print(f"  duplicate budget -> {new_k} (recompiling)")
                train_step, densify_step, eval_step = build_steps(settings)
                if split_ok:
                    grad_step = step_lib.make_grad_step(opt, settings,
                                                        cameras_extent)
        if iteration % 100 == 0:
            dt = (time.time() - t_start) / min(iteration - first_iter, 100)
            t_start = time.time()
            print(f"[ITER {iteration}] loss={float(metrics.loss):.5f} "
                  f"ema={ema_loss:.5f} psnr={float(metrics.psnr):.2f} "
                  f"n={int(state.n_alive)} dup={int(metrics.num_dup)}/"
                  f"{settings.k_dup} {dt * 1000:.1f}ms/it")
            if tb_writer:
                tb_writer.add_scalar("iter_time", dt * 1000, iteration)
                tb_writer.add_scalar("total_points", int(state.n_alive),
                                     iteration)

        if n_ps > 1 and (iteration in args.test_iterations
                         or iteration in args.save_iterations
                         or iteration in args.checkpoint_iterations):
            state = state.replace_params(ps_params)

        if iteration in args.test_iterations and test_cams:
            _report_eval(tb_writer, eval_step, state, test_cams, bg,
                         sh_degree, iteration,
                         train_cams=train_cams,
                         log_gt=iteration == min(args.test_iterations))

        if iteration in args.save_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            gaussians.save_ply(state, scene.point_cloud_path(iteration))

        if iteration in args.checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            ckpt_lib.save(os.path.join(model_cfg.model_path,
                                       f"chkpnt{iteration}.npz"),
                          state, adam, iteration)

    if replay is not None:
        import json

        out = os.path.join(model_cfg.model_path, "parity_ours.json")
        with open(out, "w") as f:
            json.dump({"losses": replay_losses,
                       "densify_diagnostics": replay.diagnostics,
                       "iterations": opt.iterations}, f)
        print(f"wrote {out} ({len(replay_losses)} loss samples)")

    return {"state": state, "adam": adam,
            "final_loss": float(last_metrics.loss) if last_metrics else None}


def _report_eval(tb_writer, eval_step, state, test_cams, bg, sh_degree,
                 iteration, train_cams=(), log_gt=False):
    """Periodic held-out eval + TB observability at reference parity
    (train_static.py:176-205): scalar L1/PSNR per config, up to 5 rendered
    views per config (GT once, at the first test iteration), opacity
    histogram, and total point count."""
    configs = [("test", list(test_cams))]
    if train_cams:
        # the reference samples train views at fixed stride-5 offsets
        sample = [train_cams[idx % len(train_cams)]
                  for idx in range(5, 30, 5)]
        configs.append(("train", sample))
    for name, cams in configs:
        l1s, psnrs = [], []
        for vi, cam_obj in enumerate(cams):
            camera, gt = cam_obj.load()
            img, l1, p = eval_step(state, camera, jnp.asarray(gt), bg,
                                   sh_degree)
            l1s.append(float(l1))
            psnrs.append(float(p))
            if tb_writer and vi < 5:
                tb_writer.add_image(
                    f"{name}_view_{cam_obj.image_name}/render",
                    np.clip(np.asarray(img), 0, 1), iteration,
                    dataformats="HWC")
                if log_gt:
                    tb_writer.add_image(
                        f"{name}_view_{cam_obj.image_name}/ground_truth",
                        np.clip(np.asarray(gt), 0, 1), iteration,
                        dataformats="HWC")
        if name == "test":
            print(f"\n[ITER {iteration}] Evaluating test: "
                  f"L1 {np.mean(l1s):.5f} PSNR {np.mean(psnrs):.2f}")
        if tb_writer:
            tb_writer.add_scalar(f"{name}/loss_viewpoint - l1_loss",
                                 float(np.mean(l1s)), iteration)
            tb_writer.add_scalar(f"{name}/loss_viewpoint - psnr",
                                 float(np.mean(psnrs)), iteration)
    if tb_writer:
        alive = np.asarray(state.alive_mask)
        opac = np.asarray(state.get_opacity())[:, 0][alive]
        tb_writer.add_histogram("scene/opacity_histogram", opac, iteration)
        tb_writer.add_scalar("total_points", int(state.n_alive), iteration)


def _prepare_output_and_logger(model_cfg: ModelConfig, args):
    if not model_cfg.model_path:
        import uuid

        model_cfg.model_path = os.path.join("./output/", str(uuid.uuid4())[:10])
        args.model_path = model_cfg.model_path
    print(f"Output folder: {model_cfg.model_path}")
    save_cfg_args(model_cfg.model_path, args)
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(model_cfg.model_path)
    except ImportError:
        print("Tensorboard not available: not logging progress")
        return None


def main(argv=None):
    parser = argparse.ArgumentParser(description="Training script parameters")
    add_config_args(parser, ModelConfig())
    add_config_args(parser, OptimizationConfig())
    add_config_args(parser, PipelineConfig())
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=list(range(2_000, 30_000, 1_000)))
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=list(range(5_000, 30_000, 5_000)))
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--camera_seed", type=int, default=0,
                        help="seed for the python-random camera draw "
                             "(safe_state parity: the reference seeds all "
                             "RNGs to 0, general_utils.py:112-133; a "
                             "fixed seed also makes the CI quality gates "
                             "deterministic)")
    parser.add_argument("--profile_iterations", nargs=2, type=int,
                        default=None,
                        help="capture a jax.profiler trace over [a, b)")
    parser.add_argument("--replay_rng", type=str, default=None,
                        help="replay a recorded reference-loop RNG "
                             "schedule (camera order, densify draws, "
                             "noise) for exec-parity; see "
                             "gsplat_tpu/train/replay.py")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="train over N devices, one camera each per "
                             "step (gradients psum-averaged over the mesh)")
    parser.add_argument("--pshard", type=int, default=1,
                        help="shard the Gaussian axis over N devices (the "
                             "tensor-parallel analogue): each device "
                             "rasterizes its depth slab, grads arrive via "
                             "the all-gather transpose (psum-scatter), "
                             "Adam state never leaves the shard")
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    model_cfg = extract_config(args, ModelConfig)
    opt = extract_config(args, OptimizationConfig)
    pipe = extract_config(args, PipelineConfig)
    print("Optimizing " + model_cfg.model_path)
    # --detect_anomaly and --debug/--debug_from 0 both map to runtime NaN
    # localization (the XLA analogue of the reference's per-call
    # cudaDeviceSynchronize error checks, auxiliary.h:166-173); a nonzero
    # --debug_from arms it lazily from that iteration (see training loop).
    if args.detect_anomaly or pipe.debug or args.debug_from == 0:
        jax.config.update("jax_debug_nans", True)
    training(model_cfg, opt, pipe, args)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
