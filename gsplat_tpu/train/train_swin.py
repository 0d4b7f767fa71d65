"""Sliding-window (SwinGS) dynamic-scene training entry point.

Mirrors the reference train_swin.py:275-380 / train_slide_window(:118-273):
genesis pass over the first window, opacity-ranked lifespan staggering
(decay_genesis), then per-tick evolve (mature to the frozen ring + stream to
disk + rollover) and window training; finally mature the remainder.

Usage:
  python -m gsplat_tpu.train.train_swin -s <swings_dataset> -m <out>
         --cap_max N --swin_size 10 [--deform] [--first_frame_only]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.data.scene import DynamicScene, MAX_FRAME_IN_MEMORY
from gsplat_tpu.model import gaussians as gs_lib
from gsplat_tpu.model import optim, swin
from gsplat_tpu.train import swin_step as sstep
from gsplat_tpu.train.config import (ModelConfig, OptimizationConfig,
                                     PipelineConfig, add_config_args,
                                     extract_config, save_cfg_args)
from gsplat_tpu.train.train_static import make_settings
from gsplat_tpu.utils import checkpoint as ckpt_lib
from gsplat_tpu.utils.stream import SliWinManager, stream_dump


def evolve(state: swin.SwinState, adam, swin_mgr: SliWinManager,
           dump_path: str, sh_degree: int):
    """Host+device evolve (gaussian_model.py:530-548): stream matured rows
    to disk, then ring-copy + rollover on device."""
    mask = swin.mature_mask(state, float(swin_mgr.frame_end))
    rows = swin.extract_rows_host(state, np.asarray(mask))
    n = rows["start_frame"].shape[0]
    if n:
        stream_dump(rows, dump_path, sh_degree)
        print(f"Matured {n} gaussians -> {dump_path}")
    return sstep.mature_and_rollover_jit(state, adam, mask)


def mature_rest(state: swin.SwinState, adam, dump_path: str, sh_degree: int):
    """Mature every remaining immature gaussian (gaussian_model.py:551-555)."""
    mask = state.im.alive_mask & (state.frame_start >= 0)
    rows = swin.extract_rows_host(state, np.asarray(mask))
    if rows["start_frame"].shape[0]:
        stream_dump(rows, dump_path, sh_degree)
        print(f"Matured rest: {rows['start_frame'].shape[0]} gaussians")
    return sstep.mature_and_rollover_jit(state, adam, mask)


class StepBox:
    """Mutable holder for the jitted steps + settings, so the hot loop can
    regrow the duplicate budget and rebuild MID-WINDOW at the same cadence
    as the static trainer (train_static.py loss fetch; VERDICT r2 next #5)
    instead of only at window boundaries."""

    def __init__(self, build, settings):
        self._build = build
        self.set_settings(settings)

    def set_settings(self, settings):
        self.settings = settings
        (self.train, self.densify, self.eval,
         self.grad, self.apply) = self._build(settings)

    def maybe_grow(self, num_dup: int, chunk: int) -> bool:
        """Grow the budget on (near-)overflow; True if steps were rebuilt."""
        if num_dup <= 0.95 * self.settings.k_dup:
            return False
        if num_dup > self.settings.k_dup:
            print(f"  WARNING: duplicate budget overflowed ({num_dup} > "
                  f"{self.settings.k_dup}); recent steps trained on "
                  f"truncated tile lists")
        import dataclasses as _dc

        new_k = -(-int(num_dup * 1.5) // chunk) * chunk
        self.set_settings(_dc.replace(self.settings, k_dup=new_k))
        print(f"  duplicate budget -> {new_k} (recompiling)")
        return True


def train_slide_window(state, adam, scene: DynamicScene,
                       swin_mgr: SliWinManager, box: StepBox, model_cfg,
                       opt, args, bg, key, genesis: bool,
                       first_iter: int = 0, ckpt_dir=None, tb_writer=None):
    total = opt.iterations
    if opt.genesis_iterations > 0 and genesis:
        total = opt.genesis_iterations
    viewpoint_stack = []
    nbr_indices = None
    enable_arap = getattr(args, "enable_arap", False)
    n_dp = getattr(args, "data_parallel", 1)
    # warm this window's frames and the one entering at the next tick on
    # the background decoder threads (data/prefetch.py) — the device steps
    # below hide the IO the reference pays synchronously per window
    scene.prefetch_train_frames(
        list(swin_mgr.sampled_frames()) + [swin_mgr.frame_end])
    t_start = time.time()
    for it in range(first_iter + 1, total + 1):
        if it == getattr(args, "debug_from", -1):
            jax.config.update("jax_debug_nans", True)
            print(f"debug: jax_debug_nans armed at iteration {it}")
        sh_degree = (min(it // 1000, model_cfg.sh_degree) if genesis
                     else model_cfg.sh_degree)
        key, k_step = jax.random.split(key)
        if enable_arap and (nbr_indices is None
                            or it % opt.densification_interval == 0):
            from gsplat_tpu.model.knn import knn_indices

            nbr_indices = knn_indices(state.im.xyz, k=20)[1]
        if n_dp > 1:
            # one window (camera, frame) sample per device, psum-averaged
            from gsplat_tpu.parallel.dp import stack_cameras

            cam_list, gt_list, frame_list = [], [], []
            for _ in range(n_dp):
                if not viewpoint_stack:
                    cams = scene.get_train_cams_at(swin_mgr.sampled_frames())
                    viewpoint_stack = list(cams)
                    random.shuffle(viewpoint_stack)
                cam_obj = viewpoint_stack.pop()
                camera, gt = cam_obj.load()
                cam_list.append(camera)
                # CHW on host: the jitted steps run channel-first (step.py)
                gt_list.append(jnp.asarray(np.ascontiguousarray(
                    gt.transpose(2, 0, 1))))
                frame_list.append(float(cam_obj.frame))
            # box.train is the lru-cached DP builder in this mode
            state, adam, m = box.train(sh_degree)(
                state, adam, k_step, stack_cameras(cam_list),
                jnp.stack(gt_list), jnp.asarray(frame_list, jnp.float32),
                bg, jnp.asarray(it, jnp.float32))
        else:
            if not viewpoint_stack:
                cams = scene.get_train_cams_at(swin_mgr.sampled_frames())
                viewpoint_stack = list(cams)
                random.shuffle(viewpoint_stack)
            cam_obj = viewpoint_stack.pop()
            camera, gt = cam_obj.load()
            gt_dev = jnp.asarray(np.ascontiguousarray(
                gt.transpose(2, 0, 1)))
            it_f = jnp.asarray(it, jnp.float32)
            frame_f = jnp.asarray(float(cam_obj.frame))
            densify_now = (
                (opt.densify_from_iter < it < opt.densify_until_iter
                 and it % opt.densification_interval == 0)
                or (not genesis and 0 < it < opt.densify_until_iter
                    and it % opt.densification_interval == 0))
            if densify_now and not enable_arap:
                # reference interleave: backward -> densify ->
                # optimizer.step (train_swin.py:203-242). The Adam update
                # is ALWAYS skipped here: relocate_gs_immuture recreates
                # every nn.Parameter with grad=None unconditionally
                # (gaussian_model.py:957), so the reference step() no-ops
                # (see swin_step.make_swin_grad_step).
                grads, m = box.grad(state, camera, gt_dev, bg, frame_f,
                                    sh_degree)
                key, kd = jax.random.split(key)
                state, adam = box.densify(
                    state, adam, kd,
                    jnp.asarray(float(swin_mgr.frame_start)), genesis)
                key, kn = jax.random.split(key)
                state, adam = box.apply(state, adam, grads, kn, it_f,
                                        frame_f, jnp.asarray(False))
            else:
                state, adam, m = box.train(
                    state, adam, k_step, camera, gt_dev, bg, it_f,
                    frame_f, sh_degree, nbr_indices=nbr_indices)
                if densify_now:
                    # arap mode keeps the fused step (grad split has no
                    # arap term; the reference ships ARAP gated off)
                    key, kd = jax.random.split(key)
                    state, adam = box.densify(
                        state, adam, kd,
                        jnp.asarray(float(swin_mgr.frame_start)), genesis)

        if n_dp > 1:
            densify_now = (
                (opt.densify_from_iter < it < opt.densify_until_iter
                 and it % opt.densification_interval == 0)
                or (not genesis and 0 < it < opt.densify_until_iter
                    and it % opt.densification_interval == 0))
            if densify_now:
                key, kd = jax.random.split(key)
                state, adam = box.densify(
                    state, adam, kd,
                    jnp.asarray(float(swin_mgr.frame_start)), genesis)

        if it % 10 == 0:
            # same cadence as the static trainer: never train long on
            # truncated tile lists (VERDICT r2 next #5)
            from gsplat_tpu.utils import debug as debug_lib

            debug_lib.check_finite_loss(
                float(m.loss), it, model_cfg.model_path,
                params=state.params(), adam=adam, key=key,
                window=(swin_mgr.frame_start, swin_mgr.frame_end))
            num_dup = int(m.num_dup)
            args._dup_high_water = max(
                getattr(args, "_dup_high_water", 0), num_dup)
            if box.maybe_grow(num_dup, box.settings.chunk):
                args._dup_budget = box.settings.k_dup
            if tb_writer:
                tb_writer.add_scalar("train_loss_patches/total_loss",
                                     float(m.loss), it)

        if it % 100 == 0:
            dt = (time.time() - t_start) / 100
            t_start = time.time()
            print(f"[{swin_mgr}] it {it}: loss={float(m.loss):.5f} "
                  f"psnr={float(m.psnr):.2f} active={int(m.n_active)} "
                  f"dup={int(m.num_dup)}/{box.settings.k_dup} "
                  f"{dt * 1000:.0f}ms/it")
            if tb_writer:
                tb_writer.add_scalar("iter_time", dt * 1000, it)

        if it in args.test_iterations:
            _eval_report(state, scene, swin_mgr, box.eval, bg,
                         model_cfg.sh_degree, it, model_cfg.model_path,
                         tb_writer=tb_writer,
                         log_gt=it == min(args.test_iterations))

        if it in args.save_iterations:
            gs_lib.save_ply(
                state.im,
                os.path.join(model_cfg.model_path,
                             f"point_cloud/iteration_{it}/point_cloud.ply"))

        if ckpt_dir and it in args.checkpoint_iterations:
            path = os.path.join(
                ckpt_dir, f"chkpnt_{swin_mgr.frame_start}_{it}.npz")
            ckpt_lib.save_pytree(path, {"state": state, "adam": adam},
                                 meta={"iteration": it,
                                       "swin": swin_mgr.state_dump()})
            print(f"saved checkpoint {path}")
    return state, adam, key


def _eval_report(state, scene, swin_mgr, eval_step, bg, sh_degree, it,
                 model_path, tb_writer=None, log_gt=False):
    cams = scene.get_test_cams_at(swin_mgr.all_frames())
    if not cams:
        return
    psnr_per_frame = {}
    l1s, psnrs = [], []
    for vi, cam_obj in enumerate(cams):
        camera, gt = cam_obj.load()
        img, l1, p = eval_step(state, camera, jnp.asarray(gt), bg,
                               jnp.asarray(float(cam_obj.frame)), sh_degree)
        l1s.append(float(l1))
        psnrs.append(float(p))
        psnr_per_frame.setdefault(cam_obj.frame, []).append(float(p))
        if tb_writer and vi < 5:
            # up-to-5 view renders + one-time GT (train_swin.py:87-91)
            tb_writer.add_image(f"test_view_{cam_obj.image_name}/render",
                                np.clip(np.asarray(img), 0, 1), it,
                                dataformats="HWC")
            if log_gt:
                tb_writer.add_image(
                    f"test_view_{cam_obj.image_name}/ground_truth",
                    np.clip(np.asarray(gt), 0, 1), it, dataformats="HWC")
    print(f"\n[ITER {it}] Evaluating test: L1 {np.mean(l1s):.5f} "
          f"PSNR {np.mean(psnrs):.2f}")
    # per-frame PSNR dump (train_swin.py:99-101)
    with open(os.path.join(model_path, "psnr.txt"), "a") as f:
        for frame, ps in sorted(psnr_per_frame.items()):
            f.write(f"\n[ITER {it} FRAME {frame}] eval test PSNR "
                    f"{np.mean(ps)}")
    if tb_writer:
        tb_writer.add_scalar("test/loss_viewpoint - l1_loss",
                             float(np.mean(l1s)), it)
        tb_writer.add_scalar("test/loss_viewpoint - psnr",
                             float(np.mean(psnrs)), it)
        # immature-pool histograms (train_swin.py:107-115): opacity plus
        # the norms of xyz and the rigid-motion parameters
        alive = np.asarray(state.im.alive_mask)
        def _norm(x):
            return np.linalg.norm(np.asarray(x)[alive], axis=-1)
        tb_writer.add_histogram(
            "scene/opacity_histogram",
            np.asarray(state.im.get_opacity())[:, 0][alive], it)
        tb_writer.add_histogram("scene/xyz_histogram",
                                _norm(state.im.xyz), it)
        tb_writer.add_histogram("scene/rigid_v_histogram",
                                _norm(state.rigid_v), it)
        tb_writer.add_histogram("scene/rigid_rotvec_histogram",
                                _norm(state.rigid_rotvec), it)
        tb_writer.add_histogram("scene/rigid_rotcen_histogram",
                                _norm(state.rigid_rotcen), it)
        tb_writer.add_scalar("total_points", int(state.im.n_alive), it)


def training(model_cfg: ModelConfig, opt: OptimizationConfig,
             pipe: PipelineConfig, args):
    os.makedirs(model_cfg.model_path, exist_ok=True)
    save_cfg_args(model_cfg.model_path, args)
    dump_path = os.path.join(model_cfg.model_path, "streamable.dat")
    if os.path.exists(dump_path):
        os.remove(dump_path)
    print(f"Streamable dump path: {dump_path}")

    scene = DynamicScene(model_cfg.source_path, model_cfg.model_path,
                         eval_split=model_cfg.eval,
                         resolution=model_cfg.resolution,
                         init_type=model_cfg.init_type,
                         num_pts=model_cfg.init_pts,
                         max_frame=model_cfg.max_frame,
                         min_frame=model_cfg.min_frame)
    # the window operates in REBASED frame space (frames min_frame..max_frame
    # load as 0..num_frames-1; reference scene/__init__.py:167-168 +
    # camera_utils.py:92)
    swin_mgr = SliWinManager(args.swin_size, scene.num_frames,
                             MAX_FRAME_IN_MEMORY)

    capacity = model_cfg.cap_max
    n_init = min(scene.info.points.shape[0], capacity)
    state = swin.create_from_points(
        scene.info.points[:n_init], scene.info.colors[:n_init], capacity,
        model_cfg.sh_degree, max_lifespan=args.swin_size,
        buffer_size=capacity, deform=args.deform)
    adam = optim.init(state.params())

    first_iter = 0
    if args.start_checkpoint:
        tree, meta = ckpt_lib.load_pytree(args.start_checkpoint,
                                          {"state": state, "adam": adam})
        state, adam = tree["state"], tree["adam"]
        swin_mgr.state_load(meta["swin"])
        first_iter = meta["iteration"]
        print(f"Checkpoint {first_iter} of {swin_mgr} loaded")

    settings = make_settings(pipe, 2 * capacity)
    args._dup_high_water = 0
    args._dup_budget = settings.k_dup

    arap_w = (0.1, 0.1, 0.1) if getattr(args, "enable_arap", False) else None

    n_dp = getattr(args, "data_parallel", 1)

    def build_steps(s):
        if n_dp > 1:
            from gsplat_tpu.parallel.mesh import make_mesh
            from gsplat_tpu.parallel.swin_dp import make_dp_swin_train_step

            step = make_dp_swin_train_step(make_mesh(n_dp), opt, s,
                                           scene.cameras_extent)
            grad = apply = None  # dp keeps the fused step (see loop)
        else:
            step = sstep.make_swin_train_step(opt, s, scene.cameras_extent,
                                              arap_weights=arap_w)
            grad = sstep.make_swin_grad_step(opt, s, scene.cameras_extent)
            apply = sstep.make_swin_apply_step(opt, scene.cameras_extent)
        return (step, sstep.make_swin_densify_step(capacity, args.swin_size),
                sstep.make_swin_eval_step(s), grad, apply)

    box = StepBox(build_steps, settings)
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(model_cfg.model_path)
    except ImportError:
        print("Tensorboard not available: not logging progress")
        tb_writer = None
    bg = jnp.asarray([1.0, 1.0, 1.0] if model_cfg.white_background
                     else [0.0, 0.0, 0.0])
    key = jax.random.PRNGKey(0)

    genesis = swin_mgr.frame_start == 0
    state, adam, key = train_slide_window(
        state, adam, scene, swin_mgr, box, model_cfg, opt, args,
        bg, key, genesis=genesis, first_iter=first_iter,
        ckpt_dir=model_cfg.model_path, tb_writer=tb_writer)

    if args.first_frame_only:
        state, adam = mature_rest(state, adam, dump_path, model_cfg.sh_degree)
        return state
    if genesis:
        state = swin.decay_genesis(state)
    swin_mgr.tick()

    while swin_mgr.frame_end <= swin_mgr.max_frame:
        state, adam = evolve(state, adam, swin_mgr, dump_path,
                             model_cfg.sh_degree)
        state, adam, key = train_slide_window(
            state, adam, scene, swin_mgr, box, model_cfg, opt, args,
            bg, key, genesis=False, ckpt_dir=model_cfg.model_path,
            tb_writer=tb_writer)
        print(f"retiring frame #{swin_mgr.frame_start}")
        swin_mgr.tick()

    state, adam = mature_rest(state, adam, dump_path, model_cfg.sh_degree)
    return state


def main(argv=None):
    parser = argparse.ArgumentParser(description="SwinGS training parameters")
    add_config_args(parser, ModelConfig())
    add_config_args(parser, OptimizationConfig())
    add_config_args(parser, PipelineConfig())
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[1000, 5000, 10000, 15000, 20000, 25000,
                                 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--swin_size", type=int, default=10)
    parser.add_argument("--first_frame_only", action="store_true")
    parser.add_argument("--deform", action="store_true")
    parser.add_argument("--enable_arap", action="store_true",
                        help="ARAP rigidity regularizer over the immature "
                             "KNN graph (reference ships this gated off)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="camera-batch data parallelism: one window "
                             "(camera, frame) sample per device, gradients "
                             "psum-averaged over the mesh")
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    random.seed(314159)
    model_cfg = extract_config(args, ModelConfig)
    opt = extract_config(args, OptimizationConfig)
    pipe = extract_config(args, PipelineConfig)
    print("Optimizing " + model_cfg.model_path)
    if args.detect_anomaly or pipe.debug or args.debug_from == 0:
        import jax

        jax.config.update("jax_debug_nans", True)
    state = training(model_cfg, opt, pipe, args)
    print("\nTraining complete.")
    return state


if __name__ == "__main__":
    main()
