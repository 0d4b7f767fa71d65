"""Sliding-window long-run soak on real hardware (round-4 verdict ask #5)
— the swin analogue of scripts/soak_30k.py.

run_exp1-scale window machinery end to end on the chip
(/root/reference/run_exp1.sh:8-13: actorshq, cap 200k, swin 4-20, 160-220
frames): genesis -> decay_genesis -> per-window training with deformable
render -> evolve (mature + stream dump to streamable.dat + rollover) over
40+ frames -> mature_rest, then playback of the dumped stream frame by
frame (eval/render_stream) scored against the procedural dynamic GT.

GT is procedural (zero-egress environment, no dataset on disk): a
100k-gaussian target scene whose per-gaussian rigid motion
(v/rotvec/rotcen, core/quaternion.rigid_deform — exec-parity-tested
against tempo_utils.py:51-84) is integrated per frame and rasterized per
(frame, camera) as the window slides.

Reports: wall time, per-window ms/it drift, matured/streamed counts,
stream file size, budget regrows, playback PSNR per frame band.

Run on the TPU host:  python scripts/soak_swin.py [--frames N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=44)
    ap.add_argument("--swin_size", type=int, default=8)
    ap.add_argument("--cap", type=int, default=200_000)
    ap.add_argument("--genesis_iters", type=int, default=500)
    ap.add_argument("--window_iters", type=int, default=150)
    ap.add_argument("--out", type=str, default="/tmp/soak_swin")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from __graft_entry__ import _make_scene, _orbit_cameras
    from bench import probe_k_dup
    from gsplat_tpu.core.quaternion import rigid_deform
    from gsplat_tpu.model import optim, swin
    from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
    from gsplat_tpu.train import swin_step as sstep
    from gsplat_tpu.train.config import OptimizationConfig
    from gsplat_tpu.train.train_swin import StepBox, evolve, mature_rest
    from gsplat_tpu.utils.stream import SliWinManager

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        args.cap, args.frames = 2000, 12
        args.swin_size = min(args.swin_size, 8)
        args.genesis_iters, args.window_iters = 60, 30
        w, h, p_gt, n_cams = 160, 96, 800, 3
    else:
        w, h, p_gt, n_cams = 1280, 720, 100_000, 4
    sh = 1
    bg = jnp.zeros(3)
    rng = np.random.default_rng(0)
    os.makedirs(args.out, exist_ok=True)
    dump_path = os.path.join(args.out, "streamable.dat")
    if os.path.exists(dump_path):
        os.remove(dump_path)

    # --- procedural dynamic GT: target scene + per-gaussian rigid motion
    gt_means, gt_scales, gt_quats, gt_opa, gt_shs = _make_scene(
        p_gt, sh, seed=1)
    moving = rng.random(p_gt) < 0.5
    gt_v = np.zeros((p_gt, 3), np.float32)
    gt_rotvec = np.zeros((p_gt, 3), np.float32)
    gt_rotcen = np.zeros((p_gt, 3), np.float32)
    gt_v[moving] = rng.normal(0, 0.008, (int(moving.sum()), 3))
    gt_rotvec[moving] = rng.normal(0, 0.01, (int(moving.sum()), 3))
    gt_rotcen[moving] = np.asarray(gt_means)[moving] + rng.normal(
        0, 0.3, (int(moving.sum()), 3))
    cams = _orbit_cameras(n_cams, w, h)
    chunk = 128
    settings = RasterizeSettings(k_dup=1 << (15 if on_cpu else 20),
                                 tile_x=16 if on_cpu else 64, tile_y=16,
                                 chunk=chunk, interpret=on_cpu,
                                 layout="chw")

    @jax.jit
    def gt_render(cam, frame):
        mv, q = rigid_deform(gt_means, gt_quats, jnp.asarray(gt_v),
                             jnp.asarray(gt_rotvec), jnp.asarray(gt_rotcen),
                             frame)
        return rasterize(mv, gt_scales, q, gt_opa, gt_shs, cam, sh, bg,
                         settings).image

    gt_cache = {}

    def gt_at(frame, ci):
        k = (frame, ci)
        if k not in gt_cache:
            gt_cache[k] = gt_render(cams[ci], jnp.asarray(float(frame)))
            if len(gt_cache) > 80:  # bound device memory
                gt_cache.pop(next(iter(gt_cache)))
        return gt_cache[k]

    # --- model + window machinery ---
    state = swin.create_from_points(
        rng.uniform(-1, 1, (args.cap, 3)).astype(np.float32),
        rng.uniform(0, 1, (args.cap, 3)).astype(np.float32),
        capacity=args.cap, max_sh_degree=sh, max_lifespan=args.swin_size,
        buffer_size=args.cap, deform=True)
    adam = optim.init(state.params())
    swin_mgr = SliWinManager(args.swin_size, args.frames, 10)
    opt = OptimizationConfig()
    key = jax.random.PRNGKey(0)

    # probe the initial duplicate load at frame 0
    probe = jax.jit(lambda st, c: rasterize(
        *(lambda kw: (kw["means3d"], kw["scales"], kw["quats"],
                      kw["opacities"], kw["shs"]))(
            swin.union_params_at(st, jnp.asarray(0.0))),
        c, sh, bg, settings,
        alive=swin.union_params_at(st, jnp.asarray(0.0))["alive"]).num_dup)
    need = max(int(probe(state, c)) for c in cams)
    settings = dataclasses.replace(
        settings, k_dup=probe_k_dup(need, chunk, headroom=1.25))
    print(f"swin soak: cap {args.cap}, {args.frames} frames, swin "
          f"{args.swin_size}, {w}x{h}, dup budget {settings.k_dup} "
          f"(probe {need})", flush=True)

    def build_steps(s):
        step = sstep.make_swin_train_step(opt, s, 4.0)
        grad = sstep.make_swin_grad_step(opt, s, 4.0)
        apply_ = sstep.make_swin_apply_step(opt, 4.0)
        return (step, sstep.make_swin_densify_step(args.cap,
                                                   args.swin_size),
                sstep.make_swin_eval_step(s), grad, apply_)

    box = StepBox(build_steps, settings)
    regrows = 0
    window_stats = []

    def run_window(genesis):
        nonlocal state, adam, key, regrows
        total = args.genesis_iters if genesis else args.window_iters
        frames_in_window = list(swin_mgr.sampled_frames())
        t0 = time.time()
        m = None
        for it in range(1, total + 1):
            f = frames_in_window[int(rng.integers(len(frames_in_window)))]
            ci = int(rng.integers(n_cams))
            key, k_step = jax.random.split(key)
            it_f = jnp.asarray(float(it))
            frame_f = jnp.asarray(float(f))
            densify_now = (
                (opt.densify_from_iter < it < opt.densify_until_iter
                 and it % opt.densification_interval == 0)
                or (not genesis and 0 < it < opt.densify_until_iter
                    and it % opt.densification_interval == 0))
            if densify_now:
                grads, m = box.grad(state, cams[ci], gt_at(f, ci), bg,
                                    frame_f, sh)
                key, kd = jax.random.split(key)
                state, adam = box.densify(
                    state, adam, kd,
                    jnp.asarray(float(swin_mgr.frame_start)), genesis)
                key, kn = jax.random.split(key)
                state, adam = box.apply(state, adam, grads, kn, it_f,
                                        frame_f, jnp.asarray(False))
            else:
                state, adam, m = box.train(state, adam, k_step, cams[ci],
                                           gt_at(f, ci), bg, it_f, frame_f,
                                           sh)
            if it % 10 == 0 and box.maybe_grow(int(m.num_dup),
                                               settings.chunk):
                regrows += 1
        jax.block_until_ready(m.loss)
        dt = (time.time() - t0) * 1000 / total
        window_stats.append({
            "window": str(swin_mgr), "genesis": genesis,
            "ms_per_iter": round(dt, 1), "loss": round(float(m.loss), 5),
            "n_active": int(m.n_active), "num_dup": int(m.num_dup),
            "k_dup": box.settings.k_dup})
        print(f"[{swin_mgr}] {dt:.1f} ms/it loss={float(m.loss):.5f} "
              f"active={int(m.n_active)} dup={int(m.num_dup)}/"
              f"{box.settings.k_dup}", flush=True)

    t_start = time.time()
    run_window(genesis=True)
    state = swin.decay_genesis(state)
    swin_mgr.tick()
    while swin_mgr.frame_end <= swin_mgr.max_frame:
        state, adam = evolve(state, adam, swin_mgr, dump_path, sh)
        run_window(genesis=False)
        swin_mgr.tick()
    state, adam = mature_rest(state, adam, dump_path, sh)
    wall = time.time() - t_start

    # --- playback: stream -> render per frame vs procedural GT ---
    from gsplat_tpu.eval.render_stream import (load_stream_state,
                                               render_stream_frame)

    data = load_stream_state(args.out)
    psnrs = []
    pb_cam = cams[0]
    pb_settings = dataclasses.replace(box.settings, layout="hwc")
    for f in range(0, args.frames, max(args.frames // 8, 1)):
        img = np.asarray(render_stream_frame(
            data, pb_cam, float(f), bg, pb_settings))
        gt = np.asarray(gt_at(f, 0))
        gt_hwc = np.transpose(gt, (1, 2, 0))
        mse = np.mean((np.clip(img, 0, 1) - np.clip(gt_hwc, 0, 1)) ** 2)
        psnrs.append((f, float(-10 * np.log10(mse + 1e-12))))

    ms_list = [ws["ms_per_iter"] for ws in window_stats if not ws["genesis"]]
    print(json.dumps({
        "frames": args.frames,
        "wall_minutes": round(wall / 60, 2),
        "genesis_ms_per_iter": window_stats[0]["ms_per_iter"],
        "window_ms_first": ms_list[0] if ms_list else None,
        "window_ms_last": ms_list[-1] if ms_list else None,
        "window_ms_median": float(np.median(ms_list)) if ms_list else None,
        "stream_bytes": os.path.getsize(dump_path),
        "stream_records": int(data["xyz"].shape[0]),
        "budget_regrows": regrows,
        "playback_psnr": psnrs,
        "windows": window_stats,
    }))


if __name__ == "__main__":
    main()
