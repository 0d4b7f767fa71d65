"""Densify-in-the-loop at cap 1M on real hardware (round-4 verdict ask #3).

The bench's 1M stage times steady-state steps with densification never
invoked; scripts/pshard_densify_cost.py timed densify only in isolation.
This script is the missing correctness/stability proof at gate-#3 scale:
start ~500k alive on the trained-statistics workload, run the full MCMC
cycle IN the loop — relocation of dead rows (the trained opacity
distribution has mass below the 0.005 death threshold, so relocation fires
at ~10^4-10^5 rows per call), 5% growth to the 1M cap, covariance noise —
every densification_interval for ~1.6k iterations, with the trainer's real
interleave (backward -> densify -> Adam-skip -> noise, train_static.py
order) and the adaptive duplicate-budget policy.

Reports: amortized ms/it (densify iterations included), per-window step
time, loss/PSNR trend, alive growth, dup budget behavior, recompile count.
Reference scale anchor: full_eval.py:41-52 trains garden at cap 1M for 30k
iters with this schedule (relocation+growth every 100, train_static.py:122-125).

Run on the TPU host:  python scripts/densify_1m_loop.py [--iterations N]
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
    ap.add_argument("--iterations", type=int, default=1600)
    ap.add_argument("--start_alive", type=int, default=500_000)
    ap.add_argument("--cap", type=int, default=1_000_000)
    ap.add_argument("--interval", type=int, default=100)
    ap.add_argument("--positions", type=str, default="uniform",
                    choices=["uniform", "clustered"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS=cpu; must be set before backend "
                         "init)")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _make_scene, _orbit_cameras
    from bench import probe_k_dup, trained_stats_state
    from gsplat_tpu.model import optim
    from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
    from gsplat_tpu.train import step as step_lib
    from gsplat_tpu.train.config import OptimizationConfig
    from gsplat_tpu.train.train_static import next_dup_budget

    on_cpu = jax.default_backend() == "cpu"
    if on_cpu:
        args.cap, args.start_alive = 4000, 2000
        args.iterations = min(args.iterations, 300)
        w, h, p_gt = 160, 96, 1000
    else:
        w, h, p_gt = 1296, 840, 100_000
    sh = 1
    bg = jnp.zeros(3)
    rng = np.random.default_rng(0)

    state, src = trained_stats_state(args.cap, sh, rng,
                                     positions=args.positions)
    state = dataclasses.replace(
        state, n_alive=jnp.asarray(args.start_alive, jnp.int32))
    print(f"workload: {src}; start {args.start_alive} alive / cap "
          f"{args.cap}", flush=True)
    opa = np.asarray(state.get_opacity())[:, 0][: args.start_alive]
    print(f"initial dead fraction (opacity<=0.005): "
          f"{float((opa <= 0.005).mean()):.3f}")

    gt_scene = _make_scene(p_gt, sh, seed=3)
    cams = _orbit_cameras(4, w, h)
    opt = OptimizationConfig()
    chunk = 128
    settings = RasterizeSettings(k_dup=1 << (15 if on_cpu else 21),
                                 tile_x=16 if on_cpu else 64, tile_y=16,
                                 chunk=chunk, interpret=on_cpu,
                                 layout="chw")
    gt_render = jax.jit(lambda c: rasterize(*gt_scene, c, sh, bg,
                                            settings).image)
    gts = [gt_render(c) for c in cams]
    jax.block_until_ready(gts[-1])

    # initial budget: probe the start state, then keep the trainer's
    # adaptive policy as the model grows
    probe = jax.jit(lambda st, c: rasterize(
        st.xyz, st.get_scaling(), st.get_rotation(),
        st.get_opacity()[:, 0], st.get_features(), c, sh, bg, settings,
        alive=st.alive_mask).num_dup)
    need = max(int(probe(state, c)) for c in cams)
    settings = dataclasses.replace(settings,
                                   k_dup=probe_k_dup(int(need * 1.3), chunk))
    print(f"initial dup budget {settings.k_dup} (probe {need})")

    def build(s):
        return (step_lib.make_train_step(opt, s, 4.0),
                step_lib.make_grad_step(opt, s, 4.0),
                step_lib.make_apply_step(opt, 4.0),
                step_lib.make_densify_step(args.cap))

    train_step, grad_step, apply_step, densify_step = build(settings)
    adam = optim.init(state.params())
    key = jax.random.PRNGKey(0)

    recompiles = 0
    dup_peak, dup_tightened = 0, False
    window_ms, losses, alive_log, densify_ms = [], [], [], []
    t_win = time.time()
    t_start = time.time()
    for it in range(1, args.iterations + 1):
        key, k_step = jax.random.split(key)
        cam_i = (it - 1) % len(cams)
        densify_now = (it % args.interval == 0
                       and it > args.interval - 1)
        if densify_now:
            grads, m = grad_step(state, cams[cam_i], gts[cam_i], bg, sh)
            n = int(state.n_alive)
            tgt = min(args.cap, int(1.05 * n))
            dead_any = bool(jnp.any(
                state.alive_mask
                & (state.get_opacity()[:, 0] <= 0.005)))
            surgery = dead_any or tgt > n
            key, kd = jax.random.split(key)
            t0 = time.time()
            state, adam = densify_step(state, adam, kd)
            jax.block_until_ready(state.xyz)
            densify_ms.append((time.time() - t0) * 1000)
            key, kn = jax.random.split(key)
            state, adam = apply_step(state, adam, grads, kn,
                                     jnp.asarray(float(it)),
                                     jnp.asarray(not surgery))
        else:
            state, adam, m = train_step(state, adam, k_step, cams[cam_i],
                                        gts[cam_i], bg,
                                        jnp.asarray(float(it)), sh)
        if it % 20 == 0:
            num_dup = int(m.num_dup)
            new_k, dup_peak, dup_tightened = next_dup_budget(
                num_dup, settings.k_dup, it, dup_peak, dup_tightened,
                densify_until_iter=args.iterations, chunk=chunk)
            if new_k is not None:
                settings = dataclasses.replace(settings, k_dup=new_k)
                print(f"  [it {it}] dup budget -> {new_k} (recompiling, "
                      f"num_dup {num_dup})", flush=True)
                train_step, grad_step, apply_step, densify_step = build(
                    settings)
                recompiles += 1
        if it % 100 == 0:
            jax.block_until_ready(m.loss)
            dt = (time.time() - t_win) * 1000 / 100
            t_win = time.time()
            window_ms.append(dt)
            losses.append(float(m.loss))
            alive_log.append(int(state.n_alive))
            print(f"[it {it}] loss={float(m.loss):.5f} "
                  f"psnr={float(m.psnr):.2f} n={int(state.n_alive)} "
                  f"dup={int(m.num_dup)}/{settings.k_dup} {dt:.1f}ms/it "
                  f"(densify {densify_ms[-1] if densify_ms else 0:.0f}ms)",
                  flush=True)

    assert all(np.isfinite(l) for l in losses), losses
    wall = time.time() - t_start
    # steady-state comparison: windows after the cap is reached
    capped = [m for m, a in zip(window_ms, alive_log) if a >= args.cap]
    print(json.dumps({
        "iterations": args.iterations,
        "wall_minutes": round(wall / 60, 2),
        "amortized_ms_per_iter": round(wall * 1000 / args.iterations, 1),
        "window_ms": [round(x, 1) for x in window_ms],
        "densify_ms": [round(x, 1) for x in densify_ms],
        "losses": [round(x, 5) for x in losses],
        "alive": alive_log,
        "recompiles": recompiles,
        "final_k_dup": settings.k_dup,
        "capped_window_ms": round(float(np.mean(capped)), 1) if capped
        else None,
    }))


if __name__ == "__main__":
    main()
