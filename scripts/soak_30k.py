"""Full-default 30k-iteration training soak on the real TPU (round-3
verdict ask #6 — gate-#2 shape).

Runs the COMPLETE reference default schedule (arguments/__init__.py:76-110:
iterations=30_010, densify [500, 25_000] every 100, exponential xyz LR over
30k, SH ramp every 1000, regs 1e-4, noise_lr 5e4) on a procedural
Lego-scale scene (cap 100k, 800x800, held-out eval views) — catching
long-run drift (LR decay tail, budget tighten phase, post-densify
stability) that the 3-window bench cannot see.

Also dumps trained-scene statistics (opacity/log-scale/position quantiles
of the final model) to tests/fixtures/trained_stats.npz — bench.py's
1M-cap stage samples from these so its workload triggers realistic
early-exit/saturation instead of the adversarial random cloud (round-3
verdict weak #4).

Run on the TPU host:  python scripts/soak_30k.py [--iterations N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_STATS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "trained_stats.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=30_010)
    ap.add_argument("--stats_out", type=str, default=OUT_STATS)
    ap.add_argument("--report_every", type=int, default=1000)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_scene, _orbit_cameras
    from bench import probe_k_dup
    from gsplat_tpu.model import gaussians, optim
    from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
    from gsplat_tpu.train import step as step_lib
    from gsplat_tpu.train.config import OptimizationConfig
    from gsplat_tpu.train.train_static import next_dup_budget

    on_cpu = jax.default_backend() == "cpu"
    p_gt, cap, w, h = ((500, 1000, 128, 128) if on_cpu
                       else (20_000, 100_000, 800, 800))
    sh_max = 3
    bg = jnp.zeros(3)
    rng = np.random.default_rng(0)

    # ---- GT: a 24-camera capture-rig orbit of a procedural scene;
    #      cameras 0,8,16 held out for eval ----
    gt_scene = _make_scene(p_gt, sh_max, seed=5)
    cams = _orbit_cameras(24, w, h)
    settings = RasterizeSettings(k_dup=1 << 15 if on_cpu else 1 << 20,
                                 tile_x=64, tile_y=16, chunk=128,
                                 interpret=on_cpu)
    chw = dataclasses.replace(settings, layout="chw")
    render_gt = jax.jit(lambda c: rasterize(*gt_scene, c, sh_max, bg,
                                            chw).image)
    gts = [render_gt(c) for c in cams]
    jax.block_until_ready(gts[-1])
    # train steps consume CHW; the eval step compares in HWC
    gts_hwc = [jnp.transpose(g, (1, 2, 0)) for g in gts]
    test_idx = {0, 8, 16}
    train_ids = [i for i in range(len(cams)) if i not in test_idx]

    # MCMC starts from a small alive set and grows 5%/interval to cap.
    # Init the cloud INSIDE the GT volume (_make_scene puts content at
    # x,y in [-1.2,1.2], z in [2,6]): the reference's random init draws
    # from the camera-extent cube around the scene for the same reason
    # (dataset_readers.py:180-182).
    n0 = cap // 20
    pts0 = rng.uniform(-1.2, 1.2, (n0, 3)).astype(np.float32)
    pts0[:, 2] = rng.uniform(2.0, 6.0, n0).astype(np.float32)
    state = gaussians.create_from_points(
        pts0, rng.uniform(0, 1, (n0, 3)).astype(np.float32),
        capacity=cap, max_sh_degree=sh_max)
    adam = optim.init(state.params())

    opt = OptimizationConfig()  # reference defaults
    probe = jax.jit(lambda st, c, s: rasterize(
        st.xyz, st.get_scaling(), st.get_rotation(), st.get_opacity()[:, 0],
        st.get_features(), c, sh_max, bg, s,
        alive=st.alive_mask).num_dup, static_argnames="s")
    # generous initial headroom: demand grows ~20x as the model densifies
    # from n0 to cap, and every x1.5 budget growth costs a ~40-60 s XLA
    # recompile on this remote-compile setup — start high, let the policy
    # tighten after densification ends
    need = max(int(probe(state, cams[i], settings)) for i in train_ids[:8])
    settings = dataclasses.replace(
        settings, k_dup=probe_k_dup(need, settings.chunk, headroom=8.0,
                                    floor=1 << 19))

    def build(s):
        return step_lib.make_train_step(opt, s, spatial_lr_scale=4.0)

    train_step = build(settings)
    densify_step = step_lib.make_densify_step(cap)
    # eval gets its OWN fixed budget: retying it to the adaptive training
    # budget recompiled the eval program on every budget change (XLA
    # remote compiles run minutes under load — observed 2-6 min each on
    # 2026-08-20 — and cost nothing to avoid)
    eval_step = step_lib.make_eval_step(
        dataclasses.replace(settings, k_dup=1 << 15 if on_cpu else 1 << 21))
    key = jax.random.PRNGKey(0)
    iters = args.iterations
    recompiles = 0
    dup_peak, dup_tightened = 0, False
    stack = []
    eval_log = []
    t0 = time.time()
    t_win = t0
    print(f"soak: cap {cap}, {w}x{h}, {iters} iterations, "
          f"k_dup {settings.k_dup}", flush=True)
    for it in range(1, iters + 1):
        sh_degree = min(it // 1000, sh_max)
        if not stack:
            stack = list(train_ids)
        ci = stack.pop(int(rng.integers(len(stack))))
        key, ks = jax.random.split(key)
        state, adam, m = train_step(state, adam, ks, cams[ci], gts[ci], bg,
                                    jnp.asarray(float(it)), sh_degree)
        if (opt.densify_from_iter < it < opt.densify_until_iter
                and it % opt.densification_interval == 0):
            key, kd = jax.random.split(key)
            state, adam = densify_step(state, adam, kd)
        if it % 100 == 0:
            loss = float(m.loss)
            assert np.isfinite(loss), f"non-finite loss at iter {it}"
            num_dup = int(m.num_dup)
            if num_dup > settings.k_dup:
                print(f"  WARNING overflow {num_dup} > {settings.k_dup}")
            new_k, dup_peak, dup_tightened = next_dup_budget(
                num_dup, settings.k_dup, it, dup_peak, dup_tightened,
                opt.densify_until_iter, settings.chunk)
            # Soak-only recompile damping (XLA remote compiles measured
            # 2-6 min EACH on 2026-08-20): take growth in x2 jumps and
            # skip shrink suggestions while demand is still densifying —
            # the stock policy's behavior is exercised by the trainers/CI;
            # this run's goal is the 30k schedule, not budget churn.
            if new_k is not None and new_k < settings.k_dup \
                    and it < opt.densify_until_iter:
                new_k = None
            if new_k is not None and new_k > settings.k_dup:
                new_k = -(-new_k * 2 // settings.chunk) * settings.chunk
            if new_k is not None:
                settings = dataclasses.replace(settings, k_dup=new_k)
                train_step = build(settings)
                recompiles += 1
                print(f"  [it {it}] budget -> {new_k} (recompile "
                      f"#{recompiles})", flush=True)
        if it % args.report_every == 0 or it == iters:
            if it >= 2000:
                # incremental stats dump: a killed run still leaves the
                # latest trained distribution behind
                _dump_stats(state, args.stats_out,
                            f"soak_30k cap={cap} it={it} (incremental)")
            psnrs = [float(eval_step(state, cams[i], gts_hwc[i], bg,
                                     sh_degree)[2]) for i in test_idx]
            dt = time.time() - t_win
            t_win = time.time()
            eval_log.append({"it": it, "psnr": round(float(np.mean(psnrs)),
                                                     2),
                             "n_alive": int(state.n_alive),
                             "dup": int(m.num_dup), "k_dup": settings.k_dup,
                             "ms_it": round(dt / args.report_every * 1000,
                                            2)})
            print(f"[it {it}] loss={float(m.loss):.5f} "
                  f"psnr={np.mean(psnrs):.2f} n={int(state.n_alive)} "
                  f"dup={int(m.num_dup)}/{settings.k_dup} "
                  f"{dt / args.report_every * 1000:.1f}ms/it", flush=True)

    wall = time.time() - t0
    final = eval_log[-1]
    print(json.dumps({"soak_iterations": iters,
                      "wall_minutes": round(wall / 60, 2),
                      "final_psnr": final["psnr"],
                      "recompiles": recompiles,
                      "dup_peak": dup_peak,
                      "final_k_dup": settings.k_dup,
                      "eval_log": eval_log}))

    # ---- trained-scene statistics for the 1M bench workload ----
    _dump_stats(state, args.stats_out,
                f"soak_30k cap={cap} iters={iters} psnr={final['psnr']}")
    print(f"wrote {args.stats_out}")


def _dump_stats(state, path: str, source: str) -> None:
    alive = np.asarray(state.alive_mask)
    opac = np.asarray(state.get_opacity())[:, 0][alive]
    logscale = np.asarray(state.scaling)[alive]       # [N,3] log-scales
    xyz = np.asarray(state.xyz)[alive]
    q = np.linspace(0, 1, 257)
    # per-gaussian SORTED log-scale triples, each sorted column quantiled
    # separately: sampling one quantile u per gaussian and reading the
    # [u, :] row reproduces the joint (anisotropy-correlated) distribution
    # of per-gaussian scale triples, not just the pooled marginal
    # (round-4 advisor finding: independent marginal draws destroy the
    # anisotropy correlation the 1M workload exists to model)
    triples = np.sort(logscale, axis=1)               # [N,3] ascending
    sorted_triple_q = np.stack(
        [np.quantile(triples[:, i], q) for i in range(3)],
        axis=1).astype(np.float32)                    # [257, 3]
    # position subsample: clustered-layout workloads bootstrap-resample
    # these real converged positions instead of a uniform cloud
    rng = np.random.default_rng(0)
    n_pos = min(len(xyz), 50_000)
    xyz_sample = xyz[rng.choice(len(xyz), n_pos, replace=False)]
    np.savez_compressed(
        path,
        opacity_quantiles=np.quantile(opac, q).astype(np.float32),
        logscale_quantiles=np.quantile(logscale.reshape(-1),
                                       q).astype(np.float32),
        logscale_sorted_quantiles=sorted_triple_q,
        # per-gaussian anisotropy: spread of the 3 log-scales
        aniso_quantiles=np.quantile(logscale.max(1) - logscale.min(1),
                                    q).astype(np.float32),
        xyz_std=xyz.std(0).astype(np.float32),
        xyz_sample=xyz_sample.astype(np.float32),
        n_alive=np.int64(alive.sum()),
        source=np.bytes_(source))


if __name__ == "__main__":
    main()
