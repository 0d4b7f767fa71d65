"""Trainer-LOOP exec-parity against the reference's own training loop
(round-3 verdict ask #1 — the last unproven layer of the 0.1 dB north
star).

tests/run_reference_trainer.py executes /root/reference/train_static.py's
``training()`` (torch CPU) with its two CUDA extensions shimmed to this
repo's kernels (tests/reference_harness.py): every trainer-loop semantic —
exponential xyz LR schedule composition (gaussian_model_static.py:183-212),
L1+SSIM+reg loss cadence (train_static.py:95-100), MCMC
relocation/add_new_gs every densification_interval
(train_static.py:122-125, gaussian_model_static.py:395-492) with torch
optimizer-state surgery, covariance-shaped noise injection
(train_static.py:132-140) — runs as the reference's own torch code, while
pixels/gradients come from gsplat_tpu.raster.rasterize.

gsplat_tpu.train.train_static then trains on the IDENTICAL dataset and
schedule, and both saved models are evaluated by the same renderer on the
same held-out frame-0 cameras. A held-out PSNR gap between the two runs
can only come from trainer-loop semantics (or RNG stream differences —
the torch and JAX trainers draw camera order, relocation sampling and
noise from different generators, which is the float-source gap documented
in the gate margin below).
"""

import json
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "quality_cudaport_dyn")
ITERS = 250
CAP = 320
K_DUP = 8192
# schedule shared by both trainers (reference flag names == ours)
SCHEDULE = ["--iterations", str(ITERS), "--cap_max", str(CAP),
            "--init_pts", "160", "--init_type", "sfm",
            "--max_frame", "1",
            "--densify_from_iter", "50", "--densify_until_iter", "240",
            "--densification_interval", "50"]


def _psnr(a, b):
    mse = np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2)
    return -10.0 * np.log10(mse + 1e-12)


def _eval_ply(ply_path):
    """Held-out frame-0 PSNR of a saved PLY, via THIS repo's renderer (the
    same eval for both trainers' outputs)."""
    from gsplat_tpu.data.scene import DynamicScene
    from gsplat_tpu.model import gaussians
    from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize

    dyn = DynamicScene(FIXTURE, "", eval_split=True, init_type="sfm",
                       num_pts=8, max_frame=1)
    state = gaussians.load_ply(ply_path, capacity=CAP, max_sh_degree=3)
    settings = RasterizeSettings(k_dup=K_DUP, tile_x=16, tile_y=16,
                                 chunk=128, interpret=True)
    bg = jnp.zeros(3)
    psnrs = []
    for cam_obj in dyn.get_test_cams_at([0]):
        camera, gt = cam_obj.load()
        img = rasterize(state.xyz, state.get_scaling(),
                        state.get_rotation(), state.get_opacity()[:, 0],
                        state.get_features(), camera, 3, bg, settings,
                        alive=state.alive_mask).image
        psnrs.append(_psnr(np.asarray(img), np.asarray(gt)))
    return float(np.mean(psnrs)), psnrs


def test_reference_trainer_through_shims_matches_our_trainer(tmp_path):
    ref_out = str(tmp_path / "ref")
    ours_out = str(tmp_path / "ours")
    os.makedirs(ref_out)

    # --- the reference's own training loop, kernels shimmed to ours ---
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "run_reference_trainer.py"),
         "-s", FIXTURE, "-m", ref_out,
         "--shim_cap", str(CAP), "--shim_k_dup", str(K_DUP),
         "--test_iterations", str(ITERS)] + SCHEDULE,
        env=env, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"reference trainer failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")

    traj = json.load(open(os.path.join(ref_out, "parity_ref.json")))
    losses = [t[2] for t in traj["losses"]]
    assert len(losses) == ITERS
    head, tail = np.mean(losses[:20]), np.mean(losses[-20:])
    assert tail < 0.7 * head, (
        f"reference trainer did not converge through the shims: "
        f"loss {head:.4f} -> {tail:.4f}")

    # --- our trainer, identical dataset + schedule ---
    from gsplat_tpu.train.train_static import main as train_main

    train_main(["-s", FIXTURE, "-m", ours_out, "--frame", "0",
                "--test_iterations", "-1", "--save_iterations", "-1",
                "--dup_budget", str(K_DUP)] + SCHEDULE)

    ref_ply = os.path.join(
        ref_out, f"point_cloud/iteration_{ITERS}/point_cloud.ply")
    ours_ply = os.path.join(
        ours_out, f"point_cloud/iteration_{ITERS}/point_cloud.ply")
    psnr_ref, per_ref = _eval_ply(ref_ply)
    psnr_ours, per_ours = _eval_ply(ours_ply)
    print(f"exec-parity: reference-loop {psnr_ref:.2f} dB "
          f"(views {[f'{p:.2f}' for p in per_ref]}), "
          f"our-loop {psnr_ours:.2f} dB "
          f"(views {[f'{p:.2f}' for p in per_ours]})")

    # absolute floor: both pipelines actually learned the scene
    assert psnr_ref >= 15.0, f"reference-loop PSNR degenerate: {psnr_ref}"
    assert psnr_ours >= 15.0, f"our-loop PSNR degenerate: {psnr_ours}"
    # trajectory agreement gate. Calibrated on CPU (round 4): measured
    # reference-loop 15.97 dB vs our-loop 16.22 dB — a 0.25 dB gap,
    # within the 0.3 dB north-star ask. The two loops draw
    # cameras/relocation/noise from different RNG streams (torch mt19937
    # vs JAX threefry), which at 250 iters on the tiny fixture is the
    # dominant float source — the 1.0 dB gate carries that seed-noise
    # margin so an unlucky stream cannot flake CI, while a real
    # trainer-semantics divergence (wrong LR composition, reg weight,
    # densify cadence) moves PSNR by multiple dB at this scale.
    assert abs(psnr_ref - psnr_ours) <= 1.0, (
        f"trainer-loop divergence: reference-loop {psnr_ref:.2f} dB vs "
        f"our-loop {psnr_ours:.2f} dB")


def test_rng_pinned_replay_parity(tmp_path):
    """RNG-pinned exec-parity (round-4 verdict ask #1): record the
    reference loop's complete stochastic schedule (camera order, relocation
    dead-masks + multinomial template draws, raw noise tensors) while it
    runs through the shims, then REPLAY it verbatim into our trainer via
    --replay_rng. With identical stochasticity the two loops differ only by
    float sources (both pipelines call the same rasterizer kernels; the
    loss/Adam/schedule arithmetic runs in torch vs XLA), so the gates can
    be tight: per-iteration loss trajectory agreement and <= 0.1 dB final
    held-out PSNR — replacing the 1.0 dB seed-noise margin of the unpinned
    test above."""
    ref_out = str(tmp_path / "ref")
    ours_out = str(tmp_path / "ours")
    os.makedirs(ref_out)
    rng_path = os.path.join(ref_out, "rng_schedule.npz")

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "run_reference_trainer.py"),
         "-s", FIXTURE, "-m", ref_out,
         "--shim_cap", str(CAP), "--shim_k_dup", str(K_DUP),
         "--record_rng", rng_path,
         "--test_iterations", str(ITERS)] + SCHEDULE,
        env=env, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"reference trainer failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    assert os.path.exists(rng_path), "recorder produced no schedule file"

    from gsplat_tpu.train.train_static import main as train_main

    train_main(["-s", FIXTURE, "-m", ours_out, "--frame", "0",
                "--test_iterations", "-1", "--save_iterations", "-1",
                "--dup_budget", str(K_DUP),
                # match the shim's rasterizer geometry exactly
                # (reference_harness._make_render_fns: 16x16 tiles)
                "--tile_x", "16", "--tile_y", "16",
                "--replay_rng", rng_path] + SCHEDULE)

    ref_traj = json.load(open(os.path.join(ref_out, "parity_ref.json")))
    ours_traj = json.load(open(os.path.join(ours_out, "parity_ours.json")))
    ref_losses = {it: tot for it, _, tot in ref_traj["losses"]}
    ours_losses = {it: tot for it, _, tot in ours_traj["losses"]}
    assert set(ref_losses) == set(ours_losses)

    # the replayed schedule must stay self-consistent with our state:
    # identical alive counts at every densification, and (near-)identical
    # dead sets — the drift meter for trainer-semantics agreement
    diags = ours_traj["densify_diagnostics"]
    assert diags, "replay recorded no densification diagnostics"
    for d in diags:
        assert d["p_recorded"] == d["p_ours"], (
            f"alive-count drift at iter {d['iteration']}: "
            f"ref {d['p_recorded']} vs ours {d['p_ours']}")
    max_hamming = max(d["dead_hamming"] for d in diags)

    rels = []
    for it in sorted(ref_losses):
        r, o = ref_losses[it], ours_losses[it]
        rels.append(abs(r - o) / max(abs(r), 1e-12))
    rels = np.asarray(rels)
    # float drift compounds through the optimization; report the full
    # profile and gate head/median/final (measured on CPU: see RESULTS.md
    # round-5 exec-parity section)
    head = float(np.max(rels[:20]))
    med = float(np.median(rels))
    print(f"rng-pinned loss agreement: head(max first 20)={head:.2e} "
          f"median={med:.2e} final={rels[-1]:.2e} max={rels.max():.2e} "
          f"dead-mask hamming max={max_hamming}")

    ref_ply = os.path.join(
        ref_out, f"point_cloud/iteration_{ITERS}/point_cloud.ply")
    ours_ply = os.path.join(
        ours_out, f"point_cloud/iteration_{ITERS}/point_cloud.ply")
    psnr_ref, _ = _eval_ply(ref_ply)
    psnr_ours, _ = _eval_ply(ours_ply)
    print(f"rng-pinned exec-parity: reference-loop {psnr_ref:.2f} dB, "
          f"our-loop {psnr_ours:.2f} dB, gap {abs(psnr_ref-psnr_ours):.3f}")

    # gates calibrated from the measured CPU profile (round 5): head(20)
    # 2.5e-6, median 3.8e-6, max 4.1e-4 (float drift compounding through
    # 250 chaotic iterations), hamming 0, final gap 0.048 dB. Margins
    # ~25x on the loss stats, 2x on the PSNR north star.
    assert head <= 1e-4, f"early loss trajectory diverged: {head:.2e}"
    assert med <= 1e-4, f"median loss divergence {med:.2e}"
    assert rels.max() <= 2e-3, f"max loss divergence {rels.max():.2e}"
    assert max_hamming <= 2, f"dead-mask drift: hamming {max_hamming}"
    assert abs(psnr_ref - psnr_ours) <= 0.1, (
        f"RNG-pinned trainer divergence: {psnr_ref:.2f} vs "
        f"{psnr_ours:.2f} dB — exceeds the 0.1 dB north star")


def test_rng_pinned_replay_exercises_relocation(tmp_path):
    """RNG-pinned parity variant that forces the RELOCATION branch: the
    default schedule never produces dead rows on this fixture (opacity
    stays above the 0.005 death threshold for 250 iters even at reg 0.05),
    so the main pinned test proves growth but not dead->template teleport.
    With densification every 25 iters from iter 10 and opacity_reg 0.1,
    repeated template weakening (o -> 1-(1-o)^(1/N)) plus the reg drives
    rows below 0.005 (probed: 6 dead at iter 125, 2 at iter 225), so the
    recorded schedule contains real relocations (dead mask + template
    draws) and the replay must reproduce them exactly."""
    ref_out = str(tmp_path / "ref")
    ours_out = str(tmp_path / "ours")
    os.makedirs(ref_out)
    rng_path = os.path.join(ref_out, "rng_schedule.npz")
    schedule = ["--iterations", str(ITERS), "--cap_max", str(CAP),
                "--init_pts", "160", "--init_type", "sfm",
                "--max_frame", "1", "--opacity_reg", "0.1",
                "--densify_from_iter", "10", "--densify_until_iter", "240",
                "--densification_interval", "25"]

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "run_reference_trainer.py"),
         "-s", FIXTURE, "-m", ref_out,
         "--shim_cap", str(CAP), "--shim_k_dup", str(K_DUP),
         "--record_rng", rng_path,
         "--test_iterations", str(ITERS)] + schedule,
        env=env, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"reference trainer failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")

    # the recorded schedule must actually contain relocations
    z = np.load(rng_path)
    dead_total = 0
    j = 0
    while f"densify_iter_{j}" in z:
        dead_total += int(z[f"dead_{j}"].sum())
        j += 1
    assert dead_total > 0, (
        "schedule produced no dead rows — relocation not exercised "
        "(fixture drifted?)")

    from gsplat_tpu.train.train_static import main as train_main

    train_main(["-s", FIXTURE, "-m", ours_out, "--frame", "0",
                "--test_iterations", "-1", "--save_iterations", "-1",
                "--dup_budget", str(K_DUP),
                "--tile_x", "16", "--tile_y", "16",
                "--replay_rng", rng_path] + schedule)

    ref_traj = json.load(open(os.path.join(ref_out, "parity_ref.json")))
    ours_traj = json.load(open(os.path.join(ours_out, "parity_ours.json")))
    ref_losses = {it: tot for it, _, tot in ref_traj["losses"]}
    ours_losses = {it: tot for it, _, tot in ours_traj["losses"]}
    diags = ours_traj["densify_diagnostics"]
    max_hamming = max(d["dead_hamming"] for d in diags)
    for d in diags:
        assert d["p_recorded"] == d["p_ours"], d
    rels = np.asarray([abs(ref_losses[it] - ours_losses[it])
                       / max(abs(ref_losses[it]), 1e-12)
                       for it in sorted(ref_losses)])
    print(f"relocation-pinned: {dead_total} dead rows relocated across "
          f"{j} densify events; loss rel median={np.median(rels):.2e} "
          f"max={rels.max():.2e}; hamming max={max_hamming}")
    assert max_hamming <= 2, f"dead-mask drift: hamming {max_hamming}"
    assert np.median(rels) <= 1e-4, f"median loss drift {np.median(rels)}"
    assert rels.max() <= 5e-3, f"max loss drift {rels.max():.2e}"
