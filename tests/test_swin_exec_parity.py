"""SLIDING-WINDOW trainer-loop exec-parity — the fork's actively-used
entry (train_swin.py; SURVEY.md §7: the static entry is bit-rotted,
train_swin is the path the authors ran).

tests/run_reference_trainer.py --swin executes the reference's own
train() (train_swin.py:275-340) on CPU with the CUDA extensions shimmed
to this repo's kernels: genesis, decay_genesis, per-window training with
deformable_render (the rigid deformation runs in the reference's OWN
tempo_utils torch code upstream of the shimmed rasterizer, so
rigid_v/rotvec/rotcen gradients chain through torch autograd),
evolve/mature/rollover, and the stream dump through the reference's own
stream_utils writer. Our swin trainer runs the identical
fixture/schedule; both resulting streamable.dat files are loaded by OUR
stream reader and rendered by OUR renderer against the same fixture GT —
a PSNR gap isolates window-machinery semantics.

Densification is ON in both runs (round-4 verdict ask #4): the schedule is
chosen so the reference's decay_genesis assert P %% max_lifespan == 0
(gaussian_model.py:443-446) holds — from the fixture's 100 sfm points,
exactly two genesis growth events (densify at iters 100 and 200 of 300)
give 100 -> 105 -> 110, even for swin_size 2 — so the frame-aware
add_new_gs (gaussian_model.py:854-909) and per-birth-frame
relocate_gs_immuture (:911-962) run under the reference's own
train_swin.py. Noise is pinned to 0 in BOTH loops: the reference's swin
noise is a silent no-op anyway (train_swin.py:261 mutates an
advanced-indexing COPY of _xyz), and pinning ours isolates the window +
densify machinery from RNG-stream noise.
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "quality_cudaport_dyn")
SCHEDULE = ["--iterations", "150", "--genesis_iterations", "300",
            "--cap_max", "320", "--init_pts", "160", "--init_type", "sfm",
            "--max_frame", "4", "--swin_size", "2", "--deform",
            "--noise_lr", "0",
            "--densify_from_iter", "50", "--densify_until_iter", "250",
            "--densification_interval", "100"]


def _psnr(a, b):
    mse = np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2)
    return -10.0 * np.log10(mse + 1e-12)


def _stream_psnr_vs_gt(model_dir):
    """Render every (frame, test camera) straight from the model dir's
    streamable.dat with OUR loader/renderer; PSNR vs fixture GT."""
    from gsplat_tpu.data.scene import DynamicScene
    from gsplat_tpu.eval.render_stream import (load_stream_state,
                                               render_stream_frame)
    from gsplat_tpu.raster.rasterize import RasterizeSettings

    data = load_stream_state(model_dir)
    assert data["xyz"].shape[0] > 0
    dyn = DynamicScene(FIXTURE, "", eval_split=True, init_type="sfm",
                       num_pts=8, max_frame=4)
    settings = RasterizeSettings(k_dup=8192, tile_x=16, tile_y=16,
                                 chunk=128, interpret=True)
    bg = jnp.zeros(3)
    psnrs = []
    for f in range(4):
        for cam_obj in dyn.get_test_cams_at([f]):
            camera, gt = cam_obj.load()
            img = np.asarray(render_stream_frame(data, camera, float(f),
                                                 bg, settings))
            psnrs.append(_psnr(img, np.asarray(gt)))
    return float(np.mean(psnrs)), psnrs


def test_reference_swin_loop_through_shims_matches_ours(tmp_path):
    ref_out = str(tmp_path / "ref")
    ours_out = str(tmp_path / "ours")
    os.makedirs(ref_out)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__),
                      "run_reference_trainer.py"),
         "--swin", "-s", FIXTURE, "-m", ref_out,
         "--shim_cap", "768", "--shim_k_dup", "8192",
         "--test_iterations", "-1"] + SCHEDULE,
        env=env, capture_output=True, text=True, timeout=3000)
    assert proc.returncode == 0, (
        f"reference swin trainer failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    assert os.path.exists(os.path.join(ref_out, "streamable.dat"))
    # the frame-aware growth path must have actually executed in the
    # reference loop: two genesis growth events, 100 -> 105 -> 110
    assert "Adding 5 new gaussians, total 105 now" in proc.stdout, (
        "reference add_new_gs did not run (densify schedule broken?)\n"
        + proc.stdout[-2000:])
    assert "Adding 5 new gaussians, total 110 now" in proc.stdout

    from gsplat_tpu.train.train_swin import main as swin_main

    swin_main(["-s", FIXTURE, "-m", ours_out,
               "--test_iterations", "-1", "--save_iterations", "-1",
               "--dup_budget", "8192"] + SCHEDULE)

    psnr_ref, per_ref = _stream_psnr_vs_gt(ref_out)
    psnr_ours, per_ours = _stream_psnr_vs_gt(ours_out)
    print(f"swin exec-parity: reference-loop stream {psnr_ref:.2f} dB "
          f"({[f'{p:.1f}' for p in per_ref]}), our-loop stream "
          f"{psnr_ours:.2f} dB ({[f'{p:.1f}' for p in per_ours]})")

    assert psnr_ref >= 13.0, f"reference-loop stream degenerate: {psnr_ref}"
    assert psnr_ours >= 13.0, f"our-loop stream degenerate: {psnr_ours}"
    # window-machinery agreement; both loops share the renderer, so a
    # real evolve/mature/deform/densify divergence moves this by several
    # dB. Calibrated (round 5, CPU, densify ON + noise pinned 0):
    # reference-loop 19.34 dB vs our-loop 20.05 dB (0.71 dB gap;
    # per-frame 17.9/18.5/20.3/20.6 vs 18.1/19.0/21.3/21.9). The
    # remaining float source is the camera-draw RNG stream (python
    # random in the reference vs ours), which at 150 iters/window on a
    # 4-frame fixture dominates; the 2.0 dB gate carries that margin.
    assert abs(psnr_ref - psnr_ours) <= 2.0, (
        f"swin-loop divergence: reference {psnr_ref:.2f} dB vs ours "
        f"{psnr_ours:.2f} dB")
