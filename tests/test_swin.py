"""SwinGS layer tests: stream format, lifespan mechanics, evolve/rollover,
deformable rendering, and an end-to-end sliding-window training run."""

import dataclasses
import json
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.model import optim, swin
from gsplat_tpu.utils.stream import SliWinManager, stream_dump, stream_load


def _make_swin_state(n=24, capacity=64, lifespan=4, buffer=64, deform=True,
                     seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    return swin.create_from_points(pts, colors, capacity, 1, lifespan,
                                   buffer, deform)


def test_stream_dump_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, sh = 7, 1
    params = {
        "start_frame": np.arange(n), "end_frame": np.arange(n) + 4,
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "f_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "f_rest": rng.normal(size=(n, 3, 3)).astype(np.float32),
        "scaling": rng.normal(size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
    }
    path = str(tmp_path / "streamable.dat")
    stream_dump(params, path, sh)
    stream_dump(params, path, sh)  # append twice
    out = stream_load(str(tmp_path / "format.json"), path)
    assert out["xyz"].shape == (2 * n, 3)
    np.testing.assert_allclose(out["xyz"][:n], params["xyz"], rtol=1e-6)
    np.testing.assert_allclose(out["f_rest"][n:], params["f_rest"], rtol=1e-6)
    assert out["sh_degree"] == sh

    # byte-level check against the reference record layout
    # (!II fff fff fff*3 fff ffff f) = reference stream_utils.py:16-32
    fmt = "!II" + "fff" + "fff" + "fff" * 3 + "fff" + "ffff" + "f"
    with open(path, "rb") as f:
        rec = struct.unpack(fmt, f.read(struct.calcsize(fmt)))
    assert rec[0] == 0 and rec[1] == 4
    np.testing.assert_allclose(rec[2:5], params["xyz"][0], rtol=1e-6)
    np.testing.assert_allclose(rec[-1], params["opacity"][0, 0], rtol=1e-6)


def test_sliwin_manager():
    mgr = SliWinManager(4, 10, max_sample=2)
    assert list(mgr.all_frames()) == [0, 1, 2, 3]
    assert len(mgr.sampled_frames()) == 2
    mgr.tick()
    assert (mgr.frame_start, mgr.frame_end) == (1, 5)
    state = mgr.state_dump()
    mgr2 = SliWinManager(4, 10)
    mgr2.state_load(state)
    assert mgr2.frame_start == 1
    biased = mgr.sampled_frames_biased()
    assert all(1 <= f < 5 for f in biased)


def test_decay_genesis_staggers_lifespans():
    st = _make_swin_state(n=24, lifespan=4)
    # distinct opacities so ranking is deterministic
    opa = np.linspace(-2, 2, 64).astype(np.float32)[:, None]
    st = dataclasses.replace(st, im=dataclasses.replace(
        st.im, opacity=jnp.asarray(opa)))
    st2 = swin.decay_genesis(st)
    ends = np.asarray(st2.frame_end)[:24]
    # highest-opacity gaussians keep frame_end == lifespan, lowest lose 3
    assert ends.max() == 4.0 and ends.min() == 1.0
    # opacity rank 23 (highest raw value at index 23) keeps the longest life
    assert ends[23] == 4.0 and ends[0] == 1.0
    # padding untouched
    assert np.all(np.asarray(st2.frame_end)[24:] == 0.0)


def test_mature_and_rollover():
    st = _make_swin_state(n=8, lifespan=4, deform=True)
    adam = optim.init(st.params())
    # give rows 0..2 short lifespans => they mature at window_end 4
    fe = np.full(64, 0.0, np.float32)
    fe[:8] = [2, 3, 2, 6, 6, 6, 6, 6]
    st = dataclasses.replace(st, frame_end=jnp.asarray(fe))
    mask = swin.mature_mask(st, 4.0)
    assert np.asarray(mask)[:8].tolist() == [True, True, True, False, False,
                                             False, False, False]
    rows = swin.extract_rows_host(st, np.asarray(mask))
    assert rows["xyz"].shape == (3, 3)

    st2, adam2 = swin.mature_and_rollover(st, adam, mask)
    assert int(st2.m_count) == 3
    np.testing.assert_allclose(np.asarray(st2.m_frame_end)[:3], [2, 3, 2])
    # rolled rows: new birth = old end, new end = old end + lifespan
    np.testing.assert_allclose(np.asarray(st2.frame_birth)[:3], [2, 3, 2])
    np.testing.assert_allclose(np.asarray(st2.frame_end)[:3], [6, 7, 6])
    # untouched rows unchanged
    np.testing.assert_allclose(np.asarray(st2.frame_end)[3:8], 6.0)
    # matured ring got the ORIGINAL (pre-rollover) params
    np.testing.assert_allclose(np.asarray(st2.m_opacity)[:3],
                               np.asarray(st.im.opacity)[:3])


def test_ring_buffer_wraps():
    st = _make_swin_state(n=8, lifespan=4, buffer=4, deform=False)
    adam = optim.init(st.params())
    mask1 = jnp.asarray([True] * 3 + [False] * 61)
    st, adam = swin.mature_and_rollover(st, adam, mask1)
    mask2 = jnp.asarray([False] * 3 + [True] * 3 + [False] * 58)
    st, adam = swin.mature_and_rollover(st, adam, mask2)
    assert int(st.m_count) == 6
    assert np.all(np.asarray(st.matured_valid()))  # ring full (4 of 4)


def test_union_params_at_activity():
    st = _make_swin_state(n=8, lifespan=4, deform=False)
    fs = np.zeros(64, np.float32)
    fe = np.zeros(64, np.float32)
    fs[:8] = [0, 0, 2, 2, 0, 0, 0, 0]
    fe[:8] = [4, 4, 6, 6, 1, 1, 4, 4]
    st = dataclasses.replace(st, frame_start=jnp.asarray(fs),
                             frame_end=jnp.asarray(fe))
    kw = swin.union_params_at(st, 1.5)
    active = np.asarray(kw["alive"])
    # immature actives: start <= 1.5 < end
    assert active[:8].tolist() == [True, True, False, False, False, False,
                                   True, True]
    assert not active[64:].any()  # empty matured ring


def test_union_deformation_moves_points():
    st = _make_swin_state(n=4, lifespan=4, deform=True)
    v = np.zeros((64, 3), np.float32)
    v[:4] = [0.5, 0.0, 0.0]
    st = dataclasses.replace(st, rigid_v=jnp.asarray(v))
    kw0 = swin.union_params_at(st, 0.0)
    kw2 = swin.union_params_at(st, 2.0)
    delta = np.asarray(kw2["means3d"])[:4] - np.asarray(kw0["means3d"])[:4]
    np.testing.assert_allclose(delta, [[1.0, 0, 0]] * 4, atol=1e-5)


def test_relocate_immature_frame_aware():
    st = _make_swin_state(n=16, lifespan=4)
    opa = np.full((64, 1), 2.0, np.float32)
    opa[:4] = -10.0  # dead
    birth = np.zeros(64, np.float32)
    birth[:4] = 1.0   # dead born at frame 1
    birth[4:8] = 0.0  # alive but born earlier than dead -> ineligible
    birth[8:16] = 2.0  # eligible templates
    st = dataclasses.replace(
        st, im=dataclasses.replace(st.im, opacity=jnp.asarray(opa)),
        frame_birth=jnp.asarray(birth))
    adam = optim.init(st.params())
    st2, _ = swin.relocate_immature(st, adam, jax.random.PRNGKey(0),
                                    jnp.asarray(0.0), window_size=4)
    xyz2 = np.asarray(st2.im.xyz)[:4]
    eligible = np.asarray(st.im.xyz)[8:16]
    for row in xyz2:
        assert np.any(np.all(np.isclose(row, eligible, atol=1e-6), axis=1)), \
            "dead row must teleport onto a template born at >= its frame"
    # revived opacity above the dead threshold
    assert np.all(np.asarray(st2.im.get_opacity())[:4, 0] >= 0.005 - 1e-6)


def test_swin_add_new_copies_lifespans():
    st = _make_swin_state(n=20, lifespan=4)
    fs = np.zeros(64, np.float32)
    fs[:20] = 1.0
    st = dataclasses.replace(st, frame_start=jnp.asarray(fs))
    adam = optim.init(st.params())
    st2, _ = swin.add_new_gs(st, adam, jax.random.PRNGKey(1), cap_max=64)
    assert int(st2.im.n_alive) == 21
    assert float(st2.frame_start[20]) == 1.0


@pytest.mark.slow
def test_swin_e2e_training(tmp_path):
    """Short sliding-window training on a synthetic SwinGS dataset: runs
    genesis + 2 window ticks, streams matured gaussians, stays finite."""
    from tests.test_data import _make_swings_fixture
    from gsplat_tpu.train.train_swin import main as swin_main

    _make_swings_fixture(tmp_path, n_cams=3, n_frames=4)
    out = str(tmp_path / "model")
    swin_main([
        "-s", str(tmp_path), "-m", out,
        "--iterations", "8", "--cap_max", "48", "--init_pts", "24",
        "--max_frame", "4", "--swin_size", "2", "--deform",
        "--densify_from_iter", "2", "--densify_until_iter", "7",
        "--densification_interval", "3",
        "--test_iterations", "6", "--save_iterations", "-1",
        "--dup_budget", "4096",
    ])
    assert os.path.exists(os.path.join(out, "streamable.dat"))
    assert os.path.exists(os.path.join(out, "format.json"))
    assert os.path.exists(os.path.join(out, "psnr.txt"))
    from gsplat_tpu.utils.stream import stream_load

    data = stream_load(os.path.join(out, "format.json"),
                       os.path.join(out, "streamable.dat"))
    assert data["xyz"].shape[0] >= 48  # everything matured eventually
    assert np.all(np.isfinite(data["xyz"]))


@pytest.mark.slow
def test_render_stream_cli(tmp_path):
    """Train a tiny swin run, then play back the streamed scene per frame."""
    from tests.test_data import _make_swings_fixture
    from gsplat_tpu.train.train_swin import main as swin_main
    from gsplat_tpu.eval.render_stream import main as stream_main

    _make_swings_fixture(tmp_path, n_cams=3, n_frames=3)
    out = str(tmp_path / "model")
    swin_main([
        "-s", str(tmp_path), "-m", out,
        "--iterations", "4", "--cap_max", "32", "--init_pts", "16",
        "--max_frame", "3", "--swin_size", "2",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--dup_budget", "2048", "--densify_until_iter", "0",
    ])
    stream_main(["-m", out, "-s", str(tmp_path), "--max_frame", "3",
                 "--frames", "0", "2", "--dup_budget", "2048"])
    renders = os.path.join(out, "test", "stream", "renders")
    assert len(os.listdir(renders)) == 2  # 1 test cam x 2 frames
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(renders,
                                             sorted(os.listdir(renders))[0])))
    assert img.shape[2] == 3 and np.isfinite(img).all()


@pytest.mark.slow
def test_swin_e2e_training_data_parallel(tmp_path):
    """Same pipeline with --data_parallel 2: one (camera, frame) sample per
    device, psum-averaged gradients (parallel/swin_dp.py)."""
    from tests.test_data import _make_swings_fixture
    from gsplat_tpu.train.train_swin import main as swin_main

    _make_swings_fixture(tmp_path, n_cams=3, n_frames=4)
    out = str(tmp_path / "model_dp")
    swin_main([
        "-s", str(tmp_path), "-m", out,
        "--iterations", "6", "--cap_max", "48", "--init_pts", "24",
        "--max_frame", "4", "--swin_size", "2", "--deform",
        "--densify_from_iter", "2", "--densify_until_iter", "5",
        "--densification_interval", "3",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--dup_budget", "4096", "--data_parallel", "2",
    ])
    assert os.path.exists(os.path.join(out, "streamable.dat"))
    from gsplat_tpu.utils.stream import stream_load

    data = stream_load(os.path.join(out, "format.json"),
                       os.path.join(out, "streamable.dat"))
    assert np.all(np.isfinite(data["xyz"]))


@pytest.mark.slow
def test_swin_e2e_training_min_frame(tmp_path):
    """Sliding-window training on a NONZERO-based frame range: --min_frame 2
    must train on rebased frames 0..1 (the reference's flagship actorshq
    160-220 layout, run_exp1.sh)."""
    from tests.test_data import _make_swings_fixture
    from gsplat_tpu.train.train_swin import main as swin_main

    _make_swings_fixture(tmp_path, n_cams=3, n_frames=6)
    out = str(tmp_path / "model_mf")
    swin_main([
        "-s", str(tmp_path), "-m", out,
        "--iterations", "6", "--cap_max", "48", "--init_pts", "24",
        "--min_frame", "2", "--max_frame", "6", "--swin_size", "2",
        "--deform", "--densify_from_iter", "2", "--densify_until_iter", "5",
        "--densification_interval", "3",
        "--test_iterations", "-1", "--save_iterations", "-1",
        "--dup_budget", "4096",
    ])
    from gsplat_tpu.utils.stream import stream_load

    data = stream_load(os.path.join(out, "format.json"),
                       os.path.join(out, "streamable.dat"))
    # all lifespans live in rebased space: births start at 0 (not at the
    # on-disk frame number 2+) and ends stay within span + lifespan
    assert data["start_frame"].min() >= 0
    assert data["start_frame"].max() <= 4
    assert data["end_frame"].max() <= 4 + 2
    assert np.all(np.isfinite(data["xyz"]))


def test_dp_noise_gate_frame_marginal():
    """Quantitative check of the swin-DP noise-gating claim
    (parallel/swin_dp.py): the DP step gates noise at the BATCH'S FIRST
    frame while single-device gates at the iteration's sampled frame.
    Both draw from the same shuffled (camera, frame) stack
    (train_swin.py viewpoint_stack), so the gate frame's marginal
    distribution must be identical — each frame uniform at 1/n_frames.
    Simulates the exact pop-with-refill process for both modes."""
    import random as _random

    rng = _random.Random(0)
    frames, cams_per_frame, n_dp, iters = 5, 3, 4, 40_000
    window = [(c, t) for t in range(frames) for c in range(cams_per_frame)]

    def simulate(batch):
        counts = [0] * frames
        stack = []
        for _ in range(iters):
            gate_frame = None
            for j in range(batch):
                if not stack:
                    stack = list(window)
                    rng.shuffle(stack)
                _, t = stack.pop()
                if j == 0:
                    gate_frame = t  # swin_dp gates at frame_batch[0]
            counts[gate_frame] += 1
        return [c / iters for c in counts]

    single = simulate(1)
    dp = simulate(n_dp)
    for t in range(frames):
        assert abs(single[t] - 1 / frames) < 0.01, single
        assert abs(dp[t] - 1 / frames) < 0.01, dp
        assert abs(single[t] - dp[t]) < 0.015, (single, dp)
