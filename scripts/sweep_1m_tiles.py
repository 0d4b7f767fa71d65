"""Tile-shape sweep for the 1M-cap train step on real hardware (round-3
verdict ask #4: the CPU shape analysis predicted 64x32 cuts slots -14% and
128x32 -18% at 2-4x the per-duplicate kernel pixels — only a hardware
measurement settles which side wins; round 3 measured 64x16 optimal on the
RANDOM cloud, this sweeps the TRAINED-STATISTICS workload where saturation
early-exit fires).

Run on the TPU host:  python scripts/sweep_1m_tiles.py
"""

import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = [(64, 16), (64, 32), (128, 32)]  # default + the two CPU-analysis
                                          # slot-minimizing candidates


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_scene, _orbit_cameras
    from bench import probe_k_dup, trained_stats_state
    from gsplat_tpu.model import optim
    from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
    from gsplat_tpu.train import step as step_lib
    from gsplat_tpu.train.config import OptimizationConfig

    p, w, h, sh = 1_000_000, 1296, 840, 3
    wit = 8
    rng = np.random.default_rng(0)
    bg = jnp.zeros(3)
    gt_scene = _make_scene(20_000, sh, seed=0)
    cams = _orbit_cameras(4, w, h)
    state0, src = trained_stats_state(p, sh, rng)
    print(f"workload: {src}")
    opt = OptimizationConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), 64)

    results = []
    for tx, ty in SHAPES:
        s = RasterizeSettings(k_dup=1 << 21, tile_x=tx, tile_y=ty,
                              chunk=128)
        chw = dataclasses.replace(s, layout="chw")
        gts = [jax.jit(lambda c, cs=chw: rasterize(*gt_scene, c, sh, bg,
                                                   cs).image)(c)
               for c in cams]
        probe = jax.jit(lambda st, c, ss: rasterize(
            st.xyz, st.get_scaling(), st.get_rotation(),
            st.get_opacity()[:, 0], st.get_features(), c, sh, bg, ss,
            alive=st.alive_mask).num_dup, static_argnames="ss")
        try:
            need = max(int(probe(state0, c, s)) for c in cams)
            s = dataclasses.replace(s, k_dup=probe_k_dup(need, s.chunk))
            state = jax.tree.map(jnp.copy, state0)
            adam = optim.init(state.params())
            step = step_lib.make_train_step(opt, s, spatial_lr_scale=4.0)
            state, adam, m = step(state, adam, keys[0], cams[0], gts[0], bg,
                                  jnp.asarray(1.0), sh)
            jax.block_until_ready(m.loss)
            ms_win = []
            it = 0
            for _ in range(3):
                t0 = time.time()
                for _ in range(wit):
                    state, adam, m = step(state, adam, keys[it + 1],
                                          cams[it % 4], gts[it % 4], bg,
                                          jnp.asarray(float(it + 2)), sh)
                    it += 1
                jax.block_until_ready(m.loss)
                ms_win.append((time.time() - t0) / wit * 1000)
            ms = statistics.median(ms_win)
            print(f"tile {tx}x{ty}: {ms:7.1f} ms/it  (num_dup {need}, "
                  f"k_dup {s.k_dup}, windows "
                  f"{[f'{x:.1f}' for x in ms_win]})", flush=True)
            results.append(((tx, ty), ms, need))
        except Exception as e:  # noqa: BLE001 — report shape, keep sweeping
            print(f"tile {tx}x{ty}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:200]})", flush=True)
    if results:
        best = min(results, key=lambda r: r[1])
        print(f"best: {best[0][0]}x{best[0][1]} at {best[1]:.1f} ms/it")


if __name__ == "__main__":
    main()
