"""Tile-shape / component sweep at the 1M-cap gate scale (config #3).

Times the FULL fused train step (fwd + bwd + Adam + noise) at cap 1M,
1296x840, for a grid of tile shapes, plus a component breakdown at the
best shape. Not part of the test suite; run manually on the TPU:

    python scripts/profile_1m.py [tile_x,tile_y ...]
"""

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _make_scene, _orbit_cameras  # noqa: E402
from gsplat_tpu.model import gaussians, optim  # noqa: E402
from gsplat_tpu.raster import binning as binning_lib  # noqa: E402
from gsplat_tpu.raster import project as project_lib  # noqa: E402
from gsplat_tpu.raster import tile_kernel  # noqa: E402
from gsplat_tpu.raster.rasterize import (  # noqa: E402
    RasterizeSettings, _feat_columns, _slot_features, rasterize)
from gsplat_tpu.train import step as step_lib  # noqa: E402
from gsplat_tpu.train.config import OptimizationConfig  # noqa: E402


def timeit(fn, *args, n=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def breakdown(mstate, cam, s, sh, bg, w, h):
    """Stage-isolated timings at the 1M config (one camera)."""
    grid_x, grid_y = -(-w // s.tile_x), -(-h // s.tile_y)
    args = (mstate.xyz, mstate.get_scaling(), mstate.get_rotation(),
            mstate.get_opacity()[:, 0], mstate.get_features())
    args = jax.tree.map(jnp.copy, args)  # independent of donated buffers
    alive = jnp.copy(mstate.alive_mask)

    pre = jax.jit(lambda: project_lib.preprocess(*args, cam, sh,
                                                 alive=alive))
    proc = pre()
    binf = jax.jit(lambda: binning_lib.bin_gaussians(
        proc, tile_x=s.tile_x, tile_y=s.tile_y, grid_x=grid_x,
        grid_y=grid_y, k_dup=s.k_dup, chunk=s.chunk,
        align=s.super_chunks, feat_table=_feat_columns(proc)))
    binn = binf()
    featf = jax.jit(lambda: _slot_features(binn.feat_table, binn.gid,
                                           binn.seg_bounds,
                                           dtype=jnp.float32))
    feat = featf()
    num_tiles, n_pix = grid_x * grid_y, s.tile_x * s.tile_y
    kern = jax.jit(lambda: tile_kernel.tile_blend(
        feat, binn.chunk_meta, num_tiles, n_pix,
        s.tile_x, s.tile_y, grid_x, s.chunk, False))
    full = jax.jit(lambda a: rasterize(*a, cam, sh, bg, s,
                                       alive=alive).image)

    s_chw = dataclasses.replace(s, layout="chw")

    def loss(a):
        return jnp.sum(rasterize(*a, cam, sh, bg, s_chw,
                                 alive=alive).image)
    g = jax.jit(jax.grad(loss))

    # grad-reduction (sort + Kahan cumsum + boundary gathers) in isolation
    from gsplat_tpu.raster.rasterize import _segsum_reduce
    dfeat = jnp.copy(feat)
    p1 = args[0].shape[0] + 1
    segr = jax.jit(lambda d: _segsum_reduce(d, binn.gid, binn.seg_bounds,
                                            p1, False))

    # preprocess fwd+bwd in isolation (XLA autodiff through project.py)
    def pre_loss(a):
        pr = project_lib.preprocess(*a, cam, sh, alive=alive)
        return (jnp.sum(pr.xy) + jnp.sum(pr.conic) + jnp.sum(pr.rgb)
                + jnp.sum(pr.opacity))
    gpre = jax.jit(jax.grad(pre_loss))
    ct, _used = tile_kernel._tile_blend_packed(
        feat, binn.chunk_meta, num_tiles, n_pix,
        s.tile_x, s.tile_y, grid_x, s.chunk, False)
    dct = jnp.ones_like(ct)
    kb = jax.jit(lambda: tile_kernel._backward(
        feat, binn.chunk_meta, ct, dct, num_tiles, n_pix,
        s.tile_x, s.tile_y, grid_x, s.chunk, False))

    print(f"  breakdown (tiles={num_tiles} chunks="
          f"{feat.shape[1] // s.chunk}):")
    print(f"  preprocess       {timeit(pre):8.2f} ms")
    print(f"  binning          {timeit(binf):8.2f} ms")
    print(f"  slot_features    {timeit(featf):8.2f} ms")
    print(f"  tile kernel fwd  {timeit(kern):8.2f} ms")
    print(f"  FULL forward     {timeit(full, args):8.2f} ms")
    print(f"  FULL fwd+bwd chw {timeit(g, args):8.2f} ms")
    print(f"  tile kernel bwd  {timeit(kb):8.2f} ms")
    print(f"  segsum reduce    {timeit(segr, dfeat):8.2f} ms")
    print(f"  preprocess f+b   {timeit(gpre, args):8.2f} ms", flush=True)


def main():
    argv = sys.argv[1:]
    do_breakdown = "--breakdown" in argv
    do_trace = "--trace" in argv
    positions = "clustered" if "--clustered" in argv else "uniform"
    random_cloud = "--random_cloud" in argv
    argv = [a for a in argv if a not in ("--breakdown", "--trace",
                                         "--clustered", "--random_cloud")]
    shapes = [(64, 16), (64, 32), (128, 32)]
    if argv:
        # tx,ty[,chunk]
        shapes = [tuple(int(v) for v in a.split(",")) for a in argv]

    sh = 3
    mp, mw, mh = 1_000_000, 1296, 840
    rng = np.random.default_rng(0)
    bg = jnp.zeros(3)
    gt_scene = _make_scene(20_000, sh, seed=1)
    mcams = _orbit_cameras(4, mw, mh)
    gt_settings = RasterizeSettings(k_dup=1 << 19, layout="chw")
    render_gt = jax.jit(lambda c: rasterize(*gt_scene, c, sh, bg,
                                            gt_settings).image)
    mgts = [render_gt(c) for c in mcams]
    jax.block_until_ready(mgts[-1])

    if random_cloud:
        mpts = rng.uniform(-1, 1, (mp, 3)).astype(np.float32)
        mstate = gaussians.create_from_points(
            mpts, rng.uniform(0, 1, (mp, 3)).astype(np.float32),
            capacity=mp, max_sh_degree=sh)
        print("workload: uniform random cloud (legacy round-3 config)")
    else:
        # config of record since round 4: trained-statistics workload
        from bench import trained_stats_state

        mstate, m_src = trained_stats_state(mp, sh, rng,
                                            positions=positions)
        print(f"workload: {m_src}")
    madam0 = optim.init(mstate.params())
    opt = OptimizationConfig()
    keys = jax.random.split(jax.random.PRNGKey(0), 64)

    for shape in shapes:
        tx, ty = shape[0], shape[1]
        chunk = shape[2] if len(shape) > 2 else 128
        # the train step donates its state args — give each shape a copy
        st0 = jax.tree.map(jnp.copy, mstate)
        ad0 = jax.tree.map(jnp.copy, madam0)
        s = RasterizeSettings(k_dup=1 << 21, tile_x=tx, tile_y=ty,
                              chunk=chunk)
        probe = jax.jit(lambda st, c, s=s: rasterize(
            st.xyz, st.get_scaling(), st.get_rotation(),
            st.get_opacity()[:, 0], st.get_features(), c, sh, bg, s,
            alive=st.alive_mask).num_dup)
        need = max(int(probe(st0, c)) for c in mcams)
        s = dataclasses.replace(
            s, k_dup=-(-need * 13 // 10 // s.chunk) * s.chunk)
        step = step_lib.make_train_step(opt, s, spatial_lr_scale=4.0)
        st, ad, m = step(st0, ad0, keys[0], mcams[0], mgts[0],
                         bg, jnp.asarray(1.0), sh)
        jax.block_until_ready(m.loss)
        n, t0 = 10, time.time()
        for i in range(n):
            st, ad, m = step(st, ad, keys[i + 1], mcams[i % 4],
                             mgts[i % 4], bg, jnp.asarray(float(i + 2)), sh)
        jax.block_until_ready(m.loss)
        ms = (time.time() - t0) * 1000.0 / n
        print(f"tile {tx}x{ty} chunk {chunk}: k_dup={s.k_dup} need={need} "
              f"{ms:7.1f} ms/it  loss={float(m.loss):.5f}", flush=True)
        if do_breakdown:
            breakdown(mstate, mcams[0], s, sh, bg, mw, mh)
        if do_trace:
            # per-op device trace of the FULL fused step (round-4 verdict
            # ask #2: name every op >= 1 ms on the trained workload)
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from trace_ops import trace_op_breakdown

            # carry (state, adam) through donation so the trace contains
            # ONLY the step's own ops (a per-call host copy of the 236 MB
            # param dict would dominate the trace)
            box = [jax.tree.map(jnp.copy, mstate),
                   jax.tree.map(jnp.copy, madam0), 20]

            def one_step():
                st2, ad2, i = box[0], box[1], box[2]
                st2, ad2, m2 = step(st2, ad2, keys[i % 60], mcams[i % 4],
                                    mgts[i % 4], bg,
                                    jnp.asarray(float(i)), sh)
                box[0], box[1], box[2] = st2, ad2, i + 1
                return m2.loss

            trace_op_breakdown(one_step, n=8, top=60)


if __name__ == "__main__":
    main()
