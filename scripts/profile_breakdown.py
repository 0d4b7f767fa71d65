"""Component-level timing breakdown of the render + train pipelines.

Times each pipeline stage in isolation (jitted, block_until_ready) so
optimization effort goes where the milliseconds are. Not part of the test
suite; run manually on the TPU:  python scripts/profile_breakdown.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _make_scene, _orbit_cameras  # noqa: E402
from gsplat_tpu.raster import binning as binning_lib  # noqa: E402
from gsplat_tpu.raster import project as project_lib  # noqa: E402
from gsplat_tpu.raster import tile_kernel  # noqa: E402
from gsplat_tpu.raster.rasterize import (  # noqa: E402
    RasterizeSettings, _feat_columns, _slot_features, rasterize)


def timeit(fn, *args, n=20, warm=2):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def main():
    sh = 3
    p = 100_000
    scene = _make_scene(p, sh, seed=0)
    bg = jnp.zeros(3)

    for label, (w, h), inference in [
        ("render 1080p", (1920, 1088), True),
        ("train-res 800p", (800, 800), False),
    ]:
        cam = _orbit_cameras(1, w, h)[0]
        s = RasterizeSettings(k_dup=8 * p, inference=inference)
        probe = jax.jit(lambda ps, s=s, cam=cam: rasterize(
            *ps, cam, sh, bg, s).num_dup)
        need = int(probe(scene))
        align = s.chunk * tile_kernel.SUPER
        k_dup = -(-need * 13 // 10 // align) * align
        s = dataclasses.replace(s, k_dup=k_dup)
        grid_x = -(-w // s.tile_x)
        grid_y = -(-h // s.tile_y)

        means3d, scales, quats, opac, shs = scene

        pre = jax.jit(lambda: project_lib.preprocess(
            means3d, scales, quats, opac, shs, cam, sh))
        proc = pre()

        binf = jax.jit(lambda: binning_lib.bin_gaussians(
            proc, tile_x=s.tile_x, tile_y=s.tile_y, grid_x=grid_x,
            grid_y=grid_y, k_dup=s.k_dup, chunk=s.chunk,
            align=tile_kernel.SUPER, feat_table=_feat_columns(proc)))
        binn = binf()

        dt = jnp.bfloat16 if inference else jnp.float32
        featf = jax.jit(lambda: _slot_features(binn.feat_table, binn.gid,
                                               binn.seg_bounds, dtype=dt))
        feat = featf()

        num_tiles = grid_x * grid_y
        n_pix = s.tile_x * s.tile_y
        if inference:
            kern = jax.jit(lambda: tile_kernel.render_forward(
                feat, binn.chunk_meta, bg, num_tiles, n_pix,
                s.tile_x, s.tile_y, grid_x, s.chunk, False))
        else:
            kern = jax.jit(lambda: tile_kernel.tile_blend(
                feat, binn.chunk_meta, num_tiles, n_pix,
                s.tile_x, s.tile_y, grid_x, s.chunk, False))

        full = jax.jit(lambda ps: rasterize(*ps, cam, sh, bg, s).image)

        print(f"== {label}: {w}x{h} k_dup={k_dup} num_dup={need} "
              f"tiles={num_tiles} chunks={feat.shape[1] // s.chunk}")
        print(f"  preprocess       {timeit(pre):8.2f} ms")
        print(f"  binning          {timeit(binf):8.2f} ms")
        print(f"  slot_features    {timeit(featf):8.2f} ms")
        print(f"  tile kernel fwd  {timeit(kern):8.2f} ms")
        print(f"  FULL forward     {timeit(full, scene):8.2f} ms")

        if not inference:
            # backward through the custom VJP (grad of image sum)
            def loss(ps):
                return jnp.sum(rasterize(*ps, cam, sh, bg, s).image)
            g = jax.jit(jax.grad(loss))
            print(f"  FULL fwd+bwd     {timeit(g, scene):8.2f} ms")
            # kernel-only backward (packed residual/cotangent blocks)
            ct, _used = tile_kernel._tile_blend_packed(
                feat, binn.chunk_meta, num_tiles, n_pix,
                s.tile_x, s.tile_y, grid_x, s.chunk, False)
            dct = jnp.ones_like(ct)
            kb = jax.jit(lambda: tile_kernel._backward(
                feat, binn.chunk_meta, ct, dct, num_tiles, n_pix,
                s.tile_x, s.tile_y, grid_x, s.chunk, False))
            print(f"  tile kernel bwd  {timeit(kb):8.2f} ms")


if __name__ == "__main__":
    main()
