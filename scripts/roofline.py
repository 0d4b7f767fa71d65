"""Roofline / bandwidth-utilization report for the hot kernels at the
1M-cap gate-#3 scale (round-3 verdict ask #5).

For each hot pipeline stage, measures device time in isolation (jitted,
block_until_ready, median of windows) and divides ANALYTIC byte / FLOP
counts by it:

- bytes: exact array-traffic formulas (inputs read + outputs written,
  f32/bf16 as compiled) — the meaningful roofline for this pipeline,
  whose stages are gather/sort/elementwise (HBM-bound);
- flops: documented per-slot-pixel estimates for the two blend kernels
  (VPU elementwise math; the MXU only sees the small packed-byte
  extraction dots), labeled as estimates.

v5e single-chip peaks used: HBM 819 GB/s, MXU bf16 197 TFLOP/s (public
cloud figures). The VPU f32 peak is NOT a published number; kernel rows
therefore report achieved flops/byte and HBM utilization, which bound the
achievable time from below.

Run on the TPU host:  python scripts/roofline.py [--p 1000000]
"""

import argparse
import dataclasses
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_PEAK_GBS = 819.0
MXU_PEAK_TFLOPS = 197.0


def timeit(fn, *args, n=10, windows=3, warm=2):
    import jax

    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(windows):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) / n * 1000.0)
    return statistics.median(ts)


def make_workload(p, sh, rng, stats_path):
    """1M-scale cloud with the same trained-scene opacity/scale sampling
    the bench's 1M stage uses (bench.trained_stats_state)."""
    from bench import trained_stats_state

    state, src = trained_stats_state(p, sh, rng, stats_path)
    return (state.xyz, state.get_scaling(), state.get_rotation(),
            state.get_opacity()[:, 0], state.get_features()), src


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1_000_000)
    ap.add_argument("--w", type=int, default=1296)
    ap.add_argument("--h", type=int, default=840)
    ap.add_argument("--tile_x", type=int, default=64)
    ap.add_argument("--tile_y", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _orbit_cameras
    from bench import probe_k_dup
    from gsplat_tpu.raster import binning as binning_lib
    from gsplat_tpu.raster import project as project_lib
    from gsplat_tpu.raster import tile_kernel
    from gsplat_tpu.raster.rasterize import (RasterizeSettings,
                                             _feat_columns, _slot_features,
                                             rasterize)

    p, sh = args.p, 3
    rng = np.random.default_rng(0)
    stats_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "trained_stats.npz")
    scene, src = make_workload(p, sh, rng, stats_path)
    # trained clouds fill the camera orbit's view volume at the origin
    cam = _orbit_cameras(4, args.w, args.h, radius=3.0,
                         center=(0.0, 0.0, 0.0))[1]
    bg = jnp.zeros(3)

    s = RasterizeSettings(k_dup=1 << 21, tile_x=args.tile_x,
                          tile_y=args.tile_y, chunk=128)
    probe = jax.jit(lambda ps: rasterize(*ps, cam, sh, bg, s).num_dup)
    need = int(probe(scene))
    s = dataclasses.replace(s, k_dup=probe_k_dup(need, s.chunk))
    print(f"workload: P={p} {args.w}x{args.h} "
          f"tile {args.tile_x}x{args.tile_y} num_dup={need} "
          f"k_dup={s.k_dup} opacity/scale source: {src}")

    grid_x = -(-args.w // s.tile_x)
    grid_y = -(-args.h // s.tile_y)
    num_tiles = grid_x * grid_y
    n_pix = s.tile_x * s.tile_y
    k = s.k_dup

    means3d, scales, quats, opac, shs = scene
    pre = jax.jit(lambda: project_lib.preprocess(
        means3d, scales, quats, opac, shs, cam, sh))
    proc = pre()
    binf = jax.jit(lambda: binning_lib.bin_gaussians(
        proc, tile_x=s.tile_x, tile_y=s.tile_y, grid_x=grid_x,
        grid_y=grid_y, k_dup=s.k_dup, chunk=s.chunk,
        align=tile_kernel.SUPER, feat_table=_feat_columns(proc)))
    binn = binf()
    featf = jax.jit(lambda: _slot_features(binn.feat_table, binn.gid,
                                           binn.seg_bounds))
    feat = featf()
    kern = jax.jit(lambda: tile_kernel.tile_blend(
        feat, binn.chunk_meta, num_tiles, n_pix, s.tile_x, s.tile_y,
        grid_x, s.chunk, False))
    ct, _u = tile_kernel._tile_blend_packed(
        feat, binn.chunk_meta, num_tiles, n_pix, s.tile_x, s.tile_y,
        grid_x, s.chunk, False)
    dct = jnp.ones_like(ct)
    kbwd = jax.jit(lambda: tile_kernel._backward(
        feat, binn.chunk_meta, ct, dct, num_tiles, n_pix, s.tile_x,
        s.tile_y, grid_x, s.chunk, False))

    def full_loss(ps):
        return jnp.sum(rasterize(*ps, cam, sh, bg, s).image)

    gfull = jax.jit(jax.grad(full_loss))

    # ---- analytic traffic formulas (f32 = 4B unless noted) ----
    # fwd kernel: feat stream [9,K] read; writes color [T,3,n_pix] +
    #   final_t [T,1,n_pix] + packed residual ct [T,4?,n_pix] + used [K]
    fwd_bytes = 4 * (9 * k + num_tiles * n_pix * (3 + 1 + 4) + k)
    # bwd kernel: feat + residual + cotangent read, dfeat [9,K] written
    bwd_bytes = 4 * (9 * k + num_tiles * n_pix * (4 + 4) + 9 * k)
    # slot features: table rows gathered [K,9] read + [9,K] written +
    #   gid/bounds reads
    gather_bytes = 4 * (9 * k + 9 * k + k)
    # per-slot-pixel flop estimates (documented in module docstring)
    fwd_flops = 20.0 * k * n_pix
    bwd_flops = 50.0 * k * n_pix

    rows = []

    def row(name, ms, byts=None, flops=None):
        gbs = byts / ms / 1e6 if byts else None
        tflops = flops / ms / 1e9 if flops else None
        rows.append((name, ms, gbs, tflops))

    row("preprocess (P-major)", timeit(pre),
        byts=4 * p * (3 + 3 + 4 + 1 + 3 * (sh + 1) ** 2 + 16))
    row("binning (expand+sorts)", timeit(binf),
        byts=4 * k * (2 + 9 + 2) + 4 * p * 6)
    row("slot-feature gather", timeit(featf), byts=gather_bytes)
    row("fwd blend kernel", timeit(kern), byts=fwd_bytes, flops=fwd_flops)
    row("bwd blend kernel", timeit(kbwd), byts=bwd_bytes, flops=bwd_flops)
    row("FULL fwd+bwd (all ops)", timeit(gfull, scene, n=5))

    print()
    print("| stage | ms | GB/s (analytic bytes) | % HBM peak | est TFLOP/s |")
    print("|---|---|---|---|---|")
    for name, ms, gbs, tf in rows:
        g = f"{gbs:.0f}" if gbs else "—"
        pc = f"{100 * gbs / HBM_PEAK_GBS:.0f}%" if gbs else "—"
        t = f"{tf:.2f}" if tf else "—"
        print(f"| {name} | {ms:.2f} | {g} | {pc} | {t} |")


if __name__ == "__main__":
    main()
