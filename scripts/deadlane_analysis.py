"""Dead-lane analysis of the blend kernels at the 1M trained workload
(round-4 verdict ask #9).

The Pallas blend kernels evaluate every duplicate on ALL tile_x*tile_y
pixels of its tile (pixels on lanes): lanes a splat cannot reach are
computed anyway, where the CUDA reference's per-pixel threads skip them
via the per-pixel ``alpha < 1/255`` test (forward.cu:345-346). This script
quantifies that dead work exactly, on CPU, for the config of record
(cap 1M, 1296x840, 64x16 tiles, trained-statistics workload):

1. per-duplicate live-pixel fraction: alpha >= 1/255 coverage of the
   64x16 tile (the upper bound any skip mechanism can recover);
2. fully-dead duplicates: rect-AABB conservatism puts some duplicates in
   tiles their exact ellipse never touches (a binning-side cull bound);
3. per-(chunk, lane-granule) skippable fraction — the REALISTIC kernel
   lever: the fwd/bwd kernels could guard each 128-pixel lane granule
   (= 2 tile rows at 64x16) of a 128-gaussian chunk with @pl.when and
   skip it when NO gaussian in the chunk reaches those pixels. A granule
   is skippable only if all 128 chunk members are dead there, so this is
   far below bound (1).

Run:  python scripts/deadlane_analysis.py [--p 1000000] [--sample 300000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1_000_000)
    ap.add_argument("--sample", type=int, default=300_000)
    ap.add_argument("--tiles_sample", type=int, default=1500)
    ap.add_argument("--tile_x", type=int, default=64)
    ap.add_argument("--tile_y", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--positions", type=str, default="uniform")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _orbit_cameras
    from bench import trained_stats_state
    from gsplat_tpu.raster.project import preprocess

    w, h = 1296, 840
    sh = 1
    rng = np.random.default_rng(0)
    state, src = trained_stats_state(args.p, sh, rng,
                                     positions=args.positions)
    print(f"workload: {src}")
    cam = _orbit_cameras(4, w, h)[0]
    proc = preprocess(state.xyz, state.get_scaling(), state.get_rotation(),
                      state.get_opacity()[:, 0], state.get_features(), cam,
                      sh, alive=state.alive_mask)
    xy = np.asarray(proc.xy)
    conic = np.asarray(proc.conic)
    opa = np.asarray(proc.opacity)
    radius = np.asarray(proc.radius)
    visible = np.asarray(proc.visible)
    depth = np.asarray(proc.depth)

    tx, ty = args.tile_x, args.tile_y
    gx = -(-w // tx)
    gy = -(-h // ty)

    # rect per gaussian: ellipse-AABB ∩ 3-sigma circle rect (binning.py)
    rmin_x = np.clip((xy[:, 0] - radius) // tx, 0, gx).astype(np.int64)
    rmax_x = np.clip((xy[:, 0] + radius + tx - 1) // tx, 0, gx).astype(
        np.int64)
    rmin_y = np.clip((xy[:, 1] - radius) // ty, 0, gy).astype(np.int64)
    rmax_y = np.clip((xy[:, 1] + radius + ty - 1) // ty, 0, gy).astype(
        np.int64)
    det = conic[:, 0] * conic[:, 2] - conic[:, 1] ** 2
    det = np.maximum(det, 1e-24)
    sxx, syy = conic[:, 2] / det, conic[:, 0] / det
    r_a2 = np.maximum(2.0 * np.log(np.maximum(255.0 * opa, 1e-12)), 0.0)
    ex = np.sqrt(r_a2 * np.maximum(sxx, 0))
    ey = np.sqrt(r_a2 * np.maximum(syy, 0))
    emin_x = np.clip(np.floor((xy[:, 0] - ex) / tx), 0, gx).astype(np.int64)
    emax_x = np.clip(np.floor((xy[:, 0] + ex) / tx) + 1, 0, gx).astype(
        np.int64)
    emin_y = np.clip(np.floor((xy[:, 1] - ey) / ty), 0, gy).astype(np.int64)
    emax_y = np.clip(np.floor((xy[:, 1] + ey) / ty) + 1, 0, gy).astype(
        np.int64)
    min_x = np.maximum(rmin_x, emin_x)
    max_x = np.minimum(rmax_x, emax_x)
    min_y = np.maximum(rmin_y, emin_y)
    max_y = np.minimum(rmax_y, emax_y)
    wr = np.maximum(max_x - min_x, 0)
    hr = np.maximum(max_y - min_y, 0)
    active = visible & (opa >= 1 / 255) & (wr > 0) & (hr > 0)
    wr, hr = np.where(active, wr, 0), np.where(active, hr, 0)
    counts = wr * hr
    num_dup = int(counts.sum())
    print(f"num_dup (exact rect model): {num_dup}")

    # enumerate all duplicates: (gaussian, tile) pairs
    g_of_dup = np.repeat(np.arange(args.p), counts)
    local = np.arange(num_dup) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    tile_x_of = min_x[g_of_dup] + local % np.maximum(wr[g_of_dup], 1)
    tile_y_of = min_y[g_of_dup] + local // np.maximum(wr[g_of_dup], 1)
    tile_of = tile_y_of * gx + tile_x_of

    n_pix = tx * ty
    pxl = np.arange(n_pix)
    px = (pxl % tx).astype(np.float32)
    py = (pxl // tx).astype(np.float32)

    def live_mask(dups):
        """[len(dups), n_pix] bool: alpha >= 1/255 per tile pixel."""
        g = g_of_dup[dups]
        ox = (tile_x_of[dups] * tx).astype(np.float32)
        oy = (tile_y_of[dups] * ty).astype(np.float32)
        dx = (ox[:, None] + px[None, :]) - xy[g, 0][:, None]
        dy = (oy[:, None] + py[None, :]) - xy[g, 1][:, None]
        q = (conic[g, 0][:, None] * dx * dx
             + 2 * conic[g, 1][:, None] * dx * dy
             + conic[g, 2][:, None] * dy * dy)
        return q <= r_a2[g][:, None]

    # --- (1)+(2): per-duplicate coverage on a random duplicate sample ---
    if args.sample > 0:
        samp = rng.choice(num_dup, min(args.sample, num_dup),
                          replace=False)
        fracs = np.empty(len(samp), np.float32)
        bs = 20_000
        for i in range(0, len(samp), bs):
            fracs[i:i + bs] = live_mask(samp[i:i + bs]).mean(1)
        print(f"per-duplicate live-pixel fraction over {tx}x{ty} tiles:")
        print(f"  mean {fracs.mean():.4f} (dead-lane fraction "
              f"{1 - fracs.mean():.4f})")
        for q in (10, 25, 50, 75, 90, 99):
            print(f"  p{q}: {np.percentile(fracs, q):.4f}")
        print(f"  fully dead (exact ellipse misses tile): "
              f"{(fracs == 0).mean():.4f}", flush=True)

    # --- (3): per-(chunk, 128-px granule) skippable fraction, plus the
    # SATURATION simulation: which chunks does the existing whole-tile
    # done-exit already skip, and what would a per-granule done-skip add?
    tiles = rng.choice(gx * gy, min(args.tiles_sample, gx * gy),
                       replace=False)
    n_gran = n_pix // 128
    total_gran = 0
    dead_gran = 0
    done_gran = 0        # granule fully saturated BEFORE the chunk
    total_chunks = 0
    skipped_chunks = 0   # whole tile saturated before the chunk (the
                         # current kernels' early-exit)
    pad_slots = 0
    total_slots = 0

    def q_of(dups):
        g = g_of_dup[dups]
        ox = (tile_x_of[dups] * tx).astype(np.float32)
        oy = (tile_y_of[dups] * ty).astype(np.float32)
        dx = (ox[:, None] + px[None, :]) - xy[g, 0][:, None]
        dy = (oy[:, None] + py[None, :]) - xy[g, 1][:, None]
        return (conic[g, 0][:, None] * dx * dx
                + 2 * conic[g, 1][:, None] * dx * dy
                + conic[g, 2][:, None] * dy * dy), g

    for t in tiles:
        dups = np.nonzero(tile_of == t)[0]
        if not len(dups):
            continue
        dups = dups[np.argsort(depth[g_of_dup[dups]], kind="stable")]
        n_chunks = -(-len(dups) // args.chunk)
        pad_slots += n_chunks * args.chunk - len(dups)
        total_slots += n_chunks * args.chunk
        T = np.ones(n_pix, np.float32)
        for c in range(n_chunks):
            sl = dups[c * args.chunk:(c + 1) * args.chunk]
            done = T < 1e-4                        # before this chunk
            total_chunks += 1
            total_gran += n_gran
            if done.all():
                skipped_chunks += 1
                done_gran += n_gran
                continue
            done_gran += int(done.reshape(n_gran, 128).all(1).sum())
            q, g = q_of(sl)                        # ONE eval per chunk
            live = q <= r_a2[g][:, None]
            dead_gran += int(
                (~live.reshape(len(sl), n_gran, 128).any(2).any(0)).sum())
            a = np.minimum(opa[g][:, None] * np.exp(-0.5 * q), 0.99)
            a = np.where(a < 1.0 / 255.0, 0.0, a)
            T = T * np.prod(1.0 - a, axis=0)
    print(f"chunk-granule analysis over {len(tiles)} tiles, "
          f"{total_chunks} chunks (pad fraction "
          f"{pad_slots / max(total_slots, 1):.3f}):")
    print(f"  whole-chunk skips by the EXISTING tile-saturation exit: "
          f"{skipped_chunks / max(total_chunks, 1):.4f}")
    print(f"  additional (chunk,128-px-granule) pairs fully SATURATED "
          f"before the chunk: {done_gran / max(total_gran, 1):.4f}")
    print(f"  skippable by LIVENESS (no chunk member reaches granule): "
          f"{dead_gran / max(total_gran, 1):.4f}")
    print("  (a granule = 2 tile rows at 64x16; liveness skip needs ALL "
          f"{args.chunk} chunk members dead there)")


if __name__ == "__main__":
    main()
