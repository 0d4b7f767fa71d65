"""Depth-ordered tile binning with static shapes.

TPU-native replacement for the reference's CUB pipeline
(rasterizer_impl.cu:198-338): inclusive scan of tiles_touched ->
duplicateWithKeys -> 64-bit radix sort -> identifyTileRanges.

Design (SURVEY.md §2d): JAX shapes must be static, so instead of allocating
``num_rendered`` duplicates we fix a duplicate budget ``k_dup``. Overflow is
reported, never silent (``num_dup`` vs k_dup).

TPU performance notes:
- Element-wise gather/scatter/searchsorted are the enemy. Every
  variable-length range lookup is a SCATTER of O(P) range-start markers
  followed by a cumulative max (a vectorized prefix scan):
      owner(d)      = cummax_d( scatter(g          at offsets[g]) )
      range_base(d) = cummax_d( scatter(offsets[g] at offsets[g]) )
- Gaussians are PRE-SORTED by depth, so the big per-duplicate sort is a
  STABLE single-key (tile) sort — depth order within each tile comes for
  free and the depth array never rides through the bitonic passes.
- Tile-list padding (each non-empty tile's list padded to a CHUNK multiple
  for the Pallas kernel) is fused INTO the sort via per-tile pad candidates
  that sort behind their tile's real duplicates. Empty tiles get no slots at
  all; their output blocks are patched to background outside the kernel
  (see rasterize.py, `tile_len`).
- Binning rects use the exact alpha-cutoff radius min(3sigma, r_cut) and a
  per-duplicate eigenvalue-bound contribution cull — both image-identical
  to the reference's semantics, both sharply reducing duplicate counts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from gsplat_tpu.raster.project import Preprocessed, tile_rect


class Binning(NamedTuple):
    gid: jnp.ndarray          # [K_slots] int32 DEPTH-SORTED-space gaussian id
                              # per padded slot; == P for padding slots
    order: jnp.ndarray        # [P] int32: depth rank -> original gaussian id
    tile_of_slot: jnp.ndarray  # [K_slots] int32 tile id (clamped)
    chunk_tile: jnp.ndarray   # [K_slots/chunk] int32 tile per kernel chunk
    chunk_first: jnp.ndarray  # [K_slots/chunk] int32 1 at a tile's 1st chunk
    tile_len: jnp.ndarray     # [T] int32 real duplicates per tile
    num_dup: jnp.ndarray      # [] int32 true duplicate count (overflow if > k_dup)
    radius: jnp.ndarray       # [P] int32 radius, empty-rect Gaussians zeroed
                              # (matches forward.cu:236-237 early-out)
    used: jnp.ndarray         # [P] bool — has >= 1 surviving (non-culled)
                              # duplicate; the fork's is_used flag
                              # (forward.cu:364) at tile granularity


def _owner_scan(starts, values, k: int, fill):
    """For each slot d in [0, k): the value scattered at the largest
    range-start <= d. Rows with start >= k are dropped."""
    marks = jnp.full((k,), fill, values.dtype).at[starts].max(values,
                                                              mode="drop")
    return lax.cummax(marks)


def num_slots(k_dup: int, num_tiles: int, chunk: int) -> int:
    """Static padded slot count: budget + one pad chunk per tile."""
    return (-(-k_dup // chunk)) * chunk + num_tiles * chunk


def bin_gaussians(proc: Preprocessed, *, tile_x: int, tile_y: int,
                  grid_x: int, grid_y: int, k_dup: int,
                  chunk: int = 128) -> Binning:
    """Expand visible Gaussians into depth-sorted, chunk-padded per-tile
    duplicate lists."""
    p = proc.xy.shape[0]
    num_tiles = grid_x * grid_y

    # Binning rect: the reference uses the 3-sigma radius (forward.cu:232).
    # Any pixel at distance r from the center has alpha <= opa *
    # exp(-lmin(conic) r^2 / 2), so r_cut = sqrt(2 ln(255 opa) / lmin) bounds
    # every >=1/255 contribution. min(3sigma, r_cut) keeps reference
    # semantics (never larger than the reference rect) while shrinking the
    # rect sharply for low-opacity Gaussians — image-identical, fewer dups.
    a_ = proc.conic[:, 0]
    b2_ = proc.conic[:, 1] ** 2
    c_ = proc.conic[:, 2]
    mid_ = 0.5 * (a_ + c_)
    lmin_ = jnp.maximum(
        mid_ - jnp.sqrt(jnp.maximum(mid_ * mid_ - (a_ * c_ - b2_), 0.0)),
        1e-12)
    log_term = jnp.log(jnp.maximum(255.0 * proc.opacity, 1e-12))
    r_cut = jnp.ceil(jnp.sqrt(jnp.maximum(2.0 * log_term, 0.0) / lmin_))
    r_bin = jnp.minimum(proc.radius, r_cut.astype(jnp.int32))
    r_bin = jnp.where(proc.opacity >= 1.0 / 255.0, r_bin, 0)

    # ---- depth pre-sort: all later work happens in depth-rank space ----
    depth_key = jnp.where(proc.visible & (r_bin > 0), proc.depth, jnp.inf)
    _, order = lax.sort((depth_key, jnp.arange(p, dtype=jnp.int32)),
                        dimension=0, num_keys=1)

    min_x, min_y, max_x, max_y = tile_rect(
        proc.xy, r_bin, tile_x, tile_y, grid_x, grid_y)
    counts = jnp.where(proc.visible & (r_bin > 0),
                       (max_x - min_x) * (max_y - min_y), 0
                       ).astype(jnp.int32)[order]
    # radii output keeps the reference's 3-sigma semantics (forward.cu:251):
    # zero only when the 3-sigma rect itself is empty.
    rmin_x, rmin_y, rmax_x, rmax_y = tile_rect(
        proc.xy, proc.radius, tile_x, tile_y, grid_x, grid_y)
    ref_rect = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    radius = jnp.where(proc.visible & (ref_rect > 0), proc.radius, 0)

    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts, dtype=jnp.int32)])
    num_dup = offsets[-1]

    # --- duplicate expansion: slot -> owning gaussian via marker scans ---
    g_ids = jnp.arange(p, dtype=jnp.int32)
    starts = jnp.where(counts > 0, offsets[:p], k_dup)  # >= k_dup => dropped
    g_of_d = _owner_scan(starts, g_ids, k_dup, jnp.int32(0))
    base_of_d = _owner_scan(starts, offsets[:p], k_dup, jnp.int32(0))
    d = jnp.arange(k_dup, dtype=jnp.int32)
    r = d - base_of_d

    # packed per-gaussian rect/conic table IN DEPTH ORDER -> one row gather
    table = jnp.stack([min_x.astype(jnp.float32), min_y.astype(jnp.float32),
                       jnp.maximum(max_x - min_x, 1).astype(jnp.float32),
                       proc.xy[:, 0], proc.xy[:, 1],
                       proc.opacity, lmin_], axis=1)[order]  # [P, 7]
    rows = table[g_of_d]  # [k_dup, 7]
    w = rows[:, 2].astype(jnp.int32)
    tx = rows[:, 0].astype(jnp.int32) + r % w
    ty = rows[:, 1].astype(jnp.int32) + r // w
    tile_id = ty * grid_x + tx

    # Contribution culling (conservative, image-exact): the kernel skips any
    # contribution with alpha < 1/255 (forward.cu:345-346). For every pixel q
    # of the tile, power(q) <= -0.5 * lmin(conic) * |q - center|^2, so if
    # opa * exp(-0.5 * lmin * dist^2) < 1/255 with dist the center-to-tile
    # distance, the duplicate cannot contribute anywhere in its tile.
    cx = jnp.clip(rows[:, 3],
                  (tx * tile_x).astype(jnp.float32),
                  (tx * tile_x + (tile_x - 1)).astype(jnp.float32))
    cy = jnp.clip(rows[:, 4],
                  (ty * tile_y).astype(jnp.float32),
                  (ty * tile_y + (tile_y - 1)).astype(jnp.float32))
    dx = cx - rows[:, 3]
    dy = cy - rows[:, 4]
    power_bound = -0.5 * rows[:, 6] * (dx * dx + dy * dy)
    # tiny safety margin so f32 rounding can't drop a borderline contribution
    contributes = rows[:, 5] * jnp.exp(power_bound) >= (0.999 / 255.0)

    valid = (d < num_dup) & contributes
    dup_tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    # --- per-tile pad candidates so sorted order is chunk-aligned ---
    # len_t via histogram; pads only for NON-EMPTY tiles (empty tiles get no
    # slots; their output blocks are patched outside the kernel)
    len_t = jnp.zeros((num_tiles,), jnp.int32).at[dup_tile_key].add(
        valid.astype(jnp.int32), mode="drop")
    pads_t = jnp.where(
        len_t > 0, (-(-len_t // chunk)) * chunk - len_t, 0)  # [0, chunk)
    # broadcasting instead of a [T*chunk] gather (2ms saved at 2500 tiles)
    tile_ids_2d = jnp.arange(num_tiles, dtype=jnp.int32)[:, None]
    pad_valid_2d = (jnp.arange(chunk, dtype=jnp.int32)[None, :]
                    < pads_t[:, None])
    pad_key = jnp.where(pad_valid_2d, tile_ids_2d, num_tiles).reshape(-1)

    k_aligned = (-(-k_dup // chunk)) * chunk
    dup_pad = k_aligned - k_dup  # align the budget itself
    all_keys = jnp.concatenate([
        dup_tile_key, jnp.full((dup_pad,), num_tiles, jnp.int32), pad_key])
    all_gid = jnp.concatenate([
        jnp.where(valid, g_of_d, p),  # sentinel for unused budget slots
        jnp.full((dup_pad + num_tiles * chunk,), p, jnp.int32)])

    # stable single-key sort: within a tile, slots stay in depth order
    key_sorted, gid_sorted = lax.sort((all_keys, all_gid), dimension=0,
                                      num_keys=1, is_stable=True)

    tile_of_slot = jnp.minimum(key_sorted, num_tiles - 1)
    # chunk_tile keeps the sentinel (== num_tiles) for fully-invalid trailing
    # chunks so the kernel can skip their bodies entirely.
    chunk_tile = key_sorted[::chunk]
    chunk_first = jnp.concatenate([
        jnp.ones((1,), jnp.int32),
        (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32)])

    used_sorted = (jnp.zeros((p + 1,), jnp.bool_)
                   .at[jnp.where(valid, g_of_d, p)].set(True)[:p])
    used = jnp.zeros((p,), jnp.bool_).at[order].set(used_sorted)

    return Binning(gid=gid_sorted, order=order, tile_of_slot=tile_of_slot,
                   chunk_tile=chunk_tile, chunk_first=chunk_first,
                   tile_len=len_t, num_dup=num_dup, radius=radius, used=used)
