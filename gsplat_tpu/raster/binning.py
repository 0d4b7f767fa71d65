"""Depth-ordered tile binning with static shapes.

TPU-native replacement for the reference's CUB pipeline
(rasterizer_impl.cu:198-338): inclusive scan of tiles_touched ->
duplicateWithKeys -> 64-bit radix sort -> identifyTileRanges.

Design (SURVEY.md §2d): JAX shapes must be static, so instead of allocating
``num_rendered`` duplicates we fix a duplicate budget ``K_dup`` and expand
Gaussian->tile pairs with the searchsorted trick:

  offsets = exclusive_cumsum(tiles_touched)
  for each duplicate slot d:  g = searchsorted(offsets, d) - 1
                              r = d - offsets[g]   (r-th tile of g's rect)

Pairs are sorted by (tile_id, depth) with XLA's variadic sort (the
replacement for DeviceRadixSort), and per-tile ranges are recovered by
searchsorted over the sorted tile ids. Overflow beyond K_dup is reported,
never silent (`num_dup` vs K_dup; callers should grow the budget).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from gsplat_tpu.raster.project import Preprocessed, tile_rect


class Binning(NamedTuple):
    gid: jnp.ndarray          # [K_dup] int32 gaussian index per sorted duplicate
    tile_starts: jnp.ndarray  # [grid_x*grid_y + 1] int32 range starts
    num_dup: jnp.ndarray      # [] int32 true duplicate count (overflow if > K_dup)
    radius: jnp.ndarray       # [P] int32 radius with empty-rect Gaussians zeroed
                              # (matches forward.cu:236-237 early-out)


def bin_gaussians(proc: Preprocessed, *, tile_x: int, tile_y: int,
                  grid_x: int, grid_y: int, k_dup: int) -> Binning:
    """Expand visible Gaussians into depth-sorted per-tile duplicate lists."""
    p = proc.xy.shape[0]
    num_tiles = grid_x * grid_y

    min_x, min_y, max_x, max_y = tile_rect(
        proc.xy, proc.radius, tile_x, tile_y, grid_x, grid_y)
    rect_w = max_x - min_x
    rect_h = max_y - min_y
    counts = jnp.where(proc.visible, rect_w * rect_h, 0).astype(jnp.int32)
    radius = jnp.where(counts > 0, proc.radius, 0)

    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts, dtype=jnp.int32)])
    num_dup = offsets[-1]

    d = jnp.arange(k_dup, dtype=jnp.int32)
    g = jnp.searchsorted(offsets, d, side="right").astype(jnp.int32) - 1
    g = jnp.clip(g, 0, p - 1)
    r = d - offsets[g]
    w = jnp.maximum(rect_w[g], 1)
    tx = min_x[g] + r % w
    ty = min_y[g] + r // w
    tile_id = ty * grid_x + tx
    valid = d < num_dup
    tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    # Two-key sort: (tile, depth), carrying the gaussian id — the XLA
    # equivalent of sorting packed [tile|depth-bits] 64-bit keys.
    tile_key_sorted, _, gid_sorted = lax.sort(
        (tile_key, proc.depth[g], g), dimension=0, num_keys=2)

    tile_starts = jnp.searchsorted(
        tile_key_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    return Binning(gid=gid_sorted, tile_starts=tile_starts,
                   num_dup=num_dup, radius=radius)
