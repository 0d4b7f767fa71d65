"""Depth-ordered tile binning with static shapes.

TPU-native replacement for the reference's CUB pipeline
(rasterizer_impl.cu:198-338): inclusive scan of tiles_touched ->
duplicateWithKeys -> 64-bit radix sort -> identifyTileRanges.

Design (SURVEY.md §2d): JAX shapes must be static, so instead of allocating
``num_rendered`` duplicates we fix a duplicate budget ``k_dup``. Overflow is
reported, never silent (``num_dup`` vs k_dup).

TPU performance notes (validated against jax.profiler traces, round 2):
- Gather/scatter cost ~8-15 ns PER INDEX regardless of payload width, so
  the design minimizes index counts: one packed row-gather per duplicate
  (then a single layout copy to a dense ``[cols, K]`` array that every
  elementwise consumer reads cheaply), and NO per-duplicate histograms.
- The per-tile duplicate counts (the reference's tiles_touched scan) come
  from an MXU matmul: y-coverage [grid_y, P] @ x-coverage [P, grid_x] of
  the tile rects — exact for 0/1 inputs even at bf16, zero scatters.
- Gaussians are PRE-SORTED by depth, so the big per-duplicate sort is a
  STABLE single-key (tile) sort; when bits allow, key and payload are
  PACKED into one uint32 (tile high, depth rank low) and the sort runs
  over a single array — the TPU analogue of the reference's 64-bit
  [tile|depth] radix keys (rasterizer_impl.cu:90-103).
- Tile-list padding (each non-empty tile's list padded to a CHUNK multiple
  for the Pallas kernel) is fused INTO the sort via per-tile pad candidates
  that sort behind their tile's real duplicates. Empty tiles get no slots.
- Binning rects are the intersection of the reference's 3-sigma circle box
  with the AABB of the alpha >= 1/255 conic ellipse (opacity-aware AND
  anisotropy-aware) — image-identical to the reference's semantics with
  strictly fewer duplicates; see the rect derivation at the top of
  ``bin_gaussians``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gsplat_tpu.raster.project import Preprocessed, tile_rect
from gsplat_tpu.raster.scan_kernel import expand_scan, merge_expand


class Binning(NamedTuple):
    gid: jnp.ndarray          # [K_slots] int32 DEPTH-SORTED-space gaussian id
                              # per padded slot; == P for padding slots
    order: jnp.ndarray        # [P] int32: depth rank -> original gaussian id
    inv_order: jnp.ndarray    # [P] int32: original gaussian id -> depth rank
                              # (the transpose of a permutation gather is a
                              # gather by the inverse — an XLA scatter-add
                              # costs 85 ns/index at P=1M, the gather 7)
    tile_of_slot: jnp.ndarray  # [K_slots] int32 tile id (clamped)
    chunk_meta: jnp.ndarray   # [K_slots/chunk] int32 packed per kernel chunk:
                              # tile_id << 2 | is_first << 1 | is_last
                              # (sentinel chunks carry tile_id == num_tiles)
    tile_len: jnp.ndarray     # [T] int32 rect duplicates per tile
    num_dup: jnp.ndarray      # [] int32 true duplicate count (overflow if > k_dup)
    radius: jnp.ndarray       # [P] int32 radius, empty-rect Gaussians zeroed
                              # (matches forward.cu:236-237 early-out)
    used: jnp.ndarray         # [P] bool — has >= 1 surviving (non-culled)
                              # duplicate (TILE granularity; exposed as
                              # ``used_tile``). The fork's elementwise
                              # is_used flag (forward.cu:364) comes from the
                              # blend kernel's per-slot contribution counts
                              # (rasterize.py), not from binning.
    seg_bounds: jnp.ndarray   # [P+1] int32: start of depth-rank r's
                              # contiguous segment in gid-sorted slot order
                              # (cumsum of fitting counts) — hands the
                              # gradient reduction its segment bounds for
                              # free (a searchsorted over 1.5M sorted gids
                              # measured ~27 ms/step at the 1M-cap scale)
    feat_table: Optional[jnp.ndarray] = None
                              # [P, F] f32 caller-supplied per-gaussian
                              # feature rows REORDERED to depth-rank space
                              # by riding the depth sort as payloads —
                              # DIFFERENTIABLE (custom VJP: one row-gather
                              # by the inverse permutation). Present iff
                              # ``feat_table`` was passed to bin_gaussians.


@jax.custom_vjp
def _sort_with_table(depth_key, rect_all, table):
    """Depth sort carrying ``table``'s columns as extra payloads.

    Returns (order, inv_order, rect_sorted, table_sorted). Replaces the
    separate [P, F] permutation gather of the feature table (6.5 ms at
    P=1M on v5e vs ~0.35 ms/payload of extra sort time; the backward is
    the SAME inverse-permutation row gather either way). XLA simplifies
    the column slicing against the stack that built ``table``, so the
    pre-sort [P, F] array is never materialized. Differentiable in
    ``table`` only — the keys are integer bookkeeping."""
    return _sort_with_table_fwd(depth_key, rect_all, table)[0]


def _sort_with_table_fwd(depth_key, rect_all, table):
    p = depth_key.shape[0]
    iota_p = jnp.arange(p, dtype=jnp.int32)
    cols = tuple(table[:, i] for i in range(table.shape[1]))
    out = lax.sort((depth_key, iota_p, rect_all) + cols, dimension=0,
                   num_keys=1)
    order = out[1]
    _, inv_order = lax.sort((order, iota_p), dimension=0, num_keys=1)
    table_d = jnp.stack(out[3:], axis=1)
    return (order, inv_order, out[2], table_d), inv_order


def _sort_with_table_bwd(inv_order, cots):
    # cotangents for the int outputs arrive as float0; only table matters.
    # The transpose of a permutation gather is a gather by the inverse
    # (an XLA scatter costs 85 ns/index at P=1M, the gather ~7).
    d_table_d = cots[3]
    zero_i = np.zeros(inv_order.shape, dtype=jax.dtypes.float0)
    return (jnp.zeros(inv_order.shape, jnp.float32), zero_i,
            d_table_d[inv_order])


_sort_with_table.defvjp(_sort_with_table_fwd, _sort_with_table_bwd)


def num_slots(k_dup: int, num_tiles: int, chunk: int) -> int:
    """Static padded slot count: budget + one pad chunk per tile."""
    return (-(-k_dup // chunk)) * chunk + num_tiles * chunk


def _tile_histogram(min_x, min_y, max_x, max_y, active, grid_x, grid_y):
    """Per-tile rect-coverage counts WITHOUT a scatter histogram: one MXU
    matmul of interval-coverage masks. 0/1 inputs make bf16 matmul exact;
    counts < 2^24 are exact in the f32 accumulator."""
    gy = jnp.arange(grid_y, dtype=jnp.int32)[:, None]    # [grid_y, 1]
    gx = jnp.arange(grid_x, dtype=jnp.int32)[None, :]    # [1, grid_x]
    cov_y = ((gy >= min_y[None, :]) & (gy < max_y[None, :])
             & active[None, :]).astype(jnp.float32)      # [grid_y, P]
    cov_x = ((gx >= min_x[:, None]) & (gx < max_x[:, None])
             ).astype(jnp.float32)                       # [P, grid_x]
    counts = lax.dot_general(cov_y, cov_x, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return counts.reshape(-1).astype(jnp.int32)          # [grid_y * grid_x]


def bin_gaussians(proc: Preprocessed, *, tile_x: int, tile_y: int,
                  grid_x: int, grid_y: int, k_dup: int,
                  chunk: int = 128, align: int = 1,
                  interpret: bool = False,
                  feat_table=None) -> Binning:
    """Expand visible Gaussians into depth-sorted, chunk-padded per-tile
    duplicate lists. ``align`` rounds the total slot count up to a multiple
    of ``align`` chunks with trailing sentinel chunks (the super-chunked
    render kernel consumes fixed groups of chunks per grid step).
    ``feat_table``: optional [P, F] DIFFERENTIABLE per-gaussian feature
    rows to reorder into depth-rank space by riding the depth sort
    (see _sort_with_table); returned as ``Binning.feat_table``."""
    p = proc.xy.shape[0]
    num_tiles = grid_x * grid_y

    # Binning rect: the reference uses the tile box of the 3-sigma CIRCLE
    # (forward.cu:232, getRect auxiliary.h:46-56). Every pixel the kernel
    # actually composites has alpha >= 1/255 (forward.cu:345-346), i.e. lies
    # in the conic ellipse Q(d) <= r_a^2 := 2 ln(255 opa). The AABB of that
    # ellipse has per-axis half-extents r_a*sqrt(Sigma_xx) / r_a*sqrt(
    # Sigma_yy) (Sigma = conic^-1 is the 2D covariance), so
    #   rect = ellipse-AABB tile rect  ∩  reference circle tile rect
    # contains every composited pixel of the reference rect: image-identical
    # to the CUDA semantics with strictly fewer duplicates — sharper both
    # for low-opacity Gaussians (opacity-aware r_a) and anisotropic ones
    # (minor-axis extent instead of the major-axis circle radius).
    #
    # Truncation subtlety: getRect's exclusive max ((p + r + tile-1)/tile,
    # truncated) itself drops tiles the splat reaches by < 1 pixel — that
    # truncation IS the reference semantics and only the circle rect may
    # apply it. The ellipse rect must be CONSERVATIVE (floor((p+r)/tile)+1)
    # so the intersection never drops a composited pixel the circle rect
    # keeps (a ceil'd integer extent fed through getRect loses real
    # contributions exactly at tile boundaries).
    rmin_x, rmin_y, rmax_x, rmax_y = tile_rect(
        proc.xy, proc.radius, tile_x, tile_y, grid_x, grid_y)
    det_con = (proc.conic[:, 0] * proc.conic[:, 2]
               - proc.conic[:, 1] ** 2)
    det_safe = jnp.maximum(det_con, 1e-24)
    sigma_xx = proc.conic[:, 2] / det_safe
    sigma_yy = proc.conic[:, 0] / det_safe
    r_a2 = 2.0 * jnp.log(jnp.maximum(255.0 * proc.opacity, 1e-12))
    r_a2 = jnp.maximum(r_a2, 0.0)
    ex = jnp.sqrt(r_a2 * jnp.maximum(sigma_xx, 0.0))
    ey = jnp.sqrt(r_a2 * jnp.maximum(sigma_yy, 0.0))
    gx_, gy_ = proc.xy[:, 0], proc.xy[:, 1]
    emin_x = jnp.clip(jnp.floor((gx_ - ex) / tile_x), 0, grid_x
                      ).astype(jnp.int32)
    emax_x = jnp.clip(jnp.floor((gx_ + ex) / tile_x) + 1, 0, grid_x
                      ).astype(jnp.int32)
    emin_y = jnp.clip(jnp.floor((gy_ - ey) / tile_y), 0, grid_y
                      ).astype(jnp.int32)
    emax_y = jnp.clip(jnp.floor((gy_ + ey) / tile_y) + 1, 0, grid_y
                      ).astype(jnp.int32)
    min_x = jnp.maximum(rmin_x, emin_x)
    max_x = jnp.minimum(rmax_x, emax_x)
    min_y = jnp.maximum(rmin_y, emin_y)
    max_y = jnp.minimum(rmax_y, emax_y)
    w_rect = jnp.maximum(max_x - min_x, 0)
    h_rect = jnp.maximum(max_y - min_y, 0)
    ok_opa = proc.opacity >= 1.0 / 255.0

    # All per-gaussian rect fields ride ONE u32 (minx, miny, w, h): the
    # reorder into depth-rank space then costs nothing extra — the packed
    # word rides the depth sort as a second PAYLOAD operand (a separate
    # [P, 2] row gather by ``order`` measured 5.2 ms at P=1M on v5e; the
    # extra sort operand costs ~0.8 ms).
    xb = max(int(grid_x).bit_length(), 1)    # holds 0..grid_x inclusive
    yb = max(int(grid_y).bit_length(), 1)
    assert 2 * (xb + yb) <= 31, f"rect pack overflow: grid {grid_x}x{grid_y}"
    active = proc.visible & ok_opa & (w_rect > 0) & (h_rect > 0)
    w_m = jnp.where(active, w_rect, 0)
    h_m = jnp.where(active, h_rect, 0)
    rect_all = ((min_x << (yb + xb + yb)) | (min_y << (xb + yb))
                | (w_m << yb) | h_m)

    # ---- depth pre-sort: all later work happens in depth-rank space ----
    depth_key = jnp.where(active, proc.depth, jnp.inf)
    if feat_table is not None:
        order, inv_order, rect_all_d, feat_table_d = _sort_with_table(
            depth_key, rect_all, feat_table)
    else:
        iota_p = jnp.arange(p, dtype=jnp.int32)
        _, order, rect_all_d = lax.sort((depth_key, iota_p, rect_all),
                                        dimension=0, num_keys=1)
        _, inv_order = lax.sort((order, iota_p), dimension=0, num_keys=1)
        feat_table_d = None
    minx_o = rect_all_d >> (yb + xb + yb)
    miny_o = (rect_all_d >> (xb + yb)) & ((1 << yb) - 1)
    w_o = (rect_all_d >> yb) & ((1 << xb) - 1)
    h_o = rect_all_d & ((1 << yb) - 1)
    counts = w_o * h_o
    # radii output keeps the reference's 3-sigma semantics (forward.cu:251):
    # zero only when the 3-sigma rect itself is empty.
    ref_rect = (rmax_x - rmin_x) * (rmax_y - rmin_y)
    radius = jnp.where(proc.visible & (ref_rect > 0), proc.radius, 0)

    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts, dtype=jnp.int32)])
    num_dup = offsets[-1]

    # --- duplicate expansion: slot -> owning gaussian via marker scans ---
    # Depth-sorted actives occupy the prefix and active <=> count > 0, so
    # the slot ranges [offsets[g], offsets[g+1]) are CONTIGUOUS: every slot
    # d < num_dup belongs to exactly one range, owned by the LAST gaussian
    # with starts[g] <= d. Consequences (each removes work the round-2
    # pipeline paid for):
    # - the in-budget test collapses to a scalar threshold d < dup_limit
    #   (end of the last range that fully fits the budget) — no per-slot
    #   h/count decode at all;
    # - per-slot values need only (min_x, min_y, w) + a marker bit plus
    #   the owner's start and rank, resolved by one of two equivalent
    #   fixed-shape pipelines chosen STATICALLY by cost (both measured on
    #   v5e at the 1M-cap scale, traces): a scatter-max of markers +
    #   fused owner-scan costs ~8.8 ns per GAUSSIAN (the scatter walks all
    #   P rows); scan_kernel.merge_expand's windowed candidate merge costs
    #   ~2.55 ns per SLOT (it never scatters). Tight-budget configs
    #   (slots within ~3.7x of P, e.g. the 1M-cap trainer) take the
    #   merge; high-duplication configs (renderer: P=100k, ~9 P slots)
    #   keep the scatter — see the crossover fit below.
    starts = offsets[:p]  # ascending (cumsum); >= k_dup rows drop
    d = jnp.arange(k_dup, dtype=jnp.int32)
    # marker bit on top keeps the pack nonzero even for a (0,0) rect corner
    pack = ((1 << (2 * xb + yb)) | (minx_o << (xb + yb))
            | (miny_o << xb) | w_o)
    # Crossover from four hardware measurements (v5e traces, after the
    # relayout-free T(1,128) merge kernel): merge is LINEAR at ~2.55
    # ns/slot (0.67 ms @ K=263k ... 4.61 @ 1.82M); scatter+expand_scan is
    # ~8.8 ns/GAUSSIAN + ~0.2 ns/slot (0.94 @ P=100k/K=263k, 9.2 @
    # P=1M/K=1.82M). Equal cost at K ~= 3.74 P; the renderer's
    # high-duplication shape (P=100k, K=877k = 8.8 P: 2.15 vs 1.06)
    # stays on the scatter, everything tighter takes the merge:
    if 2 * k_dup < 7 * p:
        pack_d, base_of_d, rank_d = merge_expand(starts, pack, k_dup,
                                                 interpret=interpret)
    else:
        fill = jnp.zeros((k_dup,), jnp.int32)  # fill must LOSE the max
        marked = fill.at[starts].max(pack, mode="drop",
                                     indices_are_sorted=True)
        base_in = jnp.where(marked > 0, d, 0)
        pack_d, base_of_d, rank_d = expand_scan(marked, base_in,
                                                interpret=interpret)
    g_of_d = rank_d - 1
    minx_dd = (pack_d >> (xb + yb)) & ((1 << xb) - 1)
    miny_dd = (pack_d >> xb) & ((1 << yb) - 1)
    w_d = pack_d & ((1 << xb) - 1)
    r = d - base_of_d
    w_dd = jnp.maximum(w_d, 1)
    tx = minx_dd + r % w_dd
    ty = miny_dd + r // w_dd
    tile_id = ty * grid_x + tx

    # A duplicate is real iff its whole rect fits the budget: dup_limit is
    # the end of the last fully-fitting contiguous range, so the straddling
    # gaussian (if any) is dropped wholesale, keeping the coverage
    # histogram below (masked by the same whole-rect `fits` rule) exactly
    # consistent with the sorted keys; overflow is reported via num_dup and
    # the training loops regrow the budget. No per-duplicate contribution
    # cull: the kernel's own 1/255 alpha floor drops sub-threshold
    # contributions per pixel (forward.cu:345-346 semantics).
    dup_limit = offsets[jnp.searchsorted(offsets, k_dup, side="right") - 1]
    in_budget = d < jnp.minimum(dup_limit, num_dup)
    dup_key = jnp.where(in_budget, tile_id, num_tiles).astype(jnp.int32)
    dup_rank = jnp.where(in_budget, g_of_d, p)

    # --- per-tile pad candidates so sorted order is chunk-aligned ---
    # (rect counts per tile from the MXU coverage matmul, masked to the
    # same fully-fitting gaussians; pads only for NON-EMPTY tiles — empty
    # tiles get no slots at all)
    fits = (counts > 0) & (offsets[:p] + counts <= k_dup)
    len_t = _tile_histogram(minx_o, miny_o, minx_o + w_o, miny_o + h_o,
                            fits, grid_x, grid_y)
    pads_t = jnp.where(len_t > 0, (-(-len_t // chunk)) * chunk - len_t, 0)
    tile_ids_2d = jnp.arange(num_tiles, dtype=jnp.int32)[:, None]
    pad_valid_2d = (jnp.arange(chunk, dtype=jnp.int32)[None, :]
                    < pads_t[:, None])
    pad_key = jnp.where(pad_valid_2d, tile_ids_2d, num_tiles).reshape(-1)

    k_aligned = (-(-k_dup // chunk)) * chunk
    dup_pad = k_aligned - k_dup  # align the budget itself
    total = k_aligned + num_tiles * chunk
    tail_pad = (-total) % (chunk * align)  # sentinel chunks to align total
    all_keys = jnp.concatenate([
        dup_key, jnp.full((dup_pad,), num_tiles, jnp.int32), pad_key,
        jnp.full((tail_pad,), num_tiles, jnp.int32)])
    all_rank = jnp.concatenate([
        dup_rank,
        jnp.full((dup_pad + num_tiles * chunk + tail_pad,), p, jnp.int32)])

    # stable single-key sort: within a tile, slots stay in depth order.
    # Packed single-array path when (tile, rank) fits in 32 bits — the
    # common case (e.g. 4096 tiles x 1M cap is the boundary).
    rank_bits = max(int(p).bit_length(), 1)  # holds 0..p inclusive
    if (num_tiles + 1) <= (1 << (32 - rank_bits)):
        packed = ((all_keys.astype(jnp.uint32) << rank_bits)
                  | all_rank.astype(jnp.uint32))
        # is_stable=False: ties only among same-tile pads/sentinels whose
        # order is irrelevant — keeps XLA's fast single-array sort path.
        packed = lax.sort(packed, dimension=0, is_stable=False)
        key_sorted = (packed >> rank_bits).astype(jnp.int32)
        gid_sorted = (packed & jnp.uint32((1 << rank_bits) - 1)
                      ).astype(jnp.int32)
    else:
        key_sorted, gid_sorted = lax.sort((all_keys, all_rank), dimension=0,
                                          num_keys=1, is_stable=True)

    tile_of_slot = jnp.minimum(key_sorted, num_tiles - 1)
    # Packed per-chunk metadata (tile << 2 | first << 1 | last): ONE
    # scalar-prefetch operand instead of three — each extra prefetch array
    # costs its own HBM->SMEM staging copy (~1.6ms at 44k chunks, measured).
    # The sentinel tile id (== num_tiles) survives the shift so the kernel
    # can skip fully-invalid trailing chunks entirely.
    chunk_tile = key_sorted[::chunk]
    change = (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32)
    one = jnp.ones((1,), jnp.int32)
    chunk_first = jnp.concatenate([one, change])
    chunk_last = jnp.concatenate([change, one])
    chunk_meta = (chunk_tile << 2) | (chunk_first << 1) | chunk_last

    # ``used`` derives elementwise in [P]-space (a gaussian is used iff its
    # whole rect fits the budget == exactly the in_budget rule) — the
    # round-1 K-sized scatter from dup_rank paid ~9ns per SLOT for a fact
    # already known per gaussian. Rank -> original id is a permutation, so
    # the reorder is a gather by the inverse, not a scatter; gather as a
    # 2-column s32 row (pred 1-col: 0.85 ms, s32 1-col: 0.66 ms, s32 2-col
    # row: ~0.2 ms at P=100k on v5e — see the rect_all gather note).
    fits_i = fits.astype(jnp.int32)
    used = jnp.stack([fits_i, fits_i], 1)[inv_order][:, 0] > 0

    seg_bounds = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(jnp.where(fits, counts, 0), dtype=jnp.int32)])

    return Binning(gid=gid_sorted, order=order, inv_order=inv_order,
                   tile_of_slot=tile_of_slot, chunk_meta=chunk_meta,
                   tile_len=len_t, num_dup=num_dup, radius=radius, used=used,
                   seg_bounds=seg_bounds, feat_table=feat_table_d)
