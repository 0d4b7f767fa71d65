"""Public differentiable rasterization API.

Mirrors the reference rasterizer contract
(diff_gaussian_rasterization/__init__.py:157-226): inputs are Gaussian
parameters (+ optional precomputed colors / 3D covariances) and camera
settings; outputs are the rendered image, per-Gaussian screen radii and an
``is_used`` visibility flag. Gradients flow to means3D, scales, rotations,
opacities, SHs (and colors/cov3D when precomputed) — the chain rules the
reference hand-writes in backward.cu come from XLA autodiff around the
Pallas tile-blend custom-VJP op.

Layout strategy (performance-critical, see binning.py): the sort emits
duplicate lists already padded to CHUNK multiples per tile, so the kernel
feature stream is ONE packed row-gather by sorted gaussian id plus
elementwise math in LOCAL tile coordinates (fp32-exact at any image size).
The backward of that gather is the per-gaussian gradient scatter-add that
replaces the reference's atomicAdd reduction (backward.cu:523-554).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gsplat_tpu.core.camera import CameraParams
from gsplat_tpu.raster import binning as binning_lib
from gsplat_tpu.raster import project as project_lib
from gsplat_tpu.raster import tile_kernel


@dataclasses.dataclass(frozen=True)
class RasterizeSettings:
    """Static rasterizer configuration (hashable — safe as a jit static arg).

    k_dup is the static Gaussian->tile duplicate budget (the reference's
    dynamic ``num_rendered``, rasterizer_impl.cu:282). Overflow is reported
    via the returned ``num_dup`` — never silently truncated without signal.
    """

    k_dup: int
    tile_x: int = 32
    tile_y: int = 16
    chunk: int = 128
    # sub-chunks per kernel grid step (amortizes per-grid-step overhead,
    # ~0.3 us/chunk measured; see tile_kernel.SUPER)
    super_chunks: int = 8
    interpret: bool = False
    # Inference mode: bf16 feature stream, background composited in-kernel,
    # no transmittance residual (final_t returns zeros), NOT differentiable.
    inference: bool = False
    # Training-path image layout. "chw" skips the final [3,H,W]->[H,W,3]
    # transpose: an HWC device array puts the 3-channel axis on lanes,
    # which the TPU pads to 128 (42x the physical bytes for every
    # downstream op AND its gradient). The fused train step consumes CHW;
    # entry points that save images keep the default "hwc".
    layout: str = "hwc"


class RasterizeOutput(NamedTuple):
    image: jnp.ndarray     # [H, W, 3] f32 composited over background
                           # (layout="chw": [3, H, W] f32); inference mode:
                           # [3, H, W] bf16 (CHW — the reference layout,
                           # rasterize_points.cu:69)
    radii: jnp.ndarray     # [P] int32 (0 => culled)
    is_used: jnp.ndarray   # [P] bool — composited into >= 1 PIXEL, the
                           # fork's elementwise flag (forward.cu:364).
                           # Training path: exact (per-contribution OR from
                           # the kernel; the reduction is pure XLA, so it is
                           # dead-code-eliminated when not consumed).
                           # Inference path: tile-granular (== used_tile) —
                           # a documented deviation from forward.cu:364;
                           # callers needing the exact per-pixel flag at
                           # inference should render once with
                           # inference=False (the trainers never consume
                           # it, SURVEY.md §7 quirks).
    num_dup: jnp.ndarray   # [] int32 true duplicate count (check <= k_dup)
    final_t: jnp.ndarray   # [H, W] final transmittance
    used_tile: jnp.ndarray  # [P] bool — has >= 1 surviving duplicate
                            # (rasterized into >= 1 tile; superset of
                            # is_used, free from binning)


def mark_visible(means3d, camera: CameraParams):
    """[P] bool frustum-visibility check — the reference's standalone
    ``GaussianRasterizer.markVisible`` (rasterize_points.cu:201-220 ->
    checkFrustum, rasterizer_impl.cu:54-66): true iff the view-space depth
    exceeds the 0.2 near plane (in_frustum with prefiltered=false only
    tests z, auxiliary.h:139-164)."""
    view = camera.view
    depth = (means3d[:, 0] * view[2, 0] + means3d[:, 1] * view[2, 1]
             + means3d[:, 2] * view[2, 2]) + view[2, 3]
    return depth > 0.2


# The gradient reduction routes through sort + fused cumsum + boundary
# gathers instead of XLA scatter-add when either side is big. Measured on
# v5e (device traces, salted inputs): scatter-add runs ~8-12 ns/index
# while the TARGET table stays <= ~250k rows (~9 MB — on-chip working
# set) and cliffs to ~100 ns/index at >= 300k rows (random HBM
# read-modify-write; the sliding-window trainer's immature+matured union
# at cap 200k paid 30 ms/step here). Sorted indices do not help
# (124 ns/index measured), nor does chunking the target into small-table
# passes (each chunk re-streams every index at ~15 ns). The sort
# pipeline is ~15 ns/index flat in the slot count.
_SEGSUM_MIN_SLOTS = 1 << 20
_SCATTER_MAX_ROWS = 250_000


_SEGSUM_BF16_MIN_SLOTS = 1 << 21  # bf16-pack sort payloads above this K


def _pack_bf16_pairs(cols):
    """[N, K] f32 -> tuple of ceil(N/2) u32 arrays, each carrying two
    bf16-rounded columns (hi word = even column)."""
    n = cols.shape[0]
    b = cols.astype(jnp.bfloat16)
    u16 = [lax.bitcast_convert_type(b[i], jnp.uint16).astype(jnp.uint32)
           for i in range(n)]
    if n % 2:
        u16.append(jnp.zeros(cols.shape[1:], jnp.uint32))
    return tuple((u16[i] << 16) | u16[i + 1] for i in range(0, len(u16), 2))


def _unpack_bf16_pairs(words, n_cols: int):
    """Inverse of _pack_bf16_pairs (f32 outputs, bf16-valued)."""
    cols = []
    for w in words:
        cols.append(lax.bitcast_convert_type(
            (w >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32))
        cols.append(lax.bitcast_convert_type(
            (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16
        ).astype(jnp.float32))
    return tuple(cols[:n_cols])


def _segsum_reduce(dfeat, gid, seg_bounds, p1: int, interpret: bool):
    """dtable[r] = sum of dfeat columns with gid == r, via ONE sort
    carrying the gradient rows as payloads + fused Kahan cumsum + one
    boundary row-gather — no scatter.

    The gradient rows ride the gid sort directly (~1 ms/payload of sort
    time at K=1.8M on v5e) instead of sorting an iota and row-gathering
    dfeat.T afterwards (2.6 + 11.2 ms at the same scale; at K=4.1M the
    [K, 9] row gather is 94 ms vs 37 for the payload sort — measured).
    Everything K-sized stays in [rows, K] layout (K on lanes): a [K, 9]
    array is lane-padded 9 -> 128, so per-column slicing of it measured
    48 ms at K=2.1M. The only [*, 9]-minor arrays here are gather outputs
    and one final diff. Segment bounds come precomputed from binning
    (``Binning.seg_bounds``): a searchsorted over the sorted gids lowered
    to sort+scatter and measured ~27 ms/step at the 1M-cap scale.

    Above _SEGSUM_BF16_MIN_SLOTS the nine f32 payload columns ride the
    sort as FIVE u32 words of packed bf16 pairs — 24 B/slot instead of
    40: 37.0 -> 23.0 ms measured at K=4.13M on v5e. Deliberate precision
    deviation at that scale only: each per-slot gradient CONTRIBUTION is
    rounded to bf16 (rel ~2^-9) before the f32 Kahan segment sum — the
    summed per-gaussian gradient carries ~0.1-0.4% relative noise, far
    under the stochastic-gradient noise Adam consumes (the reference
    accumulates f32 atomicAdd; small-scale configs and every CI gate take
    the exact scatter/f32 path below these thresholds; the 1M densify
    soak trains through this path with monotone PSNR as the behavioral
    gate)."""
    from gsplat_tpu.raster.scan_kernel import multi_cumsum

    k = gid.shape[0]
    n_cols = dfeat.shape[0]
    if k >= _SEGSUM_BF16_MIN_SLOTS and not interpret:
        out = jax.lax.sort((gid,) + _pack_bf16_pairs(dfeat), num_keys=1)
        sorted_all = (out[0],) + _unpack_bf16_pairs(out[1:], n_cols)
    else:
        sorted_all = jax.lax.sort(
            (gid,) + tuple(dfeat[i] for i in range(n_cols)),
            num_keys=1)
    cs = multi_cumsum(list(sorted_all[1:]), interpret=interpret)
    ct = jnp.concatenate(
        [jnp.zeros((dfeat.shape[0], 1), dfeat.dtype),
         jnp.stack(cs, axis=0)], axis=1).T  # [K+1, 9] inclusive, 0-led
    bounds = jnp.concatenate(
        [seg_bounds, jnp.full((1,), k, jnp.int32)])  # [p1+1]
    ctb = ct[bounds]  # [p1+1, 9] one row gather
    return ctb[1:] - ctb[:-1]  # [p1, 9]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gather_rows_t(table, gid, seg_bounds, p1: int, interpret: bool):
    """``table[gid].T`` whose TRANSPOSE picks the cheapest per-gaussian
    reduction for the scale (see _SEGSUM_MIN_SLOTS)."""
    return table[gid].T


def _gather_rows_t_fwd(table, gid, seg_bounds, p1, interpret):
    return table[gid].T, (gid, seg_bounds)


def _gather_rows_t_bwd(p1, interpret, res, dfeat):
    import numpy as _np

    gid, seg_bounds = res
    if gid.shape[0] >= _SEGSUM_MIN_SLOTS or p1 > _SCATTER_MAX_ROWS:
        dtable = _segsum_reduce(dfeat, gid, seg_bounds, p1, interpret)
    else:
        dtable = jnp.zeros((p1, dfeat.shape[0]), dfeat.dtype
                           ).at[gid].add(dfeat.T)
    return (dtable, _np.zeros(gid.shape, dtype=jax.dtypes.float0),
            _np.zeros(seg_bounds.shape, dtype=jax.dtypes.float0))


_gather_rows_t.defvjp(_gather_rows_t_fwd, _gather_rows_t_bwd)


def _feat_columns(proc):
    """[P, 9] RAW kernel feature rows (x, y, a, b, c, opa, rgb) in
    ORIGINAL gaussian order — handed to binning, which reorders them into
    depth-rank space by riding the depth sort as payloads
    (binning._sort_with_table; the separate permutation gather this
    replaces measured 6.5 ms at P=1M)."""
    return jnp.stack([
        proc.xy[:, 0], proc.xy[:, 1],
        proc.conic[:, 0], proc.conic[:, 1], proc.conic[:, 2],
        proc.opacity, proc.rgb[:, 0], proc.rgb[:, 1], proc.rgb[:, 2],
    ], axis=1)


def _slot_features(table, gid, seg_bounds, dtype=jnp.float32,
                   interpret=False):
    """[9, K_slots] dense kernel feature stream from the depth-ordered
    [P, 9] table (``Binning.feat_table``).

    ``gid`` indexes DEPTH-RANK space; ONE row-gather per slot (per-index
    gather cost amortized over the 9-float row) and one layout copy to
    the dense [9, K] array the kernel streams. The quadratic-form
    expansion to local pixel coordinates happens INSIDE the Pallas kernel
    (tile_kernel._alphas) — in XLA it materialized as a dozen lane-padded
    refetch fusions.
    Padding slots (gid == P) hit an appended ALL-ZERO table row => alpha 0
    in the kernel (an explicit index-clamp + mask multiply measured +4.5ms
    at 5.7M slots; the zero row keeps the gather's in-bounds fast path).
    The backward of the row gather is the per-gaussian scatter-add that
    replaces the reference's atomicAdd reduction (backward.cu:523-554).
    """
    # casting BEFORE the big gather halves its HBM traffic (bf16 inference)
    table = jnp.concatenate(
        [table.astype(dtype), jnp.zeros((1, 9), dtype)], axis=0)
    return _gather_rows_t(table, gid, seg_bounds, table.shape[0],
                          interpret)  # [9, K_slots] dense


def rasterize(
    means3d, scales, quats, opacities, shs, camera: CameraParams,
    sh_degree: int, bg, settings: RasterizeSettings, *,
    colors_precomp=None, cov3d_precomp=None, scale_modifier: float = 1.0,
    alive=None, band_h: int | None = None, band_y0=0.0,
) -> RasterizeOutput:
    """Render Gaussians through the full differentiable pipeline.

    ``band_h``/``band_y0`` render only the horizontal image band of
    ``band_h`` rows starting at pixel row ``band_y0`` (image-space
    parallelism — parallel/tileshard.py shards a frame's rows over
    devices). Projection/preprocess is UNCHANGED (full-image EWA/clamp
    semantics — a cropped camera would perturb the 1.3*tan_fov Jacobian
    clamp of computeCov2D, forward.cu:86-93); the band is a pure
    pixel-space y-shift before binning, so every per-pixel value matches
    the full render's rows to fp rounding. ``band_h`` must be static;
    ``band_y0`` may be traced (the same compiled program renders any
    band). Per-Gaussian outputs (radii, is_used, num_dup) are
    band-local.
    """
    s = settings
    height = camera.height if band_h is None else band_h
    grid_x = -(-camera.width // s.tile_x)
    grid_y = -(-height // s.tile_y)
    num_tiles = grid_x * grid_y
    n_pix = s.tile_x * s.tile_y

    proc = project_lib.preprocess(
        means3d, scales, quats, opacities, shs, camera, sh_degree,
        colors_precomp=colors_precomp, cov3d_precomp=cov3d_precomp,
        scale_modifier=scale_modifier, alive=alive)
    if band_h is not None:
        y0 = jnp.asarray(band_y0, proc.xy.dtype)
        proc = proc._replace(
            xy=proc.xy - jnp.stack([jnp.zeros_like(y0), y0])[None, :])

    # Binning is integer bookkeeping — no gradients through the sort,
    # EXCEPT the feature table riding it as differentiable payloads.
    proc_ng = jax.tree.map(lax.stop_gradient, proc)
    binn = binning_lib.bin_gaussians(
        proc_ng, tile_x=s.tile_x, tile_y=s.tile_y,
        grid_x=grid_x, grid_y=grid_y, k_dup=s.k_dup, chunk=s.chunk,
        align=s.super_chunks,  # both kernels walk SUPER chunks per step
        interpret=s.interpret, feat_table=_feat_columns(proc))

    feat = _slot_features(
        binn.feat_table, binn.gid, binn.seg_bounds,
        dtype=jnp.bfloat16 if s.inference else jnp.float32,
        interpret=s.interpret)

    # Assemble channel-major tile buffers [T, ch, n_pix] into [ch, H, W].
    def assemble(img_t, ch):
        img = img_t.reshape(grid_y, grid_x, ch, s.tile_y, s.tile_x)
        img = img.transpose(2, 0, 3, 1, 4)
        img = img.reshape(ch, grid_y * s.tile_y, grid_x * s.tile_x)
        return img[:, : height, : camera.width]

    if s.inference:
        c_img = tile_kernel.render_forward(
            feat, binn.chunk_meta, jnp.asarray(bg, jnp.float32), num_tiles,
            n_pix, s.tile_x, s.tile_y, grid_x, s.chunk, s.interpret,
            s.super_chunks)
        # CHW bf16 (the reference's output layout, rasterize_points.cu:69):
        # an HWC device array puts the 3-channel axis on lanes, which the
        # TPU pads to 128 — 42x the bytes for every downstream op.
        image = assemble(c_img, 3)
        final_t = jnp.zeros((height, camera.width), jnp.float32)
        return RasterizeOutput(image=image, radii=binn.radius,
                               is_used=binn.used, num_dup=binn.num_dup,
                               final_t=final_t, used_tile=binn.used)

    c_img, t_img, used_slot = tile_kernel.tile_blend(
        feat, binn.chunk_meta, num_tiles, n_pix,
        s.tile_x, s.tile_y, grid_x, s.chunk, s.interpret, s.super_chunks)

    # Pixel-granular is_used (forward.cu:364): OR the per-slot contribution
    # flags by gaussian. ``gid`` lives in depth-rank space with rank P as
    # the padding row (its slots have w == 0, so they cannot set the flag
    # either way); the scatter-max + rank->id gather are pure XLA and cost
    # nothing unless a consumer actually reads ``is_used``.
    p1 = binn.order.shape[0] + 1
    used_rank = jnp.zeros((p1,), jnp.float32).at[binn.gid].max(
        used_slot, mode="drop")
    is_used = used_rank[binn.inv_order] > 0.0

    color = assemble(c_img, 3)
    final_t = assemble(t_img, 1)[0]
    image = color + final_t[None] * jnp.asarray(bg, jnp.float32)[:, None,
                                                                 None]
    if s.layout == "hwc":
        image = image.transpose(1, 2, 0)

    return RasterizeOutput(image=image, radii=binn.radius, is_used=is_used,
                           num_dup=binn.num_dup, final_t=final_t,
                           used_tile=binn.used)
