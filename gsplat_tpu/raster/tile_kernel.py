"""Pallas TPU kernel: per-tile front-to-back alpha compositing + custom VJP.

TPU-native replacement for the reference's tile rasterization kernels
(forward: cuda_rasterizer/forward.cu:261-377, backward:
cuda_rasterizer/backward.cu:399-557). Architecture is completely different
from the CUDA version — designed for the VPU/MXU and XLA's static shapes:

- Duplicates (Gaussian x tile pairs, depth-sorted within each tile) are laid
  out contiguously with each tile's list padded to a multiple of CHUNK
  (see ``rasterize.pad_tile_lists``). The kernel grid runs over chunks;
  Pallas pipelines the per-chunk feature DMA automatically.
- Each grid step composites CHUNK Gaussians into its tile's [N_PIX] pixel
  block. Consecutive chunks of one tile revisit the same output block, which
  stays resident in VMEM (accumulation pattern); per-tile carries
  (log-transmittance, backward prefix sums) live in scratch and are reset at
  each tile's first chunk.
- Compositing is vectorized over the chunk: instead of a per-Gaussian
  sequential loop, transmittance is a parallel prefix-sum of log(1-alpha)
  along the chunk axis (log-shift scan), and color accumulation is an MXU
  matmul — no atomics, no warp scheduling.
- The backward pass re-runs the forward scan front-to-back (recompute
  strategy; residuals are just the forward's output image) and emits
  per-duplicate gradients; reduction to per-Gaussian gradients is a
  scatter-add performed by XLA autodiff through the gather in rasterize.py.

Per-duplicate features are 9 RAW floats (the quadratic-form expansion to
local pixel coordinates happens IN-KERNEL — round-1 did it in XLA, where
the 16-row stack became eleven lane-padded refetch fusions):
  [0:2]  global pixel-space mean (x, y)
  [2:5]  conic (a, b, c)
  [5]    opacity
  [6:9]  rgb
The feature array is stored transposed, [9, K], dense along K; the tile
origin (for fp32-exact local coordinates at any image size) comes from the
chunk's tile id and the static grid width.

Compositing semantics match raster/naive.py (alpha clamped to 0.99, skipped
below 1/255 or when power > 0, pixel stops accepting contributions once its
transmittance T <= 1e-4; the 0.99 clamp is a gradient pass-through, exactly
like backward.cu:477-481).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4

NUM_FEAT = 9  # raw feature rows (x, y, a, b, c, opa, rgb)


def _basis(n_pix: int, tile_x: int):
    """Local-pixel-coordinate basis matrix [N_PIX, 6] f32:
    columns (px^2, py^2, px*py, px, py, 1) — the quadratic-form monomials.
    Shaped as a matrix so power and its coefficient gradients are MXU
    matmuls instead of VPU broadcast chains."""
    idx = lax.broadcasted_iota(jnp.int32, (n_pix, 1), 0)
    px = (idx % tile_x).astype(jnp.float32)
    py = (idx // tile_x).astype(jnp.float32)
    return jnp.concatenate(
        [px * px, py * py, px * py, px, py, jnp.ones_like(px)], axis=1)


def _tri(chunk: int, inclusive: bool):
    """[CHUNK, CHUNK] f32 triangular ones: prefix sums along the chunk axis
    become ONE MXU matmul instead of a log2(CHUNK)-step roll/select doubling
    scan on the VPU (the scans were the kernel's biggest op count)."""
    r = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return ((r <= c) if inclusive else (r < c)).astype(jnp.float32)


def _scan_rows(x, exclusive: bool):
    """Prefix sum along axis=1 (the chunk axis) via MXU triangular matmul.

    (Per-operand precision would halve the MXU passes — the 0/1 triangular
    RHS is bf16-exact — but Mosaic rejects per-operand dot precision.)"""
    return lax.dot_general(x, _tri(x.shape[1], not exclusive),
                           (((1,), (0,)), ((), ())),
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)


def _alphas(feat, basis, t_in, ox, oy):
    """Shared forward math: per-(pixel, gaussian) alpha/transmittance.

    feat: (NUM_FEAT, CHUNK) raw rows; basis: (N, 6) monomial matrix;
    t_in: (N, 1) carried transmittance (the reference's per-pixel T,
    forward.cu:301); ox/oy: scalar tile origin. Returns dict of (N, CHUNK)
    arrays + updated carry (N,1).

    The quadratic form is expanded over LOCAL pixel coordinates in-kernel
    (cheap (1, CHUNK) vector ops), then power is ONE MXU matmul
    (basis @ coefficient rows). Transmittance is exp of an EXCLUSIVE prefix
    sum of log1p(-alpha) — the prefix sum is one MXU triangular matmul, so
    the whole per-(pixel, gaussian) VPU budget is a handful of elementwise
    ops. The carry (the oracle's frozen-at-saturation T) is the LAST
    still-gated inclusive product, recovered with a masked min (T is
    monotone non-increasing along the chunk).
    """
    feat = feat.astype(jnp.float32)  # bf16 inference stream upcasts here
    x = feat[0:1, :] - ox
    y = feat[1:2, :] - oy
    a = feat[2:3, :]
    b = feat[3:4, :]
    c = feat[4:5, :]
    coef = jnp.concatenate([
        -0.5 * a, -0.5 * c, -b,
        a * x + b * y, c * y + b * x,
        -0.5 * (a * x * x + c * y * y) - b * x * y], axis=0)  # (6, CHUNK)
    power = lax.dot_general(basis, coef, (((1,), (0,)), ((), ())),
                            precision=lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)  # (N, CHUNK)
    opa = feat[5:6, :]  # (1, CHUNK)
    g_exp = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, opa * g_exp)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    log1m = jnp.log1p(-alpha)  # exact 0 at alpha == 0
    t_g = t_in * jnp.exp(_scan_rows(log1m, exclusive=True))
    gate = (t_g > T_EPS).astype(jnp.float32)
    w = alpha * t_g * gate
    t_after = t_g * (1.0 - alpha)  # inclusive product, no second scan
    t_new = jnp.where(
        gate[:, :1] > 0,
        jnp.min(jnp.where(gate > 0, t_after, jnp.inf), axis=1,
                keepdims=True),
        t_in)
    rgb = feat[6:9, :]
    return dict(power=power, g_exp=g_exp, alpha=alpha, t_g=t_g, gate=gate,
                w=w, rgb=rgb, opa=opa, t_new=t_new,
                x=x, y=y, a=a, b=b, c=c)


def _fwd_kernel(chunk_tile, chunk_first, feat_ref, c_init_ref, t_init_ref,
                c_ref, t_ref, tcar_ref,
                *, n_pix: int, tile_x: int, tile_y: int, grid_x: int,
                num_tiles: int):
    del c_init_ref, t_init_ref  # alias-initialized outputs; never read here
    k = pl.program_id(0)
    tile = chunk_tile[k]
    ox = ((tile % grid_x) * tile_x).astype(jnp.float32)
    oy = ((tile // grid_x) * tile_y).astype(jnp.float32)
    is_real = tile < num_tiles  # trailing sentinel chunks: no-op

    @pl.when(is_real & (chunk_first[k] != 0))
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)
        tcar_ref[...] = jnp.ones_like(tcar_ref)
        t_ref[...] = jnp.ones_like(t_ref)

    # Early exit: if every pixel in this tile is saturated (T <= eps), later
    # chunks contribute nothing (the tile-level form of forward.cu:310-312).
    @pl.when(is_real & (jnp.max(tcar_ref[...]) > T_EPS))
    def _():
        basis = _basis(n_pix, tile_x)
        v = _alphas(feat_ref[...], basis, tcar_ref[...], ox, oy)
        # C[p, ch] += sum_g w[p, g] * rgb[ch, g]  — MXU matmul.
        contrib = lax.dot_general(v["w"], v["rgb"], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # (N,3)
        c_ref[...] = c_ref[...] + contrib[None]
        tcar_ref[...] = v["t_new"]
        t_ref[...] = v["t_new"][None]


def _bwd_kernel(chunk_tile, chunk_first, feat_ref, cres_ref, tres_ref,
                dc_ref, dt_ref, dfeat_ref, tcar_ref, accum_ref,
                *, n_pix: int, tile_x: int, tile_y: int, grid_x: int,
                num_tiles: int):
    k = pl.program_id(0)
    tile = chunk_tile[k]
    ox = ((tile % grid_x) * tile_x).astype(jnp.float32)
    oy = ((tile // grid_x) * tile_y).astype(jnp.float32)
    is_real = tile < num_tiles

    @pl.when(is_real & (chunk_first[k] != 0))
    def _():
        tcar_ref[...] = jnp.ones_like(tcar_ref)
        accum_ref[...] = jnp.zeros_like(accum_ref)

    saturated = jnp.logical_not(is_real) | (jnp.max(tcar_ref[...]) <= T_EPS)

    @pl.when(jnp.logical_not(saturated))
    def _():
        basis = _basis(n_pix, tile_x)
        feat = feat_ref[...]
        v = _alphas(feat, basis, tcar_ref[...], ox, oy)
        dc = dc_ref[0]   # (N, 3)
        dt = dt_ref[0]   # (N, 1)
        cres = cres_ref[0]  # (N, 3)
        tres = tres_ref[0]  # (N, 1)

        # Per-pixel total downstream dot: D = <dC, C_final> + dT * T_final.
        d_tot = jnp.sum(dc * cres, axis=1, keepdims=True) + dt * tres
        # A[p, g] = <dC[p], rgb[g]>
        a_pg = lax.dot_general(dc, v["rgb"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        aw = a_pg * v["w"]
        cum_in = accum_ref[...] + _scan_rows(aw, exclusive=False)
        s = d_tot - cum_in  # suffix contributions incl. the T_final term
        alpha = v["alpha"]
        live = (alpha > 0.0).astype(jnp.float32)
        dalpha = (a_pg * v["t_g"] - s / (1.0 - alpha)) * v["gate"] * live
        # 0.99-clamp pass-through (backward.cu:477-481): opa*exp(power).
        dpower = dalpha * v["opa"] * v["g_exp"]

        # dcoeff[i, g] = sum_p basis[p, i] * dpower[p, g] — one MXU matmul
        # (replaces six multiply+reduce sweeps over the (N, CHUNK) block),
        # then the chain rule back to the RAW rows on (1, CHUNK) vectors.
        dcoeff = lax.dot_general(basis, dpower, (((0,), (0,)), ((), ())),
                                 precision=lax.Precision.HIGHEST,
                                 preferred_element_type=jnp.float32)
        d0, d1, d2, d3, d4, d5 = (dcoeff[i:i + 1, :] for i in range(6))
        x, y = v["x"], v["y"]
        a, b, c = v["a"], v["b"], v["c"]
        da = -0.5 * d0 + x * d3 - 0.5 * (x * x) * d5
        db = -d2 + y * d3 + x * d4 - (x * y) * d5
        dc_ = -0.5 * d1 + y * d4 - 0.5 * (y * y) * d5
        dx = a * d3 + b * d4 - (a * x + b * y) * d5
        dy = b * d3 + c * d4 - (c * y + b * x) * d5
        # drgb[ch, g] = sum_p dC[p, ch] * w[p, g]
        drgb = lax.dot_general(dc, v["w"], (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        dopa = jnp.sum(v["g_exp"] * dalpha * live, axis=0, keepdims=True)
        dfeat_ref[...] = jnp.concatenate(
            [dx, dy, da, db, dc_, dopa, drgb], axis=0)

        tcar_ref[...] = v["t_new"]
        accum_ref[...] = cum_in[:, -1:]

    @pl.when(saturated)
    def _():
        dfeat_ref[...] = jnp.zeros_like(dfeat_ref)


def _common_specs(num_chunks: int, chunk: int, n_pix: int, num_tiles: int):
    def tile_ix(k, ct, cf):
        return (jnp.minimum(ct[k], num_tiles - 1), 0, 0)

    feat_spec = pl.BlockSpec((NUM_FEAT, chunk), lambda k, ct, cf: (0, k),
                             memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((1, n_pix, 3), tile_ix, memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((1, n_pix, 1), tile_ix, memory_space=pltpu.VMEM)
    return feat_spec, img_spec, t_spec


def _forward(feat, chunk_tile, chunk_first, num_tiles: int, n_pix: int,
             tile_x: int, tile_y: int, grid_x: int, chunk: int,
             interpret: bool):
    num_chunks = feat.shape[1] // chunk
    feat_spec, img_spec, t_spec = _common_specs(num_chunks, chunk, n_pix,
                                                num_tiles)
    # Empty tiles get no kernel chunks; their output blocks come from these
    # alias-donated init buffers (background: C=0, T=1) — no patching pass.
    c_init = jnp.zeros((num_tiles, n_pix, 3), jnp.float32)
    t_init = jnp.ones((num_tiles, n_pix, 1), jnp.float32)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[feat_spec, any_spec, any_spec],
        out_specs=[img_spec, t_spec],
        scratch_shapes=[pltpu.VMEM((n_pix, 1), jnp.float32)],
    )
    out_shape = [
        jax.ShapeDtypeStruct((num_tiles, n_pix, 3), jnp.float32),
        jax.ShapeDtypeStruct((num_tiles, n_pix, 1), jnp.float32),
    ]
    kernel = functools.partial(_fwd_kernel, n_pix=n_pix, tile_x=tile_x,
                               tile_y=tile_y, grid_x=grid_x,
                               num_tiles=num_tiles)
    c_img, t_img = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        input_output_aliases={3: 0, 4: 1},  # (ct, cf, feat, c_init, t_init)
    )(chunk_tile, chunk_first, feat, c_init, t_init)
    return c_img, t_img


def _render_kernel(chunk_tile, chunk_first, chunk_last, feat_ref, bg_ref,
                   c_init_ref, c_ref, tcar_ref,
                   *, n_pix: int, tile_x: int, tile_y: int, grid_x: int,
                   num_tiles: int):
    """Inference-only forward: no transmittance residual output, background
    composited in-kernel on each tile's last chunk (frozen carry, so
    saturated tiles get it too). Accepts a bf16 feature stream."""
    del c_init_ref
    k = pl.program_id(0)
    tile = chunk_tile[k]
    ox = ((tile % grid_x) * tile_x).astype(jnp.float32)
    oy = ((tile // grid_x) * tile_y).astype(jnp.float32)
    is_real = tile < num_tiles

    @pl.when(is_real & (chunk_first[k] != 0))
    def _():
        c_ref[...] = jnp.zeros_like(c_ref)
        tcar_ref[...] = jnp.ones_like(tcar_ref)

    @pl.when(is_real & (jnp.max(tcar_ref[...]) > T_EPS))
    def _():
        basis = _basis(n_pix, tile_x)
        v = _alphas(feat_ref[...], basis, tcar_ref[...], ox, oy)
        contrib = lax.dot_general(v["w"], v["rgb"], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        c_ref[...] = c_ref[...] + contrib[None]
        tcar_ref[...] = v["t_new"]

    @pl.when(is_real & (chunk_last[k] != 0))
    def _():
        c_ref[...] = c_ref[...] + (tcar_ref[...] * bg_ref[...])[None]


def render_forward(feat, chunk_tile, chunk_first, chunk_last, bg,
                   num_tiles: int, n_pix: int, tile_x: int, tile_y: int,
                   grid_x: int, chunk: int, interpret: bool):
    """Render-only tile blend: [num_tiles, n_pix, 3] composited over bg."""
    num_chunks = feat.shape[1] // chunk

    def tile_ix(k, ct, cf, cl):
        return (jnp.minimum(ct[k], num_tiles - 1), 0, 0)

    feat_spec = pl.BlockSpec((NUM_FEAT, chunk), lambda k, ct, cf, cl: (0, k),
                             memory_space=pltpu.VMEM)
    bg_spec = pl.BlockSpec((1, 3), lambda k, ct, cf, cl: (0, 0),
                           memory_space=pltpu.VMEM)
    img_spec = pl.BlockSpec((1, n_pix, 3), tile_ix, memory_space=pltpu.VMEM)
    # Empty tiles get no kernel chunks; their blocks come from this
    # alias-donated init buffer (pure background).
    c_init = jnp.broadcast_to(bg.astype(jnp.float32)[None, None, :],
                              (num_tiles, n_pix, 3))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_chunks,),
        in_specs=[feat_spec, bg_spec, any_spec],
        out_specs=[img_spec],
        scratch_shapes=[pltpu.VMEM((n_pix, 1), jnp.float32)],
    )
    kernel = functools.partial(_render_kernel, n_pix=n_pix, tile_x=tile_x,
                               tile_y=tile_y, grid_x=grid_x,
                               num_tiles=num_tiles)
    (c_img,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, n_pix, 3), jnp.float32)],
        interpret=interpret,
        # inputs: (ct, cf, cl, feat, bg, c_init)
        input_output_aliases={5: 0},
    )(chunk_tile, chunk_first, chunk_last,
      feat, bg.astype(jnp.float32)[None, :], c_init)
    return c_img


def _backward(feat, chunk_tile, chunk_first, c_img, t_img, dc, dt,
              num_tiles: int, n_pix: int, tile_x: int, tile_y: int,
              grid_x: int, chunk: int, interpret: bool):
    num_chunks = feat.shape[1] // chunk
    feat_spec, img_spec, t_spec = _common_specs(num_chunks, chunk, n_pix,
                                                num_tiles)
    dfeat_spec = pl.BlockSpec((NUM_FEAT, chunk), lambda k, ct, cf: (0, k),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks,),
        in_specs=[feat_spec, img_spec, t_spec, img_spec, t_spec],
        out_specs=[dfeat_spec],
        scratch_shapes=[pltpu.VMEM((n_pix, 1), jnp.float32),
                        pltpu.VMEM((n_pix, 1), jnp.float32)],
    )
    kernel = functools.partial(_bwd_kernel, n_pix=n_pix, tile_x=tile_x,
                               tile_y=tile_y, grid_x=grid_x,
                               num_tiles=num_tiles)
    (dfeat,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(feat.shape, jnp.float32)],
        interpret=interpret,
    )(chunk_tile, chunk_first, feat, c_img, t_img, dc, dt)
    return dfeat


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def tile_blend(feat, chunk_tile, chunk_first, num_tiles: int, n_pix: int,
               tile_x: int, tile_y: int, grid_x: int, chunk: int,
               interpret: bool = False):
    """Composite padded duplicate lists into per-tile pixel blocks.

    Args:
      feat: [NUM_FEAT, K_padded] f32, K_padded a multiple of ``chunk``; each
        tile's duplicates contiguous, depth-sorted, zero rows as padding.
      chunk_tile: [K_padded // chunk] int32, tile id of each chunk
        (non-decreasing).
      chunk_first: [K_padded // chunk] int32, 1 where a chunk is its tile's
        first.
    Returns:
      (color [num_tiles, n_pix, 3] — premultiplied, no background,
       transmittance [num_tiles, n_pix, 1]).
    """
    return _forward(feat, chunk_tile, chunk_first, num_tiles, n_pix, tile_x,
                    tile_y, grid_x, chunk, interpret)


def _tile_blend_fwd(feat, chunk_tile, chunk_first, num_tiles, n_pix, tile_x,
                    tile_y, grid_x, chunk, interpret):
    c_img, t_img = _forward(feat, chunk_tile, chunk_first, num_tiles, n_pix,
                            tile_x, tile_y, grid_x, chunk, interpret)
    return (c_img, t_img), (feat, chunk_tile, chunk_first, c_img, t_img)


def _tile_blend_bwd(num_tiles, n_pix, tile_x, tile_y, grid_x, chunk,
                    interpret, res, grads):
    feat, chunk_tile, chunk_first, c_img, t_img = res
    dc, dt = grads
    dfeat = _backward(feat, chunk_tile, chunk_first, c_img, t_img, dc, dt,
                      num_tiles, n_pix, tile_x, tile_y, grid_x, chunk,
                      interpret)
    zero_i = np.zeros(chunk_tile.shape, dtype=jax.dtypes.float0)
    return (dfeat, zero_i, zero_i)


tile_blend.defvjp(_tile_blend_fwd, _tile_blend_bwd)
