"""Pallas TPU kernel: per-tile front-to-back alpha compositing + custom VJP.

TPU-native replacement for the reference's tile rasterization kernels
(forward: cuda_rasterizer/forward.cu:261-377, backward:
cuda_rasterizer/backward.cu:399-557). Architecture is completely different
from the CUDA version — designed for the VPU/MXU and XLA's static shapes:

- Duplicates (Gaussian x tile pairs, depth-sorted within each tile) are laid
  out contiguously with each tile's list padded to a multiple of CHUNK
  (see ``binning.bin_gaussians``). The kernel grid runs over chunks;
  Pallas pipelines the per-chunk feature DMA automatically.
- Each grid step composites CHUNK Gaussians into its tile's [N_PIX] pixel
  block. Consecutive chunks of one tile revisit the same output block, which
  stays resident in VMEM (accumulation pattern); per-tile carries
  (transmittance, backward prefix sums) live in scratch and are reset at
  each tile's first chunk.
- Compositing is vectorized over the chunk: transmittance is a parallel
  prefix-sum of log(1-alpha) along the chunk axis via ONE MXU triangular
  matmul, and color accumulation is an MXU matmul — no atomics, no warp
  scheduling.
- The backward pass re-runs the forward scan front-to-back (recompute
  strategy; residuals are just the forward's output image) and emits
  per-duplicate gradients; reduction to per-Gaussian gradients is a
  scatter-add performed by XLA autodiff through the gather in rasterize.py.

LAYOUT (performance-critical): every per-(gaussian, pixel) array is
(CHUNK, N_PIX) — gaussians on sublanes, PIXELS ON LANES — and every
per-tile image block is (3, N_PIX) channel-major. The round-1 layout
(N_PIX, 3) put the 3-channel axis on lanes, which the TPU pads to 128:
each image block was physically 42x larger (a 12.5 MB image cost 534 MB of
HBM traffic, measured) and the color matmul wasted 125/128 of the MXU.
Channel-major blocks are dense, and the color matmul
[3, CHUNK] @ [CHUNK, N_PIX] puts the tiny axis on sublanes (pad 3->8, not
3->128).

Chunk bookkeeping is ONE packed scalar-prefetch array (``chunk_meta``):
``tile_id << 2 | is_first << 1 | is_last`` per chunk. Scalar-prefetch
operands each cost a separate staging copy (~1.6 ms at 44k chunks on v5e,
measured), so three logical arrays ride one physical one.

Matmul precision (v5e MXU runs f32 as multi-pass bf16):
- training scans use ``Precision.HIGH`` (3-pass, ~1e-6 relative — the scan
  sums are same-signed so there is no cancellation to amplify);
- the ``power`` quadratic-form matmul stays HIGHEST: its monomial expansion
  cancels catastrophically (terms up to a*x^2 ~ 1e4 vs results ~ -6);
- the color accumulation (fwd) and the backward channel/pixel reductions
  use a 3-pass hi/lo split (``_dot_hl``): single-pass bf16 left a measured
  ~5e-3 (~48 dB floor) on deep-compositing images on real v5e;
- the inference kernel runs the scan as a single-pass bf16 matmul: the
  log-transmittance sums are monotone, so bf16's 2^-8 relative error lands
  as <=0.5% on T — invisible at 8-bit output depth.

The inference kernel additionally processes SUPER (=8) chunks per grid
step: per-grid-step overhead (DMA issue + grid bookkeeping) measured
0.22 us/chunk — 9.6 ms of a 16 ms kernel at 44k chunks — so the feature
stream is fetched in [9, SUPER*CHUNK] blocks and an unrolled inner loop
walks the sub-chunks. Tile output blocks are flushed to HBM with
double-buffered async DMAs on each tile's last chunk (a super-chunk may
span many tiles), and the saturation early-exit reads an SMEM scalar
maintained by the previous sub-chunk instead of re-reducing a VMEM vector
(the data-dependent branch alone cost 4.3 ms, measured).

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

Compositing semantics are CUDA-exact (forward.cu:336-356, shared with
raster/naive.py): alpha clamped to 0.99, skipped below 1/255 or when
power > 0; a contribution composites iff T * (1 - alpha) >= 1e-4 AND the
pixel hasn't stopped — the first violator is itself dropped and latches the
pixel ``done`` (T freezes at the pre-violator value, which is what final_T
reports). The 0.99 clamp is a gradient pass-through, exactly like
backward.cu:477-481. The inference kernel instead drops the stop rule
entirely and keeps compositing until the whole tile's T <= 1e-4: the extra
contributions it admits (which CUDA would drop) have total weight bounded
by the frozen T — worst case ~1e-2 for a 0.99-alpha splat arriving at
T ~ 1e-2, typically far less (measured 43.3 dB vs the training path on the
adversarial bench scene) — and composites the background in-kernel.
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

NUM_FEAT = 9   # raw feature rows (x, y, a, b, c, opa, rgb)
SUPER = 8      # sub-chunks per render-kernel grid step
CPAD = 4       # inference image channel padding (bf16 DMA slice alignment)
CTPAD = 8      # training packed color+T rows (f32 DMA sublane alignment)


def _basis_t(n_pix: int, tile_x: int, offset: int = 0):
    """Local-pixel-coordinate basis [6, N_PIX] f32 (pixels on lanes):
    rows (px^2, py^2, px*py, px, py, 1) — the quadratic-form monomials.
    ``offset`` shifts the lane->pixel mapping (granule sub-blocks)."""
    idx = lax.broadcasted_iota(jnp.int32, (1, n_pix), 1) + offset
    px = (idx % tile_x).astype(jnp.float32)
    py = (idx // tile_x).astype(jnp.float32)
    return jnp.concatenate(
        [px * px, py * py, px * py, px, py, jnp.ones_like(px)], axis=0)


def _tri(chunk: int, inclusive: bool, dtype=jnp.float32):
    """[CHUNK, CHUNK] triangular ones for prefix sums ALONG SUBLANES:
    out[r] = sum_{r' <(=) r} x[r'] via out = TRI @ x."""
    r = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return ((c <= r) if inclusive else (c < r)).astype(dtype)


def _split_hi_lo(x):
    """f32 -> (bf16 hi, bf16 lo) with x ~= hi + lo to ~2^-18 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_hl(lhs, rhs, dims):
    """3-pass hi/lo bf16 dot_general (~2^-18 per-operand error) for the
    training-path contractions whose operands are NOT exactly representable
    in bf16 (color accumulation and the backward channel/pixel reductions).
    Default single-pass precision costs 2^-8 relative — measured ~5e-3 on
    the rendered image of a deep-compositing scene on real v5e, a ~48 dB
    error floor that erodes the 0.1 dB PSNR parity budget."""
    d = functools.partial(lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    lhi, llo = _split_hi_lo(lhs)
    rhi, rlo = _split_hi_lo(rhs)
    return d(lhi, rhi) + d(lhi, rlo) + d(llo, rhi)


# Prefix-sum sub-block size: the tri-matmul scan costs CHUNK MACs per
# element; splitting the chunk into SCAN_SUB-row blocks with a serial f32
# carry cuts that to SCAN_SUB (+ a sublane reduce). Skinny (32,32)@(32,N)
# matmuls still pipeline on the v5e MXU: measured on hardware at N=4096,
# frame-equivalent scan cost tri128 8.6 ms / sub16 5.0 / sub32 3.3 /
# sub8 8.4 — 32 is the sweet spot (fill/drain overhead eats smaller subs).
SCAN_SUB = 32


def _scan_cols(x, exclusive: bool):
    """Training prefix sum along axis=0 (the chunk axis): MXU triangular
    matmuls over SCAN_SUB-row sub-blocks in TWO bf16 passes (~2^-18
    per-operand relative error) + an exact f32 carry across sub-blocks.
    The 0/1 triangular matrix is exact in bf16, so splitting only x
    (hi + lo) recovers near-f32 accuracy at 1/3 the HIGHEST (6-pass) cost;
    Mosaic does not lower ``Precision.HIGH``, hence the manual split. The
    sub-blocking cuts the dominant MAC term CHUNK -> SCAN_SUB per element
    (the f32 carry also SHORTENS the bf16 scans, improving accuracy).

    Error model for the two users: the forward log1p(-alpha) scan has
    same-signed summands, so the error stays ~2^-18 relative to each
    prefix. The backward ``aw`` scan has SIGNED summands, so cancellation
    can amplify the error relative to the prefix — but the absolute error
    is still bounded by 2^-18 * sum|aw|, and ``aw`` feeds
    ``s = d_tot - cum_in`` where d_tot is itself O(sum|aw|): the gradient
    perturbation is ~2^-18 of the per-pixel cotangent scale, far inside
    the 2e-4 oracle-gradient parity gate (tests/test_raster.py:113, which
    exercises exactly this signed path against f64-free f32 autodiff)."""
    chunk = x.shape[0]
    sub = SCAN_SUB if chunk % SCAN_SUB == 0 else chunk
    tri = _tri(sub, not exclusive, jnp.bfloat16)
    d = functools.partial(lax.dot_general, tri,
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    outs = []
    carry = jnp.zeros((1, x.shape[1]), jnp.float32)
    for b in range(chunk // sub):
        blk = x[b * sub:(b + 1) * sub]
        hi, lo = _split_hi_lo(blk)
        outs.append(d(hi) + d(lo) + carry)
        if b + 1 < chunk // sub:
            carry = carry + jnp.sum(blk, axis=0, keepdims=True)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _scan_cols_bf16(x, exclusive: bool):
    """Inference prefix sum: single-pass bf16 MXU sub-block matmuls + f32
    carry (6x cheaper than HIGHEST, SCAN_SUB/CHUNK the MACs of a full
    triangular pass). Monotone same-signed sums keep the per-block relative
    error ~2^-8; the f32 carry stops it compounding across sub-blocks."""
    chunk = x.shape[0]
    sub = SCAN_SUB if chunk % SCAN_SUB == 0 else chunk
    tri = _tri(sub, not exclusive, jnp.bfloat16)
    d = functools.partial(lax.dot_general, tri,
                          dimension_numbers=(((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    outs = []
    carry = jnp.zeros((1, x.shape[1]), jnp.float32)
    for b in range(chunk // sub):
        blk = x[b * sub:(b + 1) * sub]
        outs.append(d(blk.astype(jnp.bfloat16)) + carry)
        if b + 1 < chunk // sub:
            carry = carry + jnp.sum(blk, axis=0, keepdims=True)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _power_terms(feat, basis_t, ox, oy, exact: bool = True):
    """Quadratic-form power per (gaussian, pixel): [CHUNK, N_PIX] f32.

    Evaluated DIRECTLY on the VPU over per-pixel offsets dx/dy (the same
    form as forward.cu:336-339 and the naive oracle): the earlier monomial
    expansion + MXU matmul had terms ~ a*x^2 up to 1e4 cancelling against
    results ~ -6 (requiring HIGHEST / 3-pass hi/lo matmuls), and a K=6
    matmul pays full MXU fill per pass — measured 2.5 us/chunk of a
    4.15 us chunk at 128x32 tiles, vs ~1.6 us for the direct broadcasts.
    Direct evaluation is both faster and tighter (f32 error at the scale
    of a*dx^2 ~ O(10), not of the 1e4 monomials).

    ``basis_t`` rows 3/4 carry the local pixel coordinates px/py (see
    _basis_t); the full 6-row basis is still used by the backward kernel's
    dcoeff contraction, whose chain rules remain valid because power is
    the same function of (a, b, c, x, y)."""
    del exact  # direct form is always f32-tight
    x = feat[0:1, :] - ox
    y = feat[1:2, :] - oy
    a = feat[2:3, :]
    b = feat[3:4, :]
    c = feat[4:5, :]
    px = basis_t[3:4, :]          # (1, N_PIX) local pixel x
    py = basis_t[4:5, :]          # (1, N_PIX) local pixel y
    dx = px - jnp.transpose(x)    # (CHUNK, N_PIX)
    dy = py - jnp.transpose(y)
    at = jnp.transpose(a)
    bt = jnp.transpose(b)
    ct = jnp.transpose(c)
    power = -0.5 * (at * dx * dx + ct * dy * dy) - bt * dx * dy
    return power, x, y, a, b, c


def _alphas_pre(feat, ox, oy):
    """Per-sub-chunk gaussian-side preparation shared by every lane slice:
    the (CHUNK, 1) transposes of the raw feature rows (each transpose is a
    sublane relayout — hoisted so the granule path pays them once per
    sub-chunk, not once per granule)."""
    feat = feat.astype(jnp.float32)  # bf16 inference stream upcasts here
    x = feat[0:1, :] - ox
    y = feat[1:2, :] - oy
    a = feat[2:3, :]
    b = feat[3:4, :]
    c = feat[4:5, :]
    opa = feat[5:6, :]
    return dict(x=x, y=y, a=a, b=b, c=c, opa=opa, rgb=feat[6:9, :],
                xt=jnp.transpose(x), yt=jnp.transpose(y),
                at=jnp.transpose(a), bt=jnp.transpose(b),
                ct=jnp.transpose(c), opa_c=jnp.transpose(opa))


def _alphas_slice(pre, px, py, t_in, done_in):
    """Forward compositing math on one lane slice: per-(gaussian, pixel)
    alpha/transmittance, arrays (CHUNK, W) with the slice's W pixels on
    lanes. ``px``/``py`` are the slice's (1, W) local pixel coordinates;
    ``t_in``/``done_in`` the slice's carried transmittance / saturation
    latch rows.

    Stop rule EXACTLY as renderCUDA (forward.cu:347-352): a contribution
    composites iff T * (1 - alpha) >= 1e-4 AND the pixel has not already
    stopped; the first violating contribution is itself dropped and latches
    the pixel ``done`` (its T never updates again). Within a chunk the
    post-alpha transmittance is monotone non-increasing, so the sticky
    CUDA ``done`` flag reduces to the pointwise gate; across chunks the
    stickiness rides the ``done`` carry (the carried T excludes the
    violator's factor, so the gate alone could spuriously re-open).
    The carried T (CUDA's frozen final_T) is the LAST still-gated
    post-alpha product, recovered with a masked min.
    """
    dx = px - pre["xt"]           # (CHUNK, W)
    dy = py - pre["yt"]
    power = (-0.5 * (pre["at"] * dx * dx + pre["ct"] * dy * dy)
             - pre["bt"] * dx * dy)
    g_exp = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, pre["opa_c"] * g_exp)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0, alpha)
    log1m = jnp.log1p(-alpha)  # exact 0 at alpha == 0
    t_g = t_in * jnp.exp(_scan_cols(log1m, exclusive=True))
    t_after = t_g * (1.0 - alpha)  # inclusive product, no second scan
    gate = ((t_after >= T_EPS) & (done_in < 0.5)).astype(jnp.float32)
    w = alpha * t_g * gate
    t_new = jnp.where(
        gate[:1, :] > 0,
        jnp.min(jnp.where(gate > 0, t_after, jnp.inf), axis=0,
                keepdims=True),
        t_in)
    done_new = jnp.maximum(done_in,
                           (t_after[-1:, :] < T_EPS).astype(jnp.float32))
    return dict(power=power, g_exp=g_exp, alpha=alpha, t_g=t_g, gate=gate,
                w=w, t_new=t_new, done_new=done_new)


def _alphas(feat, basis_t, t_in, done_in, ox, oy):
    """Full-width training-path forward math (see _alphas_slice for the
    semantics): (CHUNK, N_PIX) arrays, pixels on lanes."""
    pre = _alphas_pre(feat, ox, oy)
    v = _alphas_slice(pre, basis_t[3:4, :], basis_t[4:5, :], t_in, done_in)
    v.update(rgb=pre["rgb"], opa=pre["opa"], x=pre["x"], y=pre["y"],
             a=pre["a"], b=pre["b"], c=pre["c"])
    return v


def _decode(chunk_meta, k):
    meta = chunk_meta[k]
    return meta >> 2, (meta >> 1) & 1, meta & 1  # tile, first, last


# Saturation-retirement granule: 128 lanes (one vreg row of pixels; 2 tile
# rows at 64-wide tiles). Within a tile, transmittance is monotone
# non-increasing, so once every pixel of a granule latches ``done`` the
# granule NEVER reopens — later chunks can skip its lanes entirely. The
# whole-tile early-exit misses this on clustered scenes (hot tiles whose
# patchy coverage never completes the FULL tile measured 21 ns/slot vs
# 3.8 uniform; see RESULTS round-5 clustered-workload trace). The kernels
# run full-width (one wide op per sub-chunk) until the first granule
# retires, then switch the tile into granule mode: per-granule bodies
# guarded on an SMEM liveness latch. (Skip fractions per workload: see
# scripts/deadlane_analysis.py and the RESULTS saturation table.)
GRAN = 128


def _n_gran(n_pix: int) -> int:
    """Granules per tile (1 = granule mode disabled: tile too small)."""
    return n_pix // GRAN if n_pix % GRAN == 0 and n_pix >= 2 * GRAN else 1


def _pxy(width: int, tile_x: int, offset: int):
    """(1, width) local pixel coordinates for lanes [offset, offset+width)."""
    idx = lax.broadcasted_iota(jnp.int32, (1, width), 1) + offset
    return (idx % tile_x).astype(jnp.float32), (idx // tile_x).astype(
        jnp.float32)


def _fwd_kernel(chunk_meta, feat_ref, ct_init_ref, ct_ref, used_ref,
                acc_ref, tcar_ref, done_ref, stage_ref, live_ref, busy_ref,
                pend_ref, glive_ref, mode_ref, sems,
                *, n_pix: int, tile_x: int, tile_y: int, grid_x: int,
                num_tiles: int, chunk: int, super_chunks: int = SUPER):
    """Training forward, SUPER sub-chunks per grid step (per-grid-step
    overhead — DMA issue + bookkeeping — measured ~0.3 us/chunk; SUPER
    amortizes it 8x). Full training semantics (saturation freeze via
    ``_alphas``), f32 accumulation in scratch; finished tiles flush a
    packed (CTPAD, n_pix) block — rows 0..2 color, row 3 transmittance,
    rows 4..7 sublane-alignment padding — with double-buffered async DMAs.

    ``used_ref`` is a per-SLOT contribution count row (1, chunk * SUPER):
    slot s > 0 iff its duplicate composited into >= 1 pixel — the exact
    condition under which the CUDA kernel marks the fork's elementwise
    ``is_used`` flag (forward.cu:364, set only after the alpha test and
    the drop-the-violator stop rule both pass). The lane reduction rides
    a ones-row bf16 matmul (a VPU axis-1 reduce would emit a (CHUNK, 1)
    sublane vector needing a relayout); positive summands cannot round
    to zero in bf16, so count > 0 is exact.
    """
    del ct_init_ref  # alias-initialized output; never read here
    k = pl.program_id(0)
    n_blk = pl.num_programs(0)
    # Chunks skipped by the tile early-exit (or sentinels) contribute to
    # no pixel: zero the whole block, live sub-chunks overwrite their slice.
    used_ref[...] = jnp.zeros_like(used_ref)

    # SMEM scratch is NOT zero-initialized on hardware (interpret mode
    # zeroes it): garbage busy flags would wait on never-signaled DMA
    # semaphores and hang the device.
    @pl.when(k == 0)
    def _():
        busy_ref[0] = 0
        busy_ref[1] = 0
        busy_ref[2] = 0

    def flush(tile):
        slot = busy_ref[2] % 2

        @pl.when(busy_ref[slot] != 0)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[slot], ct_ref.at[pl.ds(pend_ref[slot], 1)],
                sems.at[slot]).wait()
        pad = jnp.zeros((CTPAD - 4, n_pix), jnp.float32)
        stage_ref[slot] = jnp.concatenate(
            [acc_ref[...], tcar_ref[...], pad], axis=0)[None]
        pltpu.make_async_copy(
            stage_ref.at[slot], ct_ref.at[pl.ds(tile, 1)],
            sems.at[slot]).start()
        busy_ref[slot] = 1
        pend_ref[slot] = tile
        busy_ref[2] = busy_ref[2] + 1

    n_gran = _n_gran(n_pix)
    for j in range(super_chunks):
        tile, first, last = _decode(chunk_meta, k * super_chunks + j)
        ox = ((tile % grid_x) * tile_x).astype(jnp.float32)
        oy = ((tile // grid_x) * tile_y).astype(jnp.float32)
        is_real = tile < num_tiles  # trailing sentinel chunks: no-op

        @pl.when(is_real & (first != 0))
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            tcar_ref[...] = jnp.ones_like(tcar_ref)
            done_ref[...] = jnp.zeros_like(done_ref)
            live_ref[0] = 1
            mode_ref[0] = 0

        # Early exit: once every pixel in this tile has latched ``done``,
        # later chunks contribute nothing (tile-level forward.cu:310-312).
        # Full-width path: one wide op per sub-chunk, until the first
        # 128-lane granule fully saturates (see GRAN). The SMEM latches are
        # read ONCE before both bodies: the full body flips ``mode`` on
        # transition, and a read at the granule-path predicate would see
        # the NEW value and double-composite the same sub-chunk.
        live0 = live_ref[0]
        gmode = mode_ref[0]

        @pl.when(is_real & (live0 != 0) & (gmode == 0))
        def _(j=j, ox=ox, oy=oy):
            basis_t = _basis_t(n_pix, tile_x)
            v = _alphas(feat_ref[:, j * chunk:(j + 1) * chunk], basis_t,
                        tcar_ref[...], done_ref[...], ox, oy)
            # C[ch, p] += sum_g rgb[ch, g] * w[g, p]  — MXU matmul with the
            # 3-channel axis on sublanes (pad 3->8, not 3->128).
            contrib = _dot_hl(v["rgb"], v["w"], (((1,), (0,)), ((), ())))
            acc_ref[...] = acc_ref[...] + contrib
            # per-slot composited-pixel count (see docstring): w > 0 iff
            # the contribution passed both the alpha test and the gate.
            ones_row = jnp.ones((1, n_pix), jnp.bfloat16)
            hit = (v["w"] > 0.0).astype(jnp.bfloat16)
            used_ref[0:1, j * chunk:(j + 1) * chunk] = lax.dot_general(
                ones_row, hit, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            tcar_ref[...] = v["t_new"]
            done_new = v["done_new"]
            done_ref[...] = done_new
            if n_gran > 1:
                # per-granule saturation census: m[g] == 1 iff granule g is
                # fully done. Enter granule mode only once >= HALF the
                # granules have retired while the tile is still live: the
                # granule path's skinny ops run ~2x the per-lane cost of
                # the wide path (measured 203 vs 142.5 ms/it on the 1M
                # clustered workload with a retire-ONE trigger), so flipping
                # early pays the overhead on mostly-live lanes. The G/2
                # threshold guarantees >= 50% lane skip at the flip and the
                # skip only grows (retirement is monotone). glive starts
                # all-1; each retired granule costs ONE wasted evaluation
                # before its own body latches glive=0 — avoids extracting
                # m lanes to SMEM.
                m = jnp.min(done_new.reshape(n_gran, GRAN), axis=1,
                            keepdims=True)
                live_ref[0] = (jnp.min(m) < 0.5).astype(jnp.int32)
                n_ret = jnp.sum((m >= 0.5).astype(jnp.int32))

                @pl.when((n_ret >= n_gran - n_gran // 2)
                         & (jnp.min(m) < 0.5))
                def _():
                    mode_ref[0] = 1
                    for g in range(n_gran):
                        glive_ref[g] = 1
            else:
                live_ref[0] = (jnp.min(done_new) < 0.5).astype(jnp.int32)

        if n_gran > 1:
            # Granule path: retired granules' lanes are skipped entirely.
            @pl.when(is_real & (live0 != 0) & (gmode == 1))
            def _(j=j, ox=ox, oy=oy):
                pre = _alphas_pre(feat_ref[:, j * chunk:(j + 1) * chunk],
                                  ox, oy)
                used_ref[0:1, j * chunk:(j + 1) * chunk] = jnp.zeros(
                    (1, chunk), jnp.float32)
                for g in range(n_gran):
                    @pl.when(glive_ref[g] != 0)
                    def _(g=g):
                        sl = slice(g * GRAN, (g + 1) * GRAN)
                        px, py = _pxy(GRAN, tile_x, g * GRAN)
                        v = _alphas_slice(pre, px, py, tcar_ref[:, sl],
                                          done_ref[:, sl])
                        contrib = _dot_hl(pre["rgb"], v["w"],
                                          (((1,), (0,)), ((), ())))
                        acc_ref[:, sl] = acc_ref[:, sl] + contrib
                        ones_row = jnp.ones((1, GRAN), jnp.bfloat16)
                        hit = (v["w"] > 0.0).astype(jnp.bfloat16)
                        cnt = lax.dot_general(
                            ones_row, hit, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        used_ref[0:1, j * chunk:(j + 1) * chunk] = (
                            used_ref[0:1, j * chunk:(j + 1) * chunk] + cnt)
                        tcar_ref[:, sl] = v["t_new"]
                        done_ref[:, sl] = v["done_new"]
                        glive_ref[g] = (jnp.min(v["done_new"])
                                        < 0.5).astype(jnp.int32)
                alive = glive_ref[0]
                for g in range(1, n_gran):
                    alive = alive | glive_ref[g]
                live_ref[0] = alive

        @pl.when(is_real & (last != 0))
        def _():
            flush(tile)

    # Drain outstanding flushes on the final grid step (sentinel padding
    # guarantees it executes; Pallas requires DMAs complete before exit).
    @pl.when(k == n_blk - 1)
    def _():
        for slot in range(2):
            @pl.when(busy_ref[slot] != 0)
            def _(slot=slot):
                pltpu.make_async_copy(
                    stage_ref.at[slot],
                    ct_ref.at[pl.ds(pend_ref[slot], 1)],
                    sems.at[slot]).wait()
                busy_ref[slot] = 0


def _bwd_kernel(chunk_meta, feat_ref, dpack_ref, dfeat_ref,
                tcar_ref, accum_ref, done_ref, dstage_ref, busy_ref,
                pend_ref, tlive_ref, glive_ref, mode_ref, sems,
                *, n_pix: int, tile_x: int, tile_y: int, grid_x: int,
                num_tiles: int, chunk: int, n_chunks: int,
                super_chunks: int = SUPER):
    """Backward, SUPER sub-chunks per grid step (same amortization as the
    forward; per-grid-step overhead measured ~0.3 us/chunk — ~3.5 ms at the
    1M-cap scale's 13k chunks).

    The per-tile residual/cotangent input is ONE packed (CTPAD, n_pix)
    block ``dpack`` — rows 0..2 the color cotangent dC, row 3 the per-pixel
    total downstream dot D = <dC, C_final> + dT * T_final (precomputed by
    XLA in ``_backward``; those are the only two quantities the old twin
    (ct, dct) operands fed). A super-chunk can span several tiles, so
    ``dpack`` lives in ANY memory and is fetched per TILE with a 2-slot
    double buffer: each tile's LAST chunk issues the async copy for the
    next tile, each tile's FIRST chunk waits on its own (issued one chunk
    earlier in the worst 1-chunk-tile case — mostly hidden behind the
    previous sub-chunk's compute)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        # SMEM scratch is NOT zero-initialized on hardware.
        busy_ref[0] = 0  # tile counter (slot = counter % 2)
        pend_ref[0] = 0
        pend_ref[1] = 0
        tlive_ref[0] = 1
        tile0 = chunk_meta[0] >> 2

        @pl.when(tile0 < num_tiles)
        def _():
            pltpu.make_async_copy(
                dpack_ref.at[pl.ds(tile0, 1)], dstage_ref.at[0],
                sems.at[0]).start()
            pend_ref[0] = 1

    n_gran = _n_gran(n_pix)
    for j in range(super_chunks):
        idx = k * super_chunks + j
        tile, first, last = _decode(chunk_meta, idx)
        ox = ((tile % grid_x) * tile_x).astype(jnp.float32)
        oy = ((tile // grid_x) * tile_y).astype(jnp.float32)
        is_real = tile < num_tiles
        slot = busy_ref[0] % 2

        @pl.when(is_real & (first != 0))
        def _(slot=slot):
            pltpu.make_async_copy(
                dpack_ref.at[pl.ds(0, 1)], dstage_ref.at[slot],
                sems.at[slot]).wait()
            pend_ref[slot] = 0
            tcar_ref[...] = jnp.ones_like(tcar_ref)
            accum_ref[...] = jnp.zeros_like(accum_ref)
            done_ref[...] = jnp.zeros_like(done_ref)
            tlive_ref[0] = 1
            mode_ref[0] = 0

        # tile-saturation latch in SMEM, maintained by the previous live
        # sub-chunk — re-reducing the VMEM ``done`` vector per sub-chunk
        # measured 4.3 ms at 44k chunks on the render kernel. ``mode`` is
        # read ONCE before both bodies (same transition hazard as the
        # forward kernel: the mode-0 body flips it mid-sub-chunk).
        saturated = jnp.logical_not(is_real) | (tlive_ref[0] == 0)
        gmode = mode_ref[0]

        @pl.when(jnp.logical_not(saturated) & (gmode == 0))
        def _(j=j, ox=ox, oy=oy, slot=slot):
            basis_t = _basis_t(n_pix, tile_x)
            feat = feat_ref[:, j * chunk:(j + 1) * chunk]
            v = _alphas(feat, basis_t, tcar_ref[0], done_ref[0], ox, oy)
            dc = dstage_ref[slot, 0, 0:3]     # (3, N_PIX) color cotangent
            d_tot = dstage_ref[slot, 0, 3:4]  # (1, N_PIX) total dot D

            # A[g, p] = <dC[:, p], rgb[:, g]> — contract the channel axis.
            a_pg = _dot_hl(v["rgb"], dc, (((0,), (0,)), ((), ())))
            aw = a_pg * v["w"]
            cum_in = accum_ref[0] + _scan_cols(aw, exclusive=False)
            s = d_tot - cum_in  # suffix contributions incl. the T term
            alpha = v["alpha"]
            live = (alpha > 0.0).astype(jnp.float32)
            dalpha = (a_pg * v["t_g"] - s / (1.0 - alpha)) * v["gate"] * live
            # 0.99-clamp pass-through (backward.cu:477-481): opa*exp(power).
            # ``dalpha`` already carries the gate*live mask, so de = dalpha *
            # g_exp is shared by dpower and the dopa reduction below.
            opa_c = jnp.transpose(v["opa"])
            de = dalpha * v["g_exp"]
            dpower = de * opa_c

            # dcoeff[i, g] = sum_p basis[i, p] * dpower[g, p] — one MXU
            # matmul contracting the pixel lanes, then the chain rule back
            # to the RAW rows on (1, CHUNK) vectors. The hi/lo split is
            # EXACT on the basis operand (monomials need <= 12 mantissa
            # bits at these tile sizes; hi+lo carries 16) and ~2^-18 on
            # dpower — 3 MXU passes instead of HIGHEST's 6.
            dcoeff = _dot_hl(basis_t, dpower, (((1,), (1,)), ((), ())))
            d0, d1, d2, d3, d4, d5 = (dcoeff[i:i + 1, :] for i in range(6))
            x, y = v["x"], v["y"]
            a, b, c = v["a"], v["b"], v["c"]
            da = -0.5 * d0 + x * d3 - 0.5 * (x * x) * d5
            db = -d2 + y * d3 + x * d4 - (x * y) * d5
            dc_ = -0.5 * d1 + y * d4 - 0.5 * (y * y) * d5
            dx = a * d3 + b * d4 - (a * x + b * y) * d5
            dy = b * d3 + c * d4 - (c * y + b * x) * d5
            # drgb[ch, g] = sum_p dC[ch, p] * w[g, p]
            drgb = _dot_hl(dc, v["w"], (((1,), (1,)), ((), ())))
            # dopa[1, g] = sum_p g_exp*dalpha — ones-matmul lane reduction
            # (keeps the result a lane vector; a VPU axis-1 reduce would
            # emit a (CHUNK, 1) sublane vector needing a relayout). ones
            # lhs is exact in bf16; split only the signed rhs (2 passes).
            ones_row = jnp.ones((1, n_pix), jnp.bfloat16)
            rhi, rlo = _split_hi_lo(de)
            dopa_dims = (((1,), (1,)), ((), ()))
            dopa = (lax.dot_general(ones_row, rhi, dopa_dims,
                                    preferred_element_type=jnp.float32)
                    + lax.dot_general(ones_row, rlo, dopa_dims,
                                      preferred_element_type=jnp.float32))
            dfeat_ref[:, j * chunk:(j + 1) * chunk] = jnp.concatenate(
                [dx, dy, da, db, dc_, dopa, drgb], axis=0)

            tcar_ref[...] = v["t_new"][None]
            accum_ref[...] = cum_in[-1:, :][None]
            done_new = v["done_new"]
            done_ref[...] = done_new[None]
            if n_gran > 1:
                # Granule saturation census with the G/2 retire threshold
                # (see GRAN / the forward kernel).
                m = jnp.min(done_new.reshape(n_gran, GRAN), axis=1,
                            keepdims=True)
                tlive_ref[0] = (jnp.min(m) < 0.5).astype(jnp.int32)
                n_ret = jnp.sum((m >= 0.5).astype(jnp.int32))

                @pl.when((n_ret >= n_gran - n_gran // 2)
                         & (jnp.min(m) < 0.5))
                def _():
                    mode_ref[0] = 1
                    for g in range(n_gran):
                        glive_ref[g] = 1
            else:
                tlive_ref[0] = (jnp.min(done_new) < 0.5).astype(jnp.int32)

        if n_gran > 1:
            @pl.when(jnp.logical_not(saturated) & (gmode == 1))
            def _(j=j, ox=ox, oy=oy, slot=slot):
                pre = _alphas_pre(feat_ref[:, j * chunk:(j + 1) * chunk],
                                  ox, oy)
                dfeat_ref[:, j * chunk:(j + 1) * chunk] = jnp.zeros(
                    (NUM_FEAT, chunk), jnp.float32)
                for g in range(n_gran):
                    @pl.when(glive_ref[g] != 0)
                    def _(g=g):
                        sl = slice(g * GRAN, (g + 1) * GRAN)
                        px, py = _pxy(GRAN, tile_x, g * GRAN)
                        v = _alphas_slice(pre, px, py, tcar_ref[0, :, sl],
                                          done_ref[0, :, sl])
                        dc = dstage_ref[slot, 0, 0:3, sl]
                        d_tot = dstage_ref[slot, 0, 3:4, sl]
                        a_pg = _dot_hl(pre["rgb"], dc,
                                       (((0,), (0,)), ((), ())))
                        aw = a_pg * v["w"]
                        cum_in = (accum_ref[0, :, sl]
                                  + _scan_cols(aw, exclusive=False))
                        s = d_tot - cum_in
                        alpha = v["alpha"]
                        live = (alpha > 0.0).astype(jnp.float32)
                        dalpha = ((a_pg * v["t_g"] - s / (1.0 - alpha))
                                  * v["gate"] * live)
                        de = dalpha * v["g_exp"]
                        dpower = de * pre["opa_c"]
                        basis_g = _basis_t(GRAN, tile_x, offset=g * GRAN)
                        dcoeff = _dot_hl(basis_g, dpower,
                                         (((1,), (1,)), ((), ())))
                        d0, d1, d2, d3, d4, d5 = (
                            dcoeff[i:i + 1, :] for i in range(6))
                        x, y = pre["x"], pre["y"]
                        a, b, c = pre["a"], pre["b"], pre["c"]
                        da = -0.5 * d0 + x * d3 - 0.5 * (x * x) * d5
                        db = -d2 + y * d3 + x * d4 - (x * y) * d5
                        dc_ = -0.5 * d1 + y * d4 - 0.5 * (y * y) * d5
                        dx = a * d3 + b * d4 - (a * x + b * y) * d5
                        dy = b * d3 + c * d4 - (c * y + b * x) * d5
                        drgb = _dot_hl(dc, v["w"], (((1,), (1,)), ((), ())))
                        ones_row = jnp.ones((1, GRAN), jnp.bfloat16)
                        rhi, rlo = _split_hi_lo(de)
                        dopa_dims = (((1,), (1,)), ((), ()))
                        dopa = (lax.dot_general(
                            ones_row, rhi, dopa_dims,
                            preferred_element_type=jnp.float32)
                            + lax.dot_general(
                                ones_row, rlo, dopa_dims,
                                preferred_element_type=jnp.float32))
                        dfeat_ref[:, j * chunk:(j + 1) * chunk] = (
                            dfeat_ref[:, j * chunk:(j + 1) * chunk]
                            + jnp.concatenate(
                                [dx, dy, da, db, dc_, dopa, drgb], axis=0))
                        tcar_ref[0, :, sl] = v["t_new"]
                        accum_ref[0, :, sl] = cum_in[-1:, :]
                        done_ref[0, :, sl] = v["done_new"]
                        glive_ref[g] = (jnp.min(v["done_new"])
                                        < 0.5).astype(jnp.int32)
                alive = glive_ref[0]
                for g in range(1, n_gran):
                    alive = alive | glive_ref[g]
                tlive_ref[0] = alive

        @pl.when(saturated)
        def _(j=j):
            dfeat_ref[:, j * chunk:(j + 1) * chunk] = jnp.zeros(
                (NUM_FEAT, chunk), jnp.float32)

        # On this tile's last chunk: issue the prefetch for the NEXT tile
        # into the other slot (the tile sequence is nondecreasing, so the
        # next first-chunk's tile is the tile of the chunk after this one).
        @pl.when(is_real & (last != 0))
        def _(idx=idx, slot=slot):
            nxt = chunk_meta[jnp.minimum(idx + 1, n_chunks - 1)] >> 2
            other = 1 - slot

            @pl.when((nxt < num_tiles) & (idx + 1 < n_chunks))
            def _():
                pltpu.make_async_copy(
                    dpack_ref.at[pl.ds(nxt, 1)], dstage_ref.at[other],
                    sems.at[other]).start()
                pend_ref[other] = 1
            busy_ref[0] = busy_ref[0] + 1

    # Drain any issued-but-unconsumed prefetch (a trailing tile whose first
    # chunk never arrived cannot happen — every issued tile is real — but a
    # final issued prefetch with no consuming first-chunk exists only when
    # the stream ends on a last-chunk whose successor is real, which the
    # sentinel guard excludes; still, wait defensively on exit).
    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        for slot in range(2):
            @pl.when(pend_ref[slot] != 0)
            def _(slot=slot):
                pltpu.make_async_copy(
                    dpack_ref.at[pl.ds(0, 1)], dstage_ref.at[slot],
                    sems.at[slot]).wait()
                pend_ref[slot] = 0


def _forward(feat, chunk_meta, num_tiles: int, n_pix: int,
             tile_x: int, tile_y: int, grid_x: int, chunk: int,
             interpret: bool, super_chunks: int = SUPER):
    assert feat.shape[1] % (chunk * super_chunks) == 0, feat.shape
    feat_spec = pl.BlockSpec((NUM_FEAT, chunk * super_chunks),
                             lambda k, cm: (0, k), memory_space=pltpu.VMEM)
    # Empty tiles get no kernel chunks; their output blocks come from this
    # alias-donated init buffer (background: C=0, T=1) — no patching pass.
    ct_init = jnp.zeros((num_tiles, CTPAD, n_pix), jnp.float32
                        ).at[:, 3].set(1.0)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    used_spec = pl.BlockSpec((1, chunk * super_chunks), lambda k, cm: (0, k),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(feat.shape[1] // (chunk * super_chunks),),
        in_specs=[feat_spec, any_spec],
        out_specs=[any_spec, used_spec],
        scratch_shapes=[
            pltpu.VMEM((3, n_pix), jnp.float32),          # acc
            pltpu.VMEM((1, n_pix), jnp.float32),          # tcar
            pltpu.VMEM((1, n_pix), jnp.float32),          # done latch
            pltpu.VMEM((2, 1, CTPAD, n_pix), jnp.float32),  # DMA stage x2
            pltpu.SMEM((1,), jnp.int32),                  # live flag
            pltpu.SMEM((3,), jnp.int32),                  # busy x2 + ctr
            pltpu.SMEM((2,), jnp.int32),                  # pending tile
            pltpu.SMEM((_n_gran(n_pix),), jnp.int32),     # granule liveness
            pltpu.SMEM((1,), jnp.int32),                  # granule mode
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, n_pix=n_pix, tile_x=tile_x,
                               tile_y=tile_y, grid_x=grid_x,
                               num_tiles=num_tiles, chunk=chunk,
                               super_chunks=super_chunks)
    ct, used = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, CTPAD, n_pix),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((1, feat.shape[1]), jnp.float32)],
        interpret=interpret,
        input_output_aliases={2: 0},  # (cm, feat, ct_init)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(chunk_meta, feat, ct_init)
    return ct, used


def _render_kernel(chunk_meta, feat_ref, bg_ref, c_init_ref, c_ref,
                   acc_ref, tcar_ref, stage_ref, live_ref, busy_ref,
                   pend_ref, sems,
                   *, n_pix: int, tile_x: int, tile_y: int, grid_x: int,
                   num_tiles: int, chunk: int, super_chunks: int = SUPER):
    """Inference-only forward, SUPER sub-chunks per grid step.

    bf16 feature stream, single-pass bf16 MXU transmittance scan, NO
    saturation freeze (skipped contributions are bounded by T <= 1e-4,
    under half an 8-bit ULP), f32 accumulation in scratch. Finished tiles
    are flushed to the HBM output with double-buffered async DMAs; the
    saturation early-exit reads an SMEM scalar written by the previous
    sub-chunk instead of re-reducing a VMEM vector."""
    del c_init_ref
    k = pl.program_id(0)
    n_super = pl.num_programs(0)

    # SMEM scratch is NOT zero-initialized on hardware (interpret mode
    # zeroes it): garbage busy flags would wait on never-signaled DMA
    # semaphores and hang the device.
    @pl.when(k == 0)
    def _():
        busy_ref[0] = 0
        busy_ref[1] = 0
        busy_ref[2] = 0

    def flush(tile):
        slot = busy_ref[2] % 2

        @pl.when(busy_ref[slot] != 0)
        def _():
            pltpu.make_async_copy(
                stage_ref.at[slot], c_ref.at[pl.ds(pend_ref[slot], 1)],
                sems.at[slot]).wait()
        # Channel axis padded 3 -> CPAD: bf16 memref slices must be
        # sublane-tile aligned (Mosaic rejects a 3-row bf16 DMA slice).
        val = acc_ref[...] + tcar_ref[...] * bg_ref[...]
        pad = jnp.zeros((CPAD - 3, val.shape[1]), jnp.float32)
        stage_ref[slot] = jnp.concatenate(
            [val, pad], axis=0).astype(jnp.bfloat16)[None]
        pltpu.make_async_copy(
            stage_ref.at[slot], c_ref.at[pl.ds(tile, 1)],
            sems.at[slot]).start()
        busy_ref[slot] = 1
        pend_ref[slot] = tile
        busy_ref[2] = busy_ref[2] + 1

    for j in range(super_chunks):
        tile, first, last = _decode(chunk_meta, k * super_chunks + j)
        ox = ((tile % grid_x) * tile_x).astype(jnp.float32)
        oy = ((tile // grid_x) * tile_y).astype(jnp.float32)
        is_real = tile < num_tiles

        @pl.when(is_real & (first != 0))
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            tcar_ref[...] = jnp.ones_like(tcar_ref)
            live_ref[0] = 1

        @pl.when(is_real & (live_ref[0] != 0))
        def _(j=j, ox=ox, oy=oy):
            basis_t = _basis_t(n_pix, tile_x)
            feat16 = feat_ref[:, j * chunk:(j + 1) * chunk]
            feat = feat16.astype(jnp.float32)
            power, _, _, _, _, _ = _power_terms(
                feat, basis_t, ox, oy, exact=False)
            opa_c = jnp.transpose(feat[5:6, :])
            alpha = jnp.minimum(ALPHA_MAX, opa_c * jnp.exp(power))
            alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN), 0.0,
                              alpha)
            log1m = jnp.log1p(-alpha)
            t_g = tcar_ref[...] * jnp.exp(
                _scan_cols_bf16(log1m, exclusive=True))
            w = alpha * t_g
            contrib = lax.dot_general(
                feat16[6:9, :], w.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (3, N_PIX)
            acc_ref[...] = acc_ref[...] + contrib
            t_new = t_g[-1:, :] * (1.0 - alpha[-1:, :])
            tcar_ref[...] = t_new
            live_ref[0] = (jnp.max(t_new) > T_EPS).astype(jnp.int32)

        @pl.when(is_real & (last != 0))
        def _():
            flush(tile)

    # Drain outstanding flushes on the final grid step (sentinel padding
    # guarantees it executes; Pallas requires DMAs complete before exit).
    @pl.when(k == n_super - 1)
    def _():
        for slot in range(2):
            @pl.when(busy_ref[slot] != 0)
            def _(slot=slot):
                pltpu.make_async_copy(
                    stage_ref.at[slot],
                    c_ref.at[pl.ds(pend_ref[slot], 1)],
                    sems.at[slot]).wait()
                busy_ref[slot] = 0


def render_forward(feat, chunk_meta, bg, num_tiles: int, n_pix: int,
                   tile_x: int, tile_y: int, grid_x: int, chunk: int,
                   interpret: bool, super_chunks: int = SUPER):
    """Render-only tile blend: bf16 [num_tiles, 3, n_pix] over bg."""
    assert feat.shape[1] % (chunk * super_chunks) == 0, feat.shape

    feat_spec = pl.BlockSpec((NUM_FEAT, chunk * super_chunks),
                             lambda k, cm: (0, k), memory_space=pltpu.VMEM)
    bg_spec = pl.BlockSpec((3, 1), lambda k, cm: (0, 0),
                           memory_space=pltpu.VMEM)
    # Empty tiles get no kernel chunks; their blocks come from this
    # alias-donated init buffer (pure background). Channel axis padded
    # 3 -> CPAD for bf16 DMA slice alignment; the caller slices [:3].
    c_init = jnp.broadcast_to(
        jnp.concatenate([bg.astype(jnp.bfloat16),
                         jnp.zeros((CPAD - 3,), jnp.bfloat16)])[None, :,
                                                                None],
        (num_tiles, CPAD, n_pix))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(feat.shape[1] // (chunk * super_chunks),),
        in_specs=[feat_spec, bg_spec, any_spec],
        out_specs=[any_spec],
        scratch_shapes=[
            pltpu.VMEM((3, n_pix), jnp.float32),      # acc
            pltpu.VMEM((1, n_pix), jnp.float32),      # tcar
            pltpu.VMEM((2, 1, CPAD, n_pix), jnp.bfloat16),  # DMA stage x2
            pltpu.SMEM((1,), jnp.int32),              # live flag
            pltpu.SMEM((3,), jnp.int32),              # busy x2 + slot ctr
            pltpu.SMEM((2,), jnp.int32),              # pending tile per slot
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_render_kernel, n_pix=n_pix, tile_x=tile_x,
                               tile_y=tile_y, grid_x=grid_x,
                               num_tiles=num_tiles, chunk=chunk,
                               super_chunks=super_chunks)
    (c_img,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, CPAD, n_pix),
                                        jnp.bfloat16)],
        interpret=interpret,
        # inputs: (cm, feat, bg, c_init)
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(chunk_meta, feat, bg.astype(jnp.float32)[:, None], c_init)
    return c_img[:, :3]


def _backward(feat, chunk_meta, ct, dct,
              num_tiles: int, n_pix: int, tile_x: int, tile_y: int,
              grid_x: int, chunk: int, interpret: bool,
              super_chunks: int = SUPER):
    # One packed per-tile input block (rows 0-2: dC, row 3: the per-pixel
    # total downstream dot D = <dC, C_final> + dT * T_final, rows 4-7
    # sublane-alignment padding) — the only quantities the kernel needs
    # from (ct, dct); one fused XLA elementwise pass builds it.
    d_tot = (jnp.sum(dct[:, 0:3] * ct[:, 0:3], axis=1, keepdims=True)
             + dct[:, 3:4] * ct[:, 3:4])
    dpack = jnp.concatenate(
        [dct[:, 0:3], d_tot,
         jnp.zeros((ct.shape[0], CTPAD - 4, n_pix), jnp.float32)], axis=1)

    # The unrolled sub-chunk bodies each hold several (chunk, n_pix) f32
    # temporaries; Mosaic's scoped-vmem stack overflows its 16 MB limit
    # when chunk * n_pix * super_chunks exceeds ~2^22 elements (measured:
    # 128x32 tiles / chunk 128 / SUPER 8 needs 18.1 MB). Halve the unroll
    # until it fits — the grid alignment stays valid because the clamped
    # value still divides the caller's chunk * super_chunks padding.
    while super_chunks > 1 and chunk * n_pix * super_chunks > 1 << 21:
        super_chunks //= 2

    assert feat.shape[1] % (chunk * super_chunks) == 0, feat.shape
    n_chunks = feat.shape[1] // chunk
    feat_spec = pl.BlockSpec((NUM_FEAT, chunk * super_chunks),
                             lambda k, cm: (0, k), memory_space=pltpu.VMEM)
    dfeat_spec = pl.BlockSpec((NUM_FEAT, chunk * super_chunks),
                              lambda k, cm: (0, k), memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(feat.shape[1] // (chunk * super_chunks),),
        in_specs=[feat_spec, any_spec],
        out_specs=[dfeat_spec],
        scratch_shapes=[
            pltpu.VMEM((1, 1, n_pix), jnp.float32),        # tcar
            pltpu.VMEM((1, 1, n_pix), jnp.float32),        # accum
            pltpu.VMEM((1, 1, n_pix), jnp.float32),        # done
            pltpu.VMEM((2, 1, CTPAD, n_pix), jnp.float32),  # dpack stage x2
            pltpu.SMEM((1,), jnp.int32),                   # tile counter
            pltpu.SMEM((2,), jnp.int32),                   # pending flags
            pltpu.SMEM((1,), jnp.int32),                   # saturation latch
            pltpu.SMEM((_n_gran(n_pix),), jnp.int32),      # granule liveness
            pltpu.SMEM((1,), jnp.int32),                   # granule mode
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, n_pix=n_pix, tile_x=tile_x,
                               tile_y=tile_y, grid_x=grid_x,
                               num_tiles=num_tiles, chunk=chunk,
                               n_chunks=n_chunks, super_chunks=super_chunks)
    (dfeat,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(feat.shape, jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(chunk_meta, feat, dpack)
    return dfeat


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def _tile_blend_packed(feat, chunk_meta, num_tiles: int, n_pix: int,
                       tile_x: int, tile_y: int, grid_x: int, chunk: int,
                       interpret: bool = False, super_chunks: int = SUPER):
    """Packed-output core: ([num_tiles, CTPAD, n_pix], used [1, K]).
    Packed rows 0-2 color, row 3 transmittance, 4-7 alignment padding.
    Differentiating the PACKED array keeps the backward kernel at two
    block operands (ct, dct) instead of four — the cotangents of the
    caller's slices merge into one zero-padded buffer for free. The
    per-slot ``used`` counts are integer bookkeeping (zero cotangent)."""
    return _forward(feat, chunk_meta, num_tiles, n_pix, tile_x,
                    tile_y, grid_x, chunk, interpret, super_chunks)


def _tile_blend_fwd(feat, chunk_meta, num_tiles, n_pix, tile_x,
                    tile_y, grid_x, chunk, interpret, super_chunks):
    ct, used = _forward(feat, chunk_meta, num_tiles, n_pix,
                        tile_x, tile_y, grid_x, chunk, interpret,
                        super_chunks)
    return (ct, used), (feat, chunk_meta, ct)


def _tile_blend_bwd(num_tiles, n_pix, tile_x, tile_y, grid_x, chunk,
                    interpret, super_chunks, res, cts):
    dct, _dused = cts
    feat, chunk_meta, ct = res
    dfeat = _backward(feat, chunk_meta, ct, dct,
                      num_tiles, n_pix, tile_x, tile_y, grid_x, chunk,
                      interpret, super_chunks)
    zero_i = np.zeros(chunk_meta.shape, dtype=jax.dtypes.float0)
    return (dfeat, zero_i)


_tile_blend_packed.defvjp(_tile_blend_fwd, _tile_blend_bwd)


def tile_blend(feat, chunk_meta, num_tiles: int, n_pix: int,
               tile_x: int, tile_y: int, grid_x: int, chunk: int,
               interpret: bool = False, super_chunks: int = SUPER):
    """Composite padded duplicate lists into per-tile pixel blocks.

    Args:
      feat: [NUM_FEAT, K_padded] f32, K_padded a multiple of
        ``chunk * SUPER``; each tile's duplicates contiguous, depth-sorted,
        zero rows as padding.
      chunk_meta: [K_padded // chunk] int32 packed
        ``tile_id << 2 | is_first << 1 | is_last`` per chunk (tile ids
        non-decreasing; sentinel chunks carry tile_id == num_tiles).
    Returns:
      (color [num_tiles, 3, n_pix] — premultiplied, no background,
       transmittance [num_tiles, 1, n_pix],
       used [K_padded] f32 — per-slot composited-pixel count, > 0 iff the
       duplicate contributed to >= 1 pixel (forward.cu:364 semantics)).
    """
    ct, used = _tile_blend_packed(feat, chunk_meta, num_tiles, n_pix,
                                  tile_x, tile_y, grid_x, chunk, interpret,
                                  super_chunks)
    return ct[:, 0:3], ct[:, 3:4], used[0]
