"""Slow pure-jnp oracle renderer: per-pixel evaluation of all Gaussians.

This is the test oracle for the fast tiled/Pallas path (SURVEY.md §4:
"kernel tests — Pallas rasterizer vs. a slow pure-jnp reference rasterizer").
It is O(P * H * W) and fully differentiable via lax.scan, so jax.grad of it
also provides golden gradients for the custom VJP.

Compositing semantics (CUDA-exact, matching the fast path):
- alpha = min(0.99, opacity * exp(power)); contributions with power > 0 or
  alpha < 1/255 are skipped (forward.cu:336-346),
- stop rule exactly as forward.cu:347-352: a Gaussian composites iff
  T * (1 - alpha) >= 1e-4 and the pixel hasn't already stopped; the first
  violator is itself dropped and latches the pixel done (T freezes at the
  pre-violator value, which final_T reports),
- a Gaussian affects a pixel only if the pixel's tile lies inside the
  Gaussian's 3-sigma tile rect (tile-granular cutoff, as in the reference's
  binning) — pass tile dims to reproduce the tiled footprint exactly.

Independently cross-checked against tests/reference_port.py (a numpy
transliteration written from the CUDA source, not from this file).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gsplat_tpu.raster.project import Preprocessed, tile_rect

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _clamp_passthrough(x, hi):
    """min(x, hi) in the forward, identity in the backward.

    The reference backward ignores the 0.99 alpha clamp when chaining
    dL/dalpha to opacity and power (backward.cu:477-481); this helper
    reproduces that so the oracle's autodiff matches the Pallas VJP.
    """
    return x + jax.lax.stop_gradient(jnp.minimum(x, hi) - x)


def blend_pixels(order, proc: Preprocessed, px, py, bg,
                 tile_x: int, tile_y: int, grid_x: int, grid_y: int,
                 with_used: bool = False):
    """Composite depth-ordered Gaussians over a set of pixels.

    Args:
      order: [P] int32 depth-ascending Gaussian ordering (invisible last).
      proc: Preprocessed quantities.
      px, py: [...,] pixel-center coordinates (float).
      bg: [3] background color.
      with_used: also return the fork's elementwise is_used flag
        (forward.cu:364 — set iff the Gaussian composited into >= 1 of
        the given pixels).
    Returns (color [..., 3], final_T [...]) or (color, final_T, used [P]).
    """
    min_x, min_y, max_x, max_y = tile_rect(
        proc.xy, proc.radius, tile_x, tile_y, grid_x, grid_y)
    ptx = (px / tile_x).astype(jnp.int32)
    pty = (py / tile_y).astype(jnp.int32)

    def body(carry, g):
        T, C, done = carry
        in_rect = ((ptx >= min_x[g]) & (ptx < max_x[g]) &
                   (pty >= min_y[g]) & (pty < max_y[g]) & proc.visible[g])
        dx = px - proc.xy[g, 0]
        dy = py - proc.xy[g, 1]
        a, b, c = proc.conic[g, 0], proc.conic[g, 1], proc.conic[g, 2]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
        alpha = _clamp_passthrough(proc.opacity[g] * jnp.exp(power), ALPHA_MAX)
        ok = in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN) & ~done
        # forward.cu:347-352: the contribution that would push T below
        # 1e-4 is dropped and stops the pixel for good.
        viol = ok & (T * (1.0 - alpha) < T_EPS)
        composited = ok & ~viol
        alpha = jnp.where(composited, alpha, 0.0)
        C = C + proc.rgb[g] * (alpha * T)[..., None]
        T = T * (1.0 - alpha)
        done = done | viol
        return (T, C, done), jnp.any(composited & (alpha > 0.0))

    T0 = jnp.ones(px.shape, dtype=jnp.float32)
    C0 = jnp.zeros(px.shape + (3,), dtype=jnp.float32)
    done0 = jnp.zeros(px.shape, dtype=bool)
    (T, C, _), used_in_order = lax.scan(body, (T0, C0, done0), order)
    color = C + T[..., None] * bg
    if with_used:
        used = jnp.zeros(order.shape, bool).at[order].set(used_in_order)
        return color, T, used
    return color, T


def render_naive(proc: Preprocessed, width: int, height: int, bg,
                 tile_x: int = 8, tile_y: int = 8, with_used: bool = False):
    """Render the full image with the oracle. Returns ([H, W, 3], final_T)
    (+ elementwise used [P] when ``with_used``)."""
    grid_x = -(-width // tile_x)
    grid_y = -(-height // tile_y)
    order = jnp.argsort(proc.depth)
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    py, px = jnp.meshgrid(ys, xs, indexing="ij")
    return blend_pixels(order, proc, px, py, jnp.asarray(bg, jnp.float32),
                        tile_x, tile_y, grid_x, grid_y, with_used=with_used)
