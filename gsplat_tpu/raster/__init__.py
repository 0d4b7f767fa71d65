"""Differentiable tile-based Gaussian rasterization (the TPU-native
replacement for the reference's diff-gaussian-rasterization CUDA extension).

Pipeline (gsplat_tpu.raster.rasterize.rasterize):
  1. ``project.preprocess``   — pure-jnp per-Gaussian projection / culling /
     conic / SH color (differentiable; XLA autodiff supplies the chain rules
     the reference hand-writes in backward.cu:144-396).
  2. ``binning.bin_gaussians`` — depth sort + tile expansion (integer, no
     gradients; replaces the CUB scan/radix-sort of rasterizer_impl.cu).
  3. ``tile_kernel``           — Pallas per-tile alpha compositing with a
     custom VJP (replaces forward.cu:261-377 / backward.cu:399-557).

``naive.render_naive`` is the slow pure-jnp oracle used by the test suite.
"""

from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize  # noqa: F401
