"""gsplat_tpu — a TPU-native 3D Gaussian Splatting framework (JAX/XLA/Pallas).

Re-implements, TPU-first, the full capability surface of the 3DGS-MCMC /
SwinGS reference (NeutrinoLiu/3dgs-mcmc):

- differentiable tile-based Gaussian rasterization (``gsplat_tpu.raster``),
  replacing the reference CUDA extension ``diff-gaussian-rasterization``;
- MCMC densification (relocation / capped respawn / noise injection) as pure
  functional updates over statically-shaped Gaussian buffers
  (``gsplat_tpu.model.mcmc``);
- the data stack: COLMAP / Blender / SwinGS per-frame datasets
  (``gsplat_tpu.data``);
- static and sliding-window training loops (``gsplat_tpu.train``);
- eval: PSNR / SSIM / LPIPS (``gsplat_tpu.eval``);
- multi-device parallelism over a ``jax.sharding.Mesh``
  (``gsplat_tpu.parallel``) — a new capability the single-GPU reference lacks.

Design notes (vs. the reference):
- Gaussian count is statically padded to ``cap_max`` with an alive mask;
  growth/relocation are masked scatters, not tensor re-allocation
  (reference: scene/gaussian_model_static.py:302-392 optimizer surgery).
- The rasterizer is a composition of a differentiable pure-jnp preprocess,
  an integer binning step (depth sort + one-scatter marker expansion
  with fused Pallas scans),
  and a Pallas per-tile alpha-blend kernel with a custom VJP.
"""

__version__ = "0.1.0"
