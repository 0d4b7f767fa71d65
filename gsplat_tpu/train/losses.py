"""Image losses: L1/L2, windowed SSIM, PSNR.

Parity targets:
- l1_loss / l2_loss (reference utils/loss_utils.py:21-25)
- ssim: 11x11 Gaussian window, sigma=1.5, zero-padded depthwise conv,
  C1=0.01^2, C2=0.03^2 (utils/loss_utils.py:27-67) — numerics match
  torch.nn.functional.conv2d(padding=window//2) exactly.
- mse / psnr (utils/image_utils.py:14-19)

Images are [H, W, C] float in [0, 1] (channels-last; the torch reference is
[C, H, W] — transposed convention only).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def mse(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def psnr(pred, gt, channel_axis: int | None = None):
    """20*log10(1/sqrt(mse)) (utils/image_utils.py:14-19).

    The reference's psnr flattens per pred.shape[0] row: its TRAINER calls
    it on [3, H, W] images (train_static.py:197), yielding the MEAN OF
    PER-CHANNEL PSNRs, while metrics.py calls it on [1, 3, H, W] batches,
    yielding whole-image PSNR. Pass ``channel_axis`` for the trainer
    semantics; default is whole-image (the metrics.py call site)."""
    if channel_axis is None:
        m = jnp.mean((pred - gt) ** 2)
        return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))
    axes = tuple(a for a in range(pred.ndim) if a != channel_axis % pred.ndim)
    m = jnp.mean((pred - gt) ** 2, axis=axes)
    return jnp.mean(20.0 * jnp.log10(1.0 / jnp.sqrt(m)))


@functools.lru_cache()
def _gaussian_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
                  for x in range(window_size)], np.float32)
    return g / g.sum()


def _blur_axis(img, g: np.ndarray, axis: int):
    """1D conv along ``axis`` with zero 'same' padding via shifted adds.

    XLA's depthwise conv wastes the vector unit at C=3 (3 of 128 lanes);
    eleven shifted adds keep every lane busy and autodiff cleanly."""
    window = g.shape[0]
    pad = window // 2
    n = img.shape[axis]
    pad_cfg = [(0, 0)] * img.ndim
    pad_cfg[axis] = (pad, pad)
    padded = jnp.pad(img, pad_cfg)
    out = None
    for t in range(window):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(t, t + n)
        term = float(g[t]) * padded[tuple(sl)]
        out = term if out is None else out + term
    return out


def _filter2d(img, window_size: int, axes=(0, 1)):
    """Depthwise 2D Gaussian conv with zero 'same' padding over ``axes``.

    The window is an outer product of a normalized 1D Gaussian
    (loss_utils.py:31-34), so the 2D conv separates into a vertical and a
    horizontal shifted-add pass — identical result, ~5x fewer taps."""
    g = _gaussian_1d(window_size)
    return _blur_axis(_blur_axis(img, g, axes[0]), g, axes[1])


def build_neighbor(xyz, num_knn: int = 20, weight_coef: float = 2000.0):
    """KNN graph for ARAP (reference build_neighbor, loss_utils.py:83-101 —
    open3d KDTree replaced by an exact blocked MXU KNN)."""
    from gsplat_tpu.model.knn import knn_indices

    sq_dists, indices = knn_indices(xyz, k=num_knn)
    return {"indices": indices, "dist": sq_dists,
            "weight": jnp.exp(-weight_coef * sq_dists)}


def arap_loss(xyz, paras, indices, weight_coef: float = 2000.0):
    """As-rigid-as-possible smoothness over a KNN graph
    (utils/loss_utils.py:103-117): per parameter field p, sum over edges of
    exp(-coef*|dx|^2) * |dp|^2. Returns [len(paras)] penalties."""
    nei_xyz = xyz[indices]                       # [N, K, 3]
    sq_dist = jnp.sum((nei_xyz - xyz[:, None]) ** 2, axis=-1)  # [N, K]
    weight = jnp.exp(-weight_coef * sq_dist)
    pens = []
    for p in paras:
        nei_p = p[indices]
        d = jnp.sum((nei_p - p[:, None]) ** 2, axis=-1)
        pens.append(jnp.mean(jnp.sum(weight * d, axis=-1)))
    return jnp.stack(pens)


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over the image, reference-identical windowing.

    Accepts [H, W, C] or channel-first [3, H, W] (the train steps run CHW:
    a channels-minor image is lane-padded 3->128 on TPU, 42x the physical
    bytes for every windowing pass and its gradient)."""
    chw = img1.ndim == 3 and img1.shape[0] == 3 and img1.shape[-1] != 3
    axes = (1, 2) if chw else (0, 1)
    _filter2d_ = functools.partial(_filter2d, axes=axes)
    mu1 = _filter2d_(img1, window_size)
    mu2 = _filter2d_(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _filter2d_(img2 * img2, window_size) - mu2_sq
    sigma12 = _filter2d_(img1 * img2, window_size) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)
