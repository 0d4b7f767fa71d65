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


def psnr(pred, gt):
    """20*log10(1/sqrt(mse)) per image (utils/image_utils.py:17-19)."""
    m = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


@functools.lru_cache()
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
                  for x in range(window_size)], np.float32)
    g = g / g.sum()
    return np.outer(g, g)


def _filter2d(img, window_size: int):
    """Depthwise 2D conv with zero 'same' padding, img [H, W, C]."""
    c = img.shape[-1]
    w = jnp.asarray(_gaussian_window(window_size))
    kernel = jnp.broadcast_to(w[None, None], (c, 1, window_size, window_size))
    pad = window_size // 2
    out = lax.conv_general_dilated(
        img[None], kernel, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
        feature_group_count=c,
        precision="highest")
    return out[0]


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over the image, reference-identical windowing."""
    mu1 = _filter2d(img1, window_size)
    mu2 = _filter2d(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, window_size) - mu2_sq
    sigma12 = _filter2d(img1 * img2, window_size) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)
