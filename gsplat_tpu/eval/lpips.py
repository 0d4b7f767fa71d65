"""LPIPS perceptual metric in JAX.

Reimplements the reference's self-contained LPIPS v0.1 (lpipsPyTorch/):
a frozen feature network (VGG16 / AlexNet / SqueezeNet conv stacks),
unit-normalized activations per layer, and 1x1 linear heads, averaged over
space and summed over layers.

Weight sourcing: this environment has zero egress, so pretrained backbone +
linear-head weights cannot be downloaded at runtime. We load them from the
LPIPS_WEIGHTS_NPZ env var or a bundled ``lpips_vgg.npz`` (exported once via
the helper below on a machine with the `lpips` package). When no true-head
weights are available, ``lpips()`` raises LPIPSUnavailable — callers
(metrics.py) report an explicit "unavailable" marker plus null, never a
silently wrong number (there is deliberately NO approximate fallback).

Export helper (run on a machine with weights):
    python -m gsplat_tpu.eval.lpips export vgg /path/out.npz
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


class LPIPSUnavailable(RuntimeError):
    pass


# VGG16 feature-extractor conv plan: (out_channels, layers) per block;
# LPIPS taps activations after each block's final ReLU (pre-pool), i.e.
# torchvision feature indices 3, 8, 15, 22, 29.
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# ImageNet normalization used by LPIPS's ScalingLayer (lpips v0.1 constants).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    """3x3 same conv, NHWC / OIHW weights."""
    out = lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    return out + b[None, None, None, :]


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


def vgg16_features(params: Dict[str, jnp.ndarray], x) -> List[jnp.ndarray]:
    """x: [N, H, W, 3] in [-1, 1] (LPIPS input convention). Returns the 5
    tapped activations."""
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    idx = 0
    for block, (ch, n_layers) in enumerate(_VGG_PLAN):
        for li in range(n_layers):
            x = jax.nn.relu(_conv(x, params[f"conv{idx}_w"],
                                  params[f"conv{idx}_b"]))
            idx += 1
        feats.append(x)
        if block < len(_VGG_PLAN) - 1:
            x = _maxpool(x)
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


@functools.lru_cache(maxsize=2)
def _load_weights(net: str = "vgg"):
    path = os.environ.get("LPIPS_WEIGHTS_NPZ", "")
    candidates = [path] if path else []
    candidates.append(os.path.join(os.path.dirname(__file__),
                                   f"lpips_{net}.npz"))
    for c in candidates:
        if c and os.path.exists(c):
            z = np.load(c)
            params = {k: jnp.asarray(z[k]) for k in z.files}
            missing = [i for i in range(len(_VGG_PLAN))
                       if f"lin{i}_w" not in params]
            if missing:
                raise LPIPSUnavailable(
                    f"{c} lacks true LPIPS linear heads (lin*_w); refusing "
                    "to compute a not-quite-LPIPS number")
            return params
    raise LPIPSUnavailable(
        "LPIPS weights not found: set LPIPS_WEIGHTS_NPZ or place "
        f"lpips_{net}.npz next to gsplat_tpu/eval/lpips.py (export with "
        "`python -m gsplat_tpu.eval.lpips export vgg out.npz` on a machine "
        "with the lpips package)")


def lpips(img1, img2, net: str = "vgg"):
    """img1/img2: [H, W, 3] in [0, 1]. Returns scalar LPIPS distance."""
    params = _load_weights(net)
    x1 = img1[None] * 2.0 - 1.0
    x2 = img2[None] * 2.0 - 1.0
    f1 = vgg16_features(params, x1)
    f2 = vgg16_features(params, x2)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
        w = params[f"lin{i}_w"]  # [C] true LPIPS head (guaranteed by loader)
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1))
    return total


def export_from_lpips_package(net: str, out_path: str) -> None:
    """Run on a machine WITH the `lpips` pip package + weights to export an
    npz usable here (backbone convs + true linear heads)."""
    import lpips as lpips_pkg  # type: ignore
    import torch

    model = lpips_pkg.LPIPS(net=net)
    ci = 0
    seen = {}
    for n, p in model.net.named_parameters():
        if n.endswith(".weight") and p.dim() == 4:
            seen[f"conv{ci}_w"] = p.detach().numpy()
        elif n.endswith(".bias"):
            seen[f"conv{ci}_b"] = p.detach().numpy()
            ci += 1
    for i, lin in enumerate(model.lins):
        w = lin.model[1].weight.detach().numpy()  # [1, C, 1, 1]
        seen[f"lin{i}_w"] = w[0, :, 0, 0]
    np.savez(out_path, **seen)


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 4 and sys.argv[1] == "export":
        export_from_lpips_package(sys.argv[2], sys.argv[3])
