"""LPIPS perceptual metric in JAX.

Reimplements the reference's self-contained LPIPS v0.1 (lpipsPyTorch/):
a frozen feature network (VGG16 / AlexNet / SqueezeNet conv stacks,
lpipsPyTorch/modules/networks.py:66-96), unit-normalized activations per
tapped layer, and 1x1 linear heads, averaged over space and summed over
layers (modules/lpips.py:31-36).

Backbone architectures (torchvision definitions, transliterated):
- VGG16 features: 13 3x3 convs in 5 blocks, taps after each block's last
  ReLU (feature indices 4/9/16/23/30 in networks.py:95).
- AlexNet features: conv 11x11/s4 -> pool -> conv 5x5 -> pool -> 3x 3x3,
  taps after each of the 5 ReLUs (networks.py:83, target [2,5,8,10,12]).
- SqueezeNet 1.1 features: conv 3x3/s2 + 8 Fire modules with 3 ceil-mode
  maxpools, taps at indices [2,5,8,10,11,12,13] (networks.py:71-72).

Weight sourcing: this environment has zero egress, so pretrained backbone +
linear-head weights cannot be downloaded at runtime. We load them from the
LPIPS_WEIGHTS_NPZ env var or a bundled ``lpips_{net}.npz`` (exported once
via the helper below on a machine with the `lpips` package). When no
true-head weights are available, ``lpips()`` raises LPIPSUnavailable —
callers (metrics.py) report an explicit "unavailable" marker plus null,
never a silently wrong number (there is deliberately NO approximate
fallback).

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
# torchvision feature indices 4, 9, 16, 23, 30 (networks.py:95).
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# SqueezeNet 1.1 Fire plan: (squeeze_ch, expand_ch) — output 2*expand_ch.
_FIRE_PLAN = [(16, 64), (16, 64), (32, 128), (32, 128),
              (48, 192), (48, 192), (64, 256), (64, 256)]

# Tapped-channel widths per net (networks.py:72,84,96) — also the number of
# linear heads the npz must carry.
NET_CHANNELS = {
    "vgg": [64, 128, 256, 512, 512],
    "alex": [64, 192, 384, 256, 256],
    "squeeze": [64, 128, 256, 384, 384, 512, 512],
}

# ImageNet normalization used by LPIPS's ScalingLayer (lpips v0.1 constants,
# networks.py:41-44).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride=1, pad=1):
    """KxK conv, NHWC activations / OIHW weights."""
    out = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"))
    return out + b[None, None, None, :]


def _maxpool(x, k=2, stride=2, ceil_mode=False):
    """Max pool; ceil_mode pads right/bottom with -inf so partial windows
    count (torch MaxPool2d ceil_mode=True semantics)."""
    h, w = x.shape[1], x.shape[2]
    if ceil_mode:
        oh = -(-(h - k) // stride) + 1
        ow = -(-(w - k) // stride) + 1
        ph = max(0, (oh - 1) * stride + k - h)
        pw = max(0, (ow - 1) * stride + k - w)
        pad = ((0, 0), (0, ph), (0, pw), (0, 0))
    else:
        pad = ((0, 0), (0, 0), (0, 0), (0, 0))
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k, 1),
                             (1, stride, stride, 1), pad)


def _zscore(x):
    return (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)


def vgg16_features(params: Dict[str, jnp.ndarray], x) -> List[jnp.ndarray]:
    """x: [N, H, W, 3] in [-1, 1] (LPIPS input convention). Returns the 5
    tapped activations."""
    x = _zscore(x)
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


def alexnet_features(params: Dict[str, jnp.ndarray], x) -> List[jnp.ndarray]:
    """torchvision alexnet.features with taps after each ReLU
    (networks.py:77-85, target_layers [2,5,8,10,12] 1-based)."""
    x = _zscore(x)
    feats = []
    # (kernel, stride, pad) per conv; pools sit after convs 0 and 1.
    specs = [(11, 4, 2), (5, 1, 2), (3, 1, 1), (3, 1, 1), (3, 1, 1)]
    for i, (k, s, p) in enumerate(specs):
        x = jax.nn.relu(_conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"],
                              stride=s, pad=p))
        feats.append(x)
        if i < 2:
            x = _maxpool(x, k=3, stride=2)
    return feats


def _fire(params, idx, x):
    """SqueezeNet Fire: 1x1 squeeze + ReLU, then concat(1x1 expand, 3x3
    expand), each + ReLU. Three convs, numbered sequentially from ``idx``
    in torch parameter order (squeeze, expand1x1, expand3x3)."""
    s = jax.nn.relu(_conv(x, params[f"conv{idx}_w"], params[f"conv{idx}_b"],
                          pad=0))
    e1 = jax.nn.relu(_conv(s, params[f"conv{idx + 1}_w"],
                           params[f"conv{idx + 1}_b"], pad=0))
    e3 = jax.nn.relu(_conv(s, params[f"conv{idx + 2}_w"],
                           params[f"conv{idx + 2}_b"], pad=1))
    return jnp.concatenate([e1, e3], axis=-1), idx + 3


def squeezenet_features(params: Dict[str, jnp.ndarray],
                        x) -> List[jnp.ndarray]:
    """torchvision squeezenet1_1.features with taps at indices
    [2,5,8,10,11,12,13] 1-based (networks.py:66-73), i.e. after 0-based
    modules 1, 4, 7, 9, 10, 11, 12: the stem ReLU and the 2nd, 4th, 5th,
    6th, 7th, and 8th Fire modules."""
    x = _zscore(x)
    feats = []
    x = jax.nn.relu(_conv(x, params["conv0_w"], params["conv0_b"],
                          stride=2, pad=0))
    feats.append(x)                                   # module 1 (stem ReLU)
    idx = 1
    # features: pool, fire, fire, pool, fire, fire, pool, fire x4
    # tap set (0-based module): {4, 7, 9, 10, 11, 12}
    x = _maxpool(x, k=3, stride=2, ceil_mode=True)    # module 2
    x, idx = _fire(params, idx, x)                    # module 3
    x, idx = _fire(params, idx, x)                    # module 4
    feats.append(x)
    x = _maxpool(x, k=3, stride=2, ceil_mode=True)    # module 5
    x, idx = _fire(params, idx, x)                    # module 6
    x, idx = _fire(params, idx, x)                    # module 7
    feats.append(x)
    x = _maxpool(x, k=3, stride=2, ceil_mode=True)    # module 8
    x, idx = _fire(params, idx, x)                    # module 9
    feats.append(x)
    x, idx = _fire(params, idx, x)                    # module 10
    feats.append(x)
    x, idx = _fire(params, idx, x)                    # module 11
    feats.append(x)
    x, idx = _fire(params, idx, x)                    # module 12
    feats.append(x)
    return feats


_FEATURE_FNS = {
    "vgg": vgg16_features,
    "alex": alexnet_features,
    "squeeze": squeezenet_features,
}


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


@functools.lru_cache(maxsize=3)
def _load_weights(net: str = "vgg"):
    if net not in NET_CHANNELS:
        raise ValueError(f"unknown LPIPS net {net!r}; choose from "
                         f"{sorted(NET_CHANNELS)}")
    path = os.environ.get("LPIPS_WEIGHTS_NPZ", "")
    candidates = [path] if path else []
    candidates.append(os.path.join(os.path.dirname(__file__),
                                   f"lpips_{net}.npz"))
    for c in candidates:
        if c and os.path.exists(c):
            z = np.load(c)
            params = {k: jnp.asarray(z[k]) for k in z.files}
            missing = [i for i in range(len(NET_CHANNELS[net]))
                       if f"lin{i}_w" not in params]
            if missing:
                raise LPIPSUnavailable(
                    f"{c} lacks true LPIPS linear heads (lin*_w); refusing "
                    "to compute a not-quite-LPIPS number")
            return params
    raise LPIPSUnavailable(
        "LPIPS weights not found: set LPIPS_WEIGHTS_NPZ or place "
        f"lpips_{net}.npz next to gsplat_tpu/eval/lpips.py (export with "
        f"`python -m gsplat_tpu.eval.lpips export {net} out.npz` on a "
        "machine with the lpips package)")


def lpips_from_params(params: Dict[str, jnp.ndarray], img1, img2,
                      net: str = "vgg"):
    """Core distance given explicit weights (tested against torch)."""
    x1 = img1[None] * 2.0 - 1.0
    x2 = img2[None] * 2.0 - 1.0
    feature_fn = _FEATURE_FNS[net]
    f1 = feature_fn(params, x1)
    f2 = feature_fn(params, x2)
    total = 0.0
    for i, (a, b) in enumerate(zip(f1, f2)):
        d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
        w = params[f"lin{i}_w"]  # [C] true LPIPS head (guaranteed by loader)
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1))
    return total


def lpips(img1, img2, net: str = "vgg"):
    """img1/img2: [H, W, 3] in [0, 1]. Returns scalar LPIPS distance."""
    return lpips_from_params(_load_weights(net), img1, img2, net)


def export_from_lpips_package(net: str, out_path: str) -> None:
    """Run on a machine WITH the `lpips` pip package + weights to export an
    npz usable here (backbone convs + true linear heads)."""
    import lpips as lpips_pkg  # type: ignore

    model = lpips_pkg.LPIPS(net=net)
    seen = export_torch_features(model.net.named_parameters())
    for i, lin in enumerate(model.lins):
        w = lin.model[1].weight.detach().numpy()  # [1, C, 1, 1]
        seen[f"lin{i}_w"] = w[0, :, 0, 0]
    np.savez(out_path, **seen)


def export_torch_features(named_parameters) -> Dict[str, np.ndarray]:
    """Torch conv params (in definition order) -> the conv{i}_w/_b naming
    this module uses. Works for vgg16/alexnet/squeezenet1_1 feature stacks
    (Fire submodules enumerate squeeze, expand1x1, expand3x3 — definition
    order matches parameter order)."""
    seen = {}
    ci = 0
    for n, p in named_parameters:
        if n.endswith(".weight") and p.dim() == 4:
            seen[f"conv{ci}_w"] = p.detach().cpu().numpy()
        elif n.endswith(".bias"):
            seen[f"conv{ci}_b"] = p.detach().cpu().numpy()
            ci += 1
    return seen


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 4 and sys.argv[1] == "export":
        export_from_lpips_package(sys.argv[2], sys.argv[3])
