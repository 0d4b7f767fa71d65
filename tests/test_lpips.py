"""LPIPS backbone validation against torch (VERDICT r2 next #6).

torch (CPU) is baked into this environment (torchvision is NOT), so the
reference's torchvision feature stacks (lpipsPyTorch/modules/networks.py:
66-96) are rebuilt here with plain torch.nn — the architectures are fixed
public definitions (vgg16/alexnet/squeezenet1_1 features) — and the JAX
stacks are checked against them with random weights. This independently
validates conv padding/stride and ceil-mode pooling semantics against
torch's own operators with zero egress. The full distance is checked
against a torch reimplementation of the reference's LPIPS.forward
(modules/lpips.py:31-36).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from gsplat_tpu.eval import lpips as L  # noqa: E402


class Fire(nn.Module):
    """squeezenet1_1 Fire module (torchvision definition)."""

    def __init__(self, cin, squeeze, expand):
        super().__init__()
        self.squeeze = nn.Conv2d(cin, squeeze, 1)
        self.expand1x1 = nn.Conv2d(squeeze, expand, 1)
        self.expand3x3 = nn.Conv2d(squeeze, expand, 3, padding=1)
        self.relu = nn.ReLU(inplace=False)

    def forward(self, x):
        s = self.relu(self.squeeze(x))
        return torch.cat([self.relu(self.expand1x1(s)),
                          self.relu(self.expand3x3(s))], dim=1)


def _torch_net(net):
    """The torchvision .features stacks, rebuilt in plain torch.nn, plus the
    reference's 1-based tap indices (networks.py:71,83,95)."""
    if net == "vgg":
        layers, cin = [], 3
        for ch, n in [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]:
            for _ in range(n):
                layers += [nn.Conv2d(cin, ch, 3, padding=1), nn.ReLU()]
                cin = ch
            layers.append(nn.MaxPool2d(2, 2))
        return nn.Sequential(*layers[:-1]), [4, 9, 16, 23, 30]
    if net == "alex":
        return nn.Sequential(
            nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(3, 2)), [2, 5, 8, 10, 12]
    if net == "squeeze":
        return nn.Sequential(
            nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(64, 16, 64), Fire(128, 16, 64),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(128, 32, 128), Fire(256, 32, 128),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(256, 48, 192), Fire(384, 48, 192),
            Fire(384, 64, 256), Fire(512, 64, 256)), \
            [2, 5, 8, 10, 11, 12, 13]
    raise ValueError(net)


def _rand_weights(features, seed):
    """Re-seed the torch net with bounded random weights (default inits can
    overflow f32 through 13 conv layers) and export to the npz naming."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in features.parameters():
            p.copy_(0.3 * torch.randn(p.shape, generator=g))
    return L.export_torch_features(features.named_parameters())


def _torch_taps(features, taps_1based, x_nchw):
    """Reference BaseNet.forward (networks.py:53-63): z-score then collect
    raw activations at the 1-based tap indices."""
    mean = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    std = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]
    x = (x_nchw - mean) / std
    out = []
    with torch.no_grad():
        for i, layer in enumerate(features, 1):
            x = layer(x)
            if i in taps_1based:
                out.append(x)
            if len(out) == len(taps_1based):
                break  # networks.py:61-62 stops after the last tap
    return out


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_features_match_torchvision(net):
    features, taps = _torch_net(net)
    params = {k: jnp.asarray(v) for k, v in
              _rand_weights(features, seed=hash(net) % 1000).items()}
    rng = np.random.default_rng(0)
    # 65x67: odd sizes exercise the ceil-mode pool padding
    img = rng.uniform(-1, 1, (1, 65, 67, 3)).astype(np.float32)
    got = L._FEATURE_FNS[net](params, jnp.asarray(img))
    want = _torch_taps(features, taps,
                       torch.from_numpy(img.transpose(0, 3, 1, 2)))
    assert len(got) == len(want) == len(L.NET_CHANNELS[net])
    for i, (g, w) in enumerate(zip(got, want)):
        w = w.numpy().transpose(0, 2, 3, 1)
        assert g.shape == w.shape, f"tap {i}: {g.shape} vs {w.shape}"
        assert g.shape[-1] == L.NET_CHANNELS[net][i]
        scale = np.abs(w).max() + 1e-6
        np.testing.assert_allclose(np.asarray(g) / scale, w / scale,
                                   atol=2e-5, err_msg=f"tap {i}")


@pytest.mark.parametrize("net", ["alex", "squeeze"])
def test_full_distance_matches_reference_formula(net):
    """End-to-end: unit-normalize + 1x1 heads + spatial mean + layer sum
    (modules/lpips.py:31-36, modules/utils.py normalize_activation)."""
    features, taps = _torch_net(net)
    params = _rand_weights(features, seed=11)
    rng = np.random.default_rng(5)
    chans = L.NET_CHANNELS[net]
    for i, c in enumerate(chans):
        params[f"lin{i}_w"] = np.abs(
            rng.normal(size=c).astype(np.float32))
    img1 = rng.uniform(0, 1, (65, 73, 3)).astype(np.float32)
    img2 = np.clip(img1 + 0.1 * rng.normal(size=img1.shape), 0, 1
                   ).astype(np.float32)
    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    got = float(L.lpips_from_params(jparams, jnp.asarray(img1),
                                    jnp.asarray(img2), net=net))

    def torch_lpips(a, b):
        ta = torch.from_numpy((a * 2 - 1).transpose(2, 0, 1))[None]
        tb = torch.from_numpy((b * 2 - 1).transpose(2, 0, 1))[None]
        fa = _torch_taps(features, taps, ta)
        fb = _torch_taps(features, taps, tb)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            def unit(t):
                return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
            d = (unit(x) - unit(y)).pow(2)
            w = torch.from_numpy(params[f"lin{i}_w"])[None, :, None, None]
            total = total + (d * w).sum(1).mean()
        return float(total)

    want = torch_lpips(img1, img2)
    assert got == pytest.approx(want, rel=2e-4), (got, want)


def test_missing_heads_raise(tmp_path, monkeypatch):
    """A weights file without true linear heads must be refused (never a
    not-quite-LPIPS number) and unknown nets rejected."""
    p = tmp_path / "bad.npz"
    np.savez(p, conv0_w=np.zeros((64, 3, 3, 3), np.float32))
    monkeypatch.setenv("LPIPS_WEIGHTS_NPZ", str(p))
    L._load_weights.cache_clear()
    with pytest.raises(L.LPIPSUnavailable, match="linear heads"):
        L._load_weights("alex")
    L._load_weights.cache_clear()
    with pytest.raises(ValueError, match="unknown LPIPS net"):
        L._load_weights("resnet")
