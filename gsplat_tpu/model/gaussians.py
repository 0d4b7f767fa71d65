"""Statically-shaped Gaussian parameter state.

TPU-native redesign of the reference's GaussianModel
(scene/gaussian_model_static.py:30-503). Key difference: the reference grows
and shrinks torch tensors and performs optimizer-state surgery
(cat_tensors_to_optimizer :302-326, replace_tensors_to_optimizer :354-392);
under XLA shapes must be static, so we allocate ``capacity`` (= cap_max) rows
up front and track ``n_alive``. Alive rows always occupy the prefix
[0, n_alive): MCMC relocation reuses dead rows in place and ``add_new``
activates rows at the end, so the prefix invariant is maintained without
compaction (see model/mcmc.py).

Activations match the reference (gaussian_model_static.py:32-50):
scaling = exp(raw), opacity = sigmoid(raw), rotation = normalize(raw).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core.quaternion import normalize


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@dataclasses.dataclass(frozen=True)
class GaussianState:
    """All raw (pre-activation) parameters, padded to ``capacity`` rows.

    features_dc: [C, 1, 3]; features_rest: [C, K-1, 3] with
    K = (max_sh_degree+1)^2 — same layout as the reference's _features_dc /
    _features_rest (gaussian_model_static.py:176-177).
    """

    xyz: jnp.ndarray            # [C, 3]
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray        # [C, 3]  log-scale
    rotation: jnp.ndarray       # [C, 4]  (w,x,y,z) unnormalized
    opacity: jnp.ndarray        # [C, 1]  logit
    n_alive: jnp.ndarray        # []      int32
    max_sh_degree: int          # static

    # ---- derived ----
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def alive_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity, dtype=jnp.int32) < self.n_alive

    def get_scaling(self):
        return jnp.exp(self.scaling)

    def get_rotation(self):
        return normalize(self.rotation)

    def get_opacity(self):
        return jax.nn.sigmoid(self.opacity)

    def get_features(self):
        """[C, K, 3] concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0):
        """Packed 6-vector 3D covariance (the reference's covariance
        activation path, gaussian_model_static.py:36-45,148-149) — feeds the
        rasterizer's cov3d_precomp input."""
        from gsplat_tpu.core.covariance import covariance_6

        return covariance_6(self.get_scaling(), self.get_rotation(),
                            scaling_modifier)

    def params(self) -> dict[str, jnp.ndarray]:
        """The trainable leaves, keyed like the reference optimizer groups
        (gaussian_model_static.py:191-198)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.features_dc,
            "f_rest": self.features_rest,
            "opacity": self.opacity,
            "scaling": self.scaling,
            "rotation": self.rotation,
        }

    def replace_params(self, p: dict[str, jnp.ndarray]) -> "GaussianState":
        return dataclasses.replace(
            self, xyz=p["xyz"], features_dc=p["f_dc"], features_rest=p["f_rest"],
            opacity=p["opacity"], scaling=p["scaling"], rotation=p["rotation"])


jax.tree_util.register_dataclass(
    GaussianState,
    data_fields=["xyz", "features_dc", "features_rest", "scaling", "rotation",
                 "opacity", "n_alive"],
    meta_fields=["max_sh_degree"],
)


def _pad(arr: np.ndarray, capacity: int) -> np.ndarray:
    n = arr.shape[0]
    assert n <= capacity, f"init points {n} exceed capacity {capacity}"
    pad = np.zeros((capacity - n,) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def create_from_points(points: np.ndarray, colors: np.ndarray,
                       capacity: int, max_sh_degree: int,
                       mean_sq_dist: np.ndarray | None = None) -> GaussianState:
    """Initialize from a point cloud (reference create_from_pcd,
    gaussian_model_static.py:155-181):

    - DC SH from RGB, higher bands zero
    - log-scale = log(sqrt(clamp(meanSqDist3NN, 1e-7)) * 0.1), isotropic
    - identity quaternion, opacity logit of 0.5
    """
    from gsplat_tpu.model.knn import mean_sq_dist_3nn

    n = points.shape[0]
    k = (max_sh_degree + 1) ** 2
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)

    f_dc = np.asarray(sh_lib.rgb_to_sh(colors)).reshape(n, 1, 3)
    f_rest = np.zeros((n, k - 1, 3), np.float32)

    if mean_sq_dist is None:
        mean_sq_dist = np.asarray(mean_sq_dist_3nn(jnp.asarray(points)))
    dist2 = np.maximum(mean_sq_dist, 1e-7)
    scales = np.log(np.sqrt(dist2) * 0.1)[:, None].repeat(3, axis=1)

    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    opacities = np.full((n, 1), float(inverse_sigmoid(jnp.asarray(0.5))),
                        np.float32)

    return GaussianState(
        xyz=jnp.asarray(_pad(points, capacity)),
        features_dc=jnp.asarray(_pad(f_dc.astype(np.float32), capacity)),
        features_rest=jnp.asarray(_pad(f_rest, capacity)),
        scaling=jnp.asarray(_pad(scales.astype(np.float32), capacity)),
        rotation=jnp.asarray(_pad(rots, capacity)),
        opacity=jnp.asarray(_pad(opacities, capacity)),
        n_alive=jnp.asarray(n, jnp.int32),
        max_sh_degree=max_sh_degree,
    )


def save_ply(state: GaussianState, path: str) -> None:
    """Dump alive rows in the reference PLY layout
    (gaussian_model_static.py:228-249)."""
    from gsplat_tpu.data import ply

    n = int(state.n_alive)
    ply.save_gaussian_ply(
        path,
        np.asarray(state.xyz)[:n],
        np.asarray(state.features_dc)[:n],
        np.asarray(state.features_rest)[:n],
        np.asarray(state.opacity)[:n],
        np.asarray(state.scaling)[:n],
        np.asarray(state.rotation)[:n])


def load_ply(path: str, capacity: int, max_sh_degree: int) -> GaussianState:
    """Load a reference-format gaussian PLY into a padded state
    (gaussian_model_static.py:251-296; sets active SH to max)."""
    from gsplat_tpu.data import ply

    xyz, f_dc, f_rest, opacity, scaling, rotation = ply.load_gaussian_ply(
        path, max_sh_degree)
    n = xyz.shape[0]
    return GaussianState(
        xyz=jnp.asarray(_pad(xyz, capacity)),
        features_dc=jnp.asarray(_pad(f_dc, capacity)),
        features_rest=jnp.asarray(_pad(f_rest, capacity)),
        scaling=jnp.asarray(_pad(scaling, capacity)),
        rotation=jnp.asarray(_pad(rotation, capacity)),
        opacity=jnp.asarray(_pad(opacity, capacity)),
        n_alive=jnp.asarray(n, jnp.int32),
        max_sh_degree=max_sh_degree,
    )


def active_params(state: GaussianState, sh_degree: int):
    """Activated parameter views for the rasterizer."""
    return dict(
        means3d=state.xyz,
        scales=state.get_scaling(),
        quats=state.get_rotation(),
        opacities=state.get_opacity()[:, 0],
        shs=state.get_features(),
        alive=state.alive_mask,
    )
