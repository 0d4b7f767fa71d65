"""Device mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, (
            f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(n_dp: int, n_ps: int, dp_axis: str = "dp",
                 ps_axis: str = "ps") -> Mesh:
    """2-D (camera-batch DP x Gaussian-shard) mesh over n_dp * n_ps devices.

    The ps axis is minor (adjacent device ids) so the heavy P-shard
    collectives (parameter all-gather / gradient psum-scatter, pshard.py)
    ride neighboring-chip ICI links; the dp axis carries only one
    gradient pmean per step."""
    devs = jax.devices()
    need = n_dp * n_ps
    assert len(devs) >= need, f"need {need} devices, have {len(devs)}"
    return Mesh(np.array(devs[:need]).reshape(n_dp, n_ps),
                (dp_axis, ps_axis))
