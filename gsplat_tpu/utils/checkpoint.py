"""Training-context checkpointing (capture/restore).

The analogue of torch.save((gaussians.capture(), iteration)) ->
chkpnt{iter}.pth (reference train_static.py:142-144,
gaussian_model_static.py:84-124): the full pytree (Gaussian params, Adam
moments, step count, alive count) plus scalars, stored as a single .npz —
host-portable, no pickle of code objects.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.model import optim
from gsplat_tpu.model.gaussians import GaussianState


def save_pytree(path: str, tree, meta: Dict[str, Any] | None = None) -> None:
    """Generic pytree checkpoint: leaves stored by tree-path key. Loading
    requires a template pytree with the same structure (shapes may differ
    only in values)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, __meta__=json.dumps(meta or {}), **arrays)


def load_pytree(path: str, template):
    """Returns (tree_like_template, meta)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [jnp.asarray(z[jax.tree_util.keystr(k)]) for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def save(path: str, state: GaussianState, adam: optim.AdamState,
         iteration: int, extra: Dict[str, Any] | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for name in ["xyz", "features_dc", "features_rest", "scaling", "rotation",
                 "opacity"]:
        arrays[f"state/{name}"] = np.asarray(getattr(state, name))
    arrays["state/n_alive"] = np.asarray(state.n_alive)
    for group, leaf in adam.mu.items():
        arrays[f"adam/mu/{group}"] = np.asarray(leaf)
    for group, leaf in adam.nu.items():
        arrays[f"adam/nu/{group}"] = np.asarray(leaf)
    arrays["adam/count"] = np.asarray(adam.count)
    meta = {"iteration": iteration, "max_sh_degree": state.max_sh_degree,
            "extra": extra or {}}
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load(path: str):
    """Returns (GaussianState, AdamState, iteration, extra)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__meta__"]))
    state = GaussianState(
        xyz=jnp.asarray(z["state/xyz"]),
        features_dc=jnp.asarray(z["state/features_dc"]),
        features_rest=jnp.asarray(z["state/features_rest"]),
        scaling=jnp.asarray(z["state/scaling"]),
        rotation=jnp.asarray(z["state/rotation"]),
        opacity=jnp.asarray(z["state/opacity"]),
        n_alive=jnp.asarray(z["state/n_alive"]),
        max_sh_degree=int(meta["max_sh_degree"]),
    )
    groups = sorted({k.split("/")[-1] for k in z.files
                     if k.startswith("adam/mu/")})
    adam = optim.AdamState(
        mu={g: jnp.asarray(z[f"adam/mu/{g}"]) for g in groups},
        nu={g: jnp.asarray(z[f"adam/nu/{g}"]) for g in groups},
        count=jnp.asarray(z["adam/count"]))
    return state, adam, int(meta["iteration"]), meta["extra"]
