"""Failure snapshot dumps — the reference's field-debugging tool.

The reference rasterizer, in debug mode, pickles its kernel input tensors
to ``snapshot_fw.dump``/``snapshot_bw.dump`` when a CUDA kernel raises, so
users can attach a reproducer to bug reports
(diff_gaussian_rasterization/__init__.py:83-90,132-139). Under XLA there
is no per-kernel exception to catch mid-jit: numerical failure surfaces as
a non-finite loss at the next host fetch (and ``--detect_anomaly`` maps to
jax_debug_nans for op-level localization). The analogue implemented here:
the training loops check the fetched loss every 10 iterations and, on the
first non-finite value, dump the full optimization state (model params,
Adam moments, camera, iteration, PRNG key) to ``snapshot_fw.dump`` in the
model directory before aborting — a self-contained reproducer for the
failing step.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def dump_snapshot(model_path: str, name: str = "snapshot_fw.dump",
                  **pytrees) -> str:
    """Pickle host copies of the given pytrees (device arrays -> numpy).

    Returns the snapshot path. Mirrors the reference's pickled tensor-list
    dump; keys are preserved so the reproducer is self-describing.
    """
    host = {
        k: jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "dtype") else x, v)
        for k, v in pytrees.items()
    }
    os.makedirs(model_path or ".", exist_ok=True)
    path = os.path.join(model_path or ".", name)
    with open(path, "wb") as f:
        pickle.dump(host, f)
    return path


def check_finite_loss(loss: float, iteration: int, model_path: str,
                      **pytrees) -> None:
    """Abort loudly on a non-finite loss, dumping a reproducer snapshot.

    The reference's message asks the user to forward the snapshot
    (diff_gaussian_rasterization/__init__.py:87-89); same contract here.
    """
    if np.isfinite(loss):
        return
    path = dump_snapshot(model_path, iteration=iteration, loss=loss,
                         **pytrees)
    raise RuntimeError(
        f"non-finite loss ({loss}) at iteration {iteration}; training "
        f"state snapshot dumped to {path} — rerun with --detect_anomaly "
        f"to localize the op, and please forward the snapshot in bug "
        f"reports")
