"""RNG-schedule replay for trainer exec-parity (round-4 verdict ask #1).

tests/run_reference_trainer.py --record_rng records the reference
train_static loop's complete stochastic schedule while it runs through the
extension shims: per-iteration camera pick (train_static.py:74-79), the
raw standard-normal noise tensor (:138), and per-densification-call dead
masks + multinomial template draws (gaussian_model_static.py:412-492).

``gsplat_tpu.train.train_static --replay_rng <file>`` replays that schedule
verbatim — same camera order, same relocation/growth templates, same noise
— so the two training loops differ ONLY by float sources (kernel identical;
loss/Adam/schedule arithmetic in torch vs XLA). Any loss-trajectory or
final-PSNR divergence beyond float noise is a trainer-semantics bug.
"""

from __future__ import annotations

import numpy as np


class ReplaySchedule:
    def __init__(self, path: str, capacity: int):
        z = np.load(path, allow_pickle=False)
        self.capacity = capacity
        self.camera_names = [str(s) for s in z["camera_names"]]
        self.iterations = len(self.camera_names)
        self._z = z
        self._densify = {}
        j = 0
        while f"densify_iter_{j}" in z:
            self._densify[int(z[f"densify_iter_{j}"])] = j
            j += 1
        # diagnostics accumulated during the run (written to parity json)
        self.diagnostics: list[dict] = []

    # -- per-iteration camera ------------------------------------------------
    def camera_name(self, iteration: int) -> str:
        return self.camera_names[iteration - 1]

    # -- per-iteration raw noise --------------------------------------------
    def noise(self, iteration: int, dtype=np.float32) -> np.ndarray:
        """[capacity, 3] raw standard normal for this iteration; zeros when
        the reference skipped it (final iteration, train_static.py:131)."""
        key = f"noise_{iteration:05d}"
        out = np.zeros((self.capacity, 3), dtype)
        if key in self._z:
            n = self._z[key]
            out[: len(n)] = n
        return out

    # -- densification draws -------------------------------------------------
    def has_densify(self, iteration: int) -> bool:
        return iteration in self._densify

    def densify_arrays(self, iteration: int, state=None):
        """(dead_mask[C], reloc_t[C], add_t[C], target) for the recorded
        densification at ``iteration``; templates are full per-row maps with
        identity at unused rows (mcmc._relocate_with/_add_with contract).

        When ``state`` is given, records agreement diagnostics between the
        replayed schedule and the live state (dead-mask hamming distance,
        alive-count mismatch) — the drift meter for the parity report."""
        j = self._densify[iteration]
        z = self._z
        c = self.capacity
        dead_rec = z[f"dead_{j}"]
        dead = np.zeros(c, bool)
        dead[: len(dead_rec)] = dead_rec
        reloc_t = np.arange(c, dtype=np.int32)
        rt = z[f"reloc_t_{j}"]
        if len(rt):
            dead_rows = np.nonzero(dead)[0]
            assert len(dead_rows) == len(rt), (
                f"densify@{iteration}: {len(dead_rows)} dead rows vs "
                f"{len(rt)} recorded relocation templates")
            reloc_t[dead_rows] = rt
        p_before = int(z[f"add_p_{j}"])
        at = z[f"add_t_{j}"]
        target = p_before + len(at)
        add_t = np.arange(c, dtype=np.int32)
        if len(at):
            add_t[p_before:target] = at

        if state is not None:
            ours_dead = (np.asarray(state.alive_mask)
                         & (np.asarray(state.get_opacity())[:, 0] <= 0.005))
            self.diagnostics.append({
                "iteration": iteration,
                "dead_recorded": int(dead.sum()),
                "dead_ours": int(ours_dead.sum()),
                "dead_hamming": int((dead != ours_dead).sum()),
                "p_recorded": p_before,
                "p_ours": int(state.n_alive),
                "grown": len(at),
            })
        return dead, reloc_t, add_t, target
