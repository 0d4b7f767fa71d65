"""Gather-floor microbench at the 1M-cap gate scale.

The 1M-cap trace shows row gathers costing ~6.5 ns/index at P=1M tables
(36 MB) where 100k-row tables measured ~2 ns. This sweeps (table rows,
row width, dtype) to locate the cliff and test whether narrower rows
move the floor at the LARGE scale.

Measurement note: single-dispatch wall timings under the axon tunnel are
unreliable (a 43 MB gather "measured" 12 us); each config therefore runs
REPS chained gathers inside ONE jit (index perturbation defeats CSE, a
full reduction defeats DCE) and is timed at that granularity, which
matches device traces for the train step. Run manually:

    python scripts/microbench_gather.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20


@functools.partial(jax.jit, static_argnums=())
def _chain(src, idx):
    def body(i, acc):
        y = jnp.take(src, jnp.bitwise_xor(idx, i), axis=0)
        return acc + jnp.sum(y.astype(jnp.float32))
    return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))


def main():
    rng = np.random.default_rng(0)
    k = 1_200_000  # slot count at the 1M-cap config
    for rows in (100_000, 1_000_000):
        for width, dtype in ((9, jnp.float32), (9, jnp.bfloat16),
                             (4, jnp.float32), (1, jnp.float32)):
            src = jnp.asarray(rng.uniform(size=(rows, width)), dtype=dtype)
            mb = rows * width * src.dtype.itemsize / 1e6
            # xor-perturbed indices stay in range for pow2-1 masks; clamp
            idx = rng.integers(0, max(rows - REPS, 1), size=k
                               ).astype(np.int32)
            idxj = jnp.asarray(idx)
            out = _chain(src, idxj)
            jax.block_until_ready(out)
            t0 = time.time()
            n = 3
            for _ in range(n):
                out = _chain(src, idxj)
            jax.block_until_ready(out)
            ms = (time.time() - t0) / (n * REPS) * 1000.0
            print(f"rows={rows:>9} w={width} {src.dtype.name:>8} "
                  f"{mb:7.1f} MB: {ms:7.3f} ms ({ms * 1e6 / k:5.1f} ns/idx)",
                  flush=True)


if __name__ == "__main__":
    main()
