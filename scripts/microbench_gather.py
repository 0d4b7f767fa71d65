"""Gather-floor microbench at the 1M-cap gate scale.

Round-2 measured the slot-feature gather at ~2 ns/index for 100k-row
source tables but 21-25 ns/index for randomly-permuted rows from the
>36 MB tables the 1M-cap config builds, and found dtype did NOT matter at
the SMALL scale. This sweeps (table rows, row width, dtype, index order)
to locate the cliff and test whether narrower rows / bf16 move the floor
at the LARGE scale (where the table no longer fits on-chip). Run manually:

    python scripts/microbench_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000.0


def main():
    rng = np.random.default_rng(0)
    k = 1_200_000  # slot count at the 1M-cap config
    for rows in (100_000, 1_000_000):
        for width, dtype in ((9, jnp.float32), (9, jnp.bfloat16),
                             (4, jnp.float32), (2, jnp.float32),
                             (1, jnp.float32)):
            src = jnp.asarray(rng.uniform(size=(rows, width)),
                              dtype=dtype)
            mb = rows * width * src.dtype.itemsize / 1e6
            for order in ("rand", "sorted"):
                idx = rng.integers(0, rows, size=k).astype(np.int32)
                if order == "sorted":
                    idx = np.sort(idx)
                idxj = jnp.asarray(idx)
                f = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
                ms = timeit(f, src, idxj)
                print(f"rows={rows:>9} w={width} {src.dtype.name:>8} "
                      f"{mb:7.1f} MB {order:>6}: {ms:7.3f} ms "
                      f"({ms * 1e6 / k:5.1f} ns/idx)", flush=True)


if __name__ == "__main__":
    main()
