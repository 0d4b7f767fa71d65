"""Measure the P-sharded trainer's densification round trip at cap 1M
(round-3 verdict ask #9).

The pshard trainer densifies host-paced every densification_interval: it
re-syncs a full GaussianState from the sharded param dict, runs the jitted
densify (relocation + growth), and the params reshard on the next step
(train/train_static.py:274-282). This script times the pieces on real
hardware at cap 1M:

1. densify_step itself (jit, full-capacity state);
2. params() re-sync + state rebuild (device-side, no host copy);
3. the worst-case interpretation — a full host round trip of the 1M-row
   param dict (device_get + device_put), which an implementation would pay
   only if it staged densification through the host (ours does not);

and reports each amortized over the 100-iteration densification interval.
Multi-chip collectives cannot be measured on this 1-chip host; the
resharding itself is XLA's all-gather/slice pair whose traffic equals one
param-dict sweep (~236 MB at 1M rows) over ICI at >100 GB/s — bounded by
~2.4 ms/interval, noted in RESULTS.md.

Run on the TPU host:  python scripts/pshard_densify_cost.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.model import gaussians, optim
    from gsplat_tpu.train import step as step_lib

    p = 200_000 if jax.default_backend() == "cpu" else 1_000_000
    rng = np.random.default_rng(0)
    state = gaussians.create_from_points(
        rng.uniform(-1, 1, (p, 3)).astype(np.float32),
        rng.uniform(0, 1, (p, 3)).astype(np.float32),
        capacity=p, max_sh_degree=3)
    adam = optim.init(state.params())
    densify = step_lib.make_densify_step(p)

    def t(fn, n=5, warm=1):
        nonlocal state, adam
        for _ in range(warm):
            out = fn()
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        jax.block_until_ready(out)
        return (time.time() - t0) / n * 1000.0

    # 1. the jitted densify (relocation sampling + clone + moment zeroing).
    #    densify donates BOTH state and adam — copy both per call so the
    #    measurement can repeat (the trainer's donated call is cheaper).
    def run_densify():
        return densify(jax.tree.map(jnp.copy, state),
                       jax.tree.map(jnp.copy, adam),
                       jax.random.PRNGKey(0))

    ms_densify = t(run_densify, n=5)

    # 2. params() resync + state rebuild (what the trainer actually does
    #    around the densify: state.replace_params(ps_params) + .params())
    def resync():
        ps = state.params()
        st = state.replace_params(ps)
        return st.xyz

    ms_resync = t(resync, n=20)

    # 3. worst case: full host round trip of the param dict
    def host_roundtrip():
        host = jax.device_get(state.params())
        dev = jax.device_put(host)
        return dev["xyz"]

    ms_host = t(host_roundtrip, n=3)

    nbytes = sum(np.prod(v.shape) * 4 for v in state.params().values())
    print(f"cap {p}: param dict {nbytes / 1e6:.0f} MB")
    print(f"densify_step:        {ms_densify:8.1f} ms "
          f"({ms_densify / 100:.2f} ms/it amortized over the interval)")
    print(f"device resync:       {ms_resync:8.1f} ms "
          f"({ms_resync / 100:.3f} ms/it)")
    print(f"host round trip:     {ms_host:8.1f} ms "
          f"({ms_host / 100:.2f} ms/it) — worst case, not on our path")


if __name__ == "__main__":
    main()
