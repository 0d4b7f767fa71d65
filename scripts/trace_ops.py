"""Op-level device-trace breakdown: capture a jax.profiler trace of a
callable and print per-op device time, sorted.

Usage (as a library from other profiling scripts):

    from scripts.trace_ops import trace_op_breakdown
    trace_op_breakdown(lambda: fn(args), n=10)

Parses the XSpace protobuf directly (tensorflow.tsl xplane_pb2 — the
tensorboard profile plugin bundled here is ABI-incompatible with this TF).
Device planes are named '/device:TPU:0' (or TPU non-zero); we aggregate
XEvent durations per line (each line = one TPU core stream) by event name,
merging XLA-fusion name suffixes so repeated executions accumulate.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import tempfile


def _load_xspace(logdir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


_STRIP = re.compile(r"\.\d+$")


def device_op_times(logdir: str):
    """{op_name: total_device_us} summed over TPU device planes."""
    xs = _load_xspace(logdir)
    totals = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name or "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # XLA Ops / XLA Modules lines both exist; use "XLA Ops"
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                name = _STRIP.sub("", ev_meta.get(ev.metadata_id, "?"))
                totals[name] += ev.duration_ps / 1e6  # ps -> us
    return totals


def trace_op_breakdown(fn, n: int = 10, top: int = 30, logdir=None):
    import jax

    out = fn()
    jax.block_until_ready(out)
    d = logdir or tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(d)
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    totals = device_op_times(d)
    per_call = {k: v / n for k, v in totals.items()}
    tot = sum(per_call.values())
    print(f"  device total {tot / 1000:.2f} ms/call over {n} calls")
    for name, us in sorted(per_call.items(), key=lambda kv: -kv[1])[:top]:
        print(f"   {us / 1000:9.3f} ms  {us / tot * 100:5.1f}%  {name[:90]}")
    return per_call


if __name__ == "__main__":
    import sys

    print(sorted(device_op_times(sys.argv[1]).items(),
                 key=lambda kv: -kv[1])[:30])
