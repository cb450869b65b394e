"""Trustworthy TPU timing through the axon tunnel: profile-based device times.

Host-side perf_counter timings over the tunnel are unreliable (async dispatch
+ variable fence latency). This helper runs a jitted fn N times under
jax.profiler.trace and reports per-execution DEVICE time from the xplane
module events, plus the top ops.

Usage:
    from scripts.devtime import device_time
    dt_ms, top = device_time(fn, args, iters=4)
"""

import glob
import os
import shutil
import tempfile

import jax


def _parse(trace_dir, top_n=25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa

    f = sorted(glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"),
                         recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())
    module_events = []
    op_tot = {}
    for p in xs.planes:
        if p.name != "/device:TPU:0":
            continue
        for line in p.lines:
            if line.name == "XLA Modules":
                module_events = [e.duration_ps / 1e9 for e in line.events]
            if line.name == "XLA Ops":
                for e in line.events:
                    name = p.event_metadata[e.metadata_id].name
                    op_tot[name] = op_tot.get(name, 0.0) + e.duration_ps / 1e9
    top = sorted(op_tot.items(), key=lambda kv: -kv[1])[:top_n]
    return module_events, top


def device_time(fn, args, iters=4, top_n=25, verbose=True):
    """Returns (mean ms/exec from module events, [(op, total_ms), ...])."""
    jitted = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = jitted(*args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="devtime")
    try:
        with jax.profiler.trace(d):
            for _ in range(iters):
                out = jitted(*args)
            jax.block_until_ready(out)
        modules, top = _parse(d, top_n)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    n = max(len(modules), 1)
    mean_ms = sum(modules) / n if modules else float("nan")
    if verbose:
        print(f"device: {mean_ms:9.3f} ms/exec over {n} recorded execs")
        for name, ms in top:
            print(f"  {ms / n:9.3f} ms  {name[:100]}")
    return mean_ms, top
