"""Trace-based device timing for the axon TPU tunnel.

Wall-clock dispatch timing through the tunnel is unreliable (async dispatch,
RTT ~0.4 s, and some executions appear to be elided for repeated identical
inputs); `jax.profiler.trace` device lanes are ground truth. `device_ms(fn,
*args)` runs `fn` under a trace and returns the mean device-lane duration of
its top-level jit event in milliseconds.
"""

import collections
import glob
import gzip
import json
import os
import tempfile

import jax


def _parse(trace_dir: str):
    path = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            agg[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return agg, cnt


def device_ms(fn, *args, iters: int = 3, match: str = "jit_") -> float:
    """Mean device time (ms) of the top-level jit event of `fn(*args)`."""
    fn = jax.jit(fn)
    r = fn(*args)
    jax.block_until_ready(r)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)
        agg, cnt = _parse(td)
    best = None
    for name, dur in agg.items():
        if name.startswith(match) or name.startswith("jit("):
            if best is None or dur > agg[best]:
                best = name
    if best is None:   # fall back to the longest event
        best = agg.most_common(1)[0][0]
    return agg[best] / 1e3 / max(cnt[best], 1)


def device_breakdown(fn, *args, iters: int = 3, top: int = 20):
    """Print the per-op device-time breakdown of `fn(*args)`."""
    fn = jax.jit(fn)
    r = fn(*args)
    jax.block_until_ready(r)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                r = fn(*args)
            jax.block_until_ready(r)
        agg, cnt = _parse(td)
    for name, dur in agg.most_common(top):
        print(f"{dur / 1e3 / iters:9.2f} ms/call  x{cnt[name] // iters:4d}  "
              f"{name[:84]}")
