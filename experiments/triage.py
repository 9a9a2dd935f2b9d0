"""Trace-based device timing helpers for TPU experiments (axon tunnel).

Wall-clock lies here (the tunnel stalls between scan iterations, see
docs/perf_notes.md "Measurement rules"); only jax.profiler device events
are trustworthy. Pattern: run the workload as a lax.scan inside ONE jit,
trace it, and report device-duration of the top-level jit event / iters.
"""

import glob
import gzip
import json
import time

import jax


def device_seconds(trace_dir, event_prefix):
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    best = 0.0
    for e in data.get("traceEvents", []):
        if (
            e.get("ph") == "X"
            and e.get("name", "").startswith(event_prefix)
            and "dur" in e
        ):
            best = max(best, e["dur"] * 1e-6)
    return best or None


def kernel_events(trace_dir, min_us=3.0):
    """All device events >= min_us from the latest trace, name -> [durs_us]."""
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    out = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e["dur"] >= min_us:
            out.setdefault(e["name"], []).append(e["dur"])
    return out


def timed(tag, fn, *args, iters=20, trace_dir_base="/tmp/exp_trace"):
    """fn must be a jitted function running its loop internally (lax.scan).
    Returns device seconds per iteration."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    trace_dir = "{}_{}".format(trace_dir_base, tag.replace(" ", "_"))
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    dev = device_seconds(trace_dir, "jit_")
    per_iter = dev / iters if dev else None
    print(
        "{:40s} compile {:7.1f}s  device/iter {}".format(
            tag,
            compile_s,
            "{:9.1f} us".format(per_iter * 1e6) if per_iter else "n/a",
        ),
        flush=True,
    )
    return per_iter
