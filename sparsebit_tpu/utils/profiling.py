"""Profiling helpers (SURVEY §5: reference has no runtime profiler; on TPU
the native story is jax.profiler traces viewed in XProf/TensorBoard)."""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/sparsebit_tpu_trace"):
    """Capture a device trace: `with trace(dir): run_workload()` then
    inspect with TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label="block", sync=None):
    """Wall-clock a region; pass an array (or pytree) factory via ``sync``
    to block on async dispatch before stopping the clock."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync is not None:
            jax.block_until_ready(sync() if callable(sync) else sync)
        box["seconds"] = time.perf_counter() - t0
        print("[{}] {:.3f} ms".format(label, box["seconds"] * 1e3))
