"""lm_head matvec: XLA dot vs ops/matvec Pallas streamer (7B shape).

(1..8, 4096) bf16 @ (4096, 32000) bf16 -> f32. 262 MB/call; v5e ideal
~320 us. Round-2 profile put XLA at ~90% — measure both.
"""
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.ops.matvec import bf16_matvec

K, N, B = 4096, 32000, 1
ITERS = 50

w = (jax.random.normal(jax.random.PRNGKey(0), (K, N)) * 0.02).astype(
    jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(1), (B, K), jnp.float32)


def dev_us(trace_dir, match):
    """Longest 'jit_loop' device event / ITERS — whole-scan timing, no
    per-kernel event-name guessing."""
    paths = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    best = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and (
                e.get("name", "").startswith("jit_loop")):
            best = max(best, e["dur"])
    return best / ITERS, 1


def xla_dot(x, w):
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


for name, fn, match in (
    ("xla", xla_dot, "fusion"),
    ("pallas", bf16_matvec, "closed_call"),
):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(x, w))
    if name == "xla":
        ref = out
    else:
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"pallas max|diff| vs xla: {err:.3e}")

    @jax.jit
    def loop(x, w, f=f):
        # carry the activation through each call so LICM can't hoist
        # the dot out of the scan (feed back a tiny slice of logits)
        def body(c, _):
            y = f(c, w)
            return c + y[:, :K].astype(c.dtype) * 1e-30, ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c

    jax.block_until_ready(loop(x, w))
    td = f"/tmp/exp14_{name}"
    with jax.profiler.trace(td):
        jax.block_until_ready(loop(x, w))
    us, cnt = dev_us(td, match)
    print(f"{name}: {us:8.2f} us/call ({cnt} events; ideal ~320)",
          flush=True)
