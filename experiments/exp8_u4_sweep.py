"""Tile-shape sweep for the u4 W4A8 kernel at the 7B w13 shape.

All decode kernels sit at ~65-75% of DMA roofline; per-grid-step overhead
(~1 us) x step count is the suspected tax. Sweep (K_BLK, NT) incl. big
tiles under a raised vmem limit; measure device time via profiler trace
(wall clock lies on this tunnel)."""
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_u4

K, N, gs = 4096, 22016, 128
ITERS = 50
IDEAL_US = (K * N // 2) / 819e3  # bytes / (GB/s) -> us

key = jax.random.PRNGKey(0)
codes = jax.random.randint(key, (K, N), 0, 16, jnp.int32)
scales = jnp.full((K // gs, N), 0.01, jnp.float32)
zeros = jnp.full((K // gs, N), 8.0, jnp.float32)
x8 = jax.random.randint(jax.random.PRNGKey(1), (8, K), -127, 127, jnp.int8)

CONFIGS = [
    (128, 22016, None),          # current heuristic
    (256, 22016, 64 << 20),
    (512, 22016, 100 << 20),
    (256, 11008, 64 << 20),
    (512, 11008, 64 << 20),
    (1024, 11008, 100 << 20),
    (512, 5504, None),
    (2048, 5504, 100 << 20),
]


def run(kb, nt, vl):
    @jax.jit
    def f():
        w4 = codes.astype(jnp.uint4)

        def body(c, _):
            o = _quant_matmul_pallas_u4(
                x8, w4, scales, zeros, gs, N, k_blk=kb, nt=nt,
                vmem_limit=vl,
            )
            return c + o[0, :8], None

        acc, _ = jax.lax.scan(body, jnp.zeros((8,)), None, length=ITERS)
        return acc

    jax.block_until_ready(f())  # compile
    trace_dir = f"/tmp/exp8_{kb}_{nt}"
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(f())
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    total = 0.0
    count = 0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and "closed_call" in e.get("name", ""):
            total += e["dur"]
            count += 1
    per_call = total / max(count, 1)
    print(f"KB={kb:5d} NT={nt:6d}: {per_call:7.1f} us/call "
          f"({IDEAL_US/per_call*100:5.1f}% of roofline, {count} calls)",
          flush=True)


for kb, nt, vl in CONFIGS:
    try:
        run(kb, nt, vl)
    except Exception as e:
        print(f"KB={kb} NT={nt}: FAILED {str(e)[:120]}", flush=True)
