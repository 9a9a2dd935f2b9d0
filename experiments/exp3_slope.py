"""Sustained per-iteration cost via two-point slope (device jit time at
20 vs 60 iters) — per-event durations under-report when weight DMA of
call N+1 overlaps call N's compute (exp2 showed s8 90MB "53us" < DMA
floor 103us)."""
import sys
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
from triage import device_seconds
from exp2_u4kernel import u4_matmul, s8_matmul, K, N, GS, B, G
from sparsebit_tpu.ops.packing import pack_columns
from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_a8

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
codes = jax.random.randint(k1, (K, N), 0, 16, jnp.int32)
scales = jax.random.uniform(k2, (G, N), jnp.float32, 0.001, 0.01)
zeros = jnp.full((G, N), 8.0, jnp.float32)
x8 = jax.random.randint(k1, (B, K), -127, 127, jnp.int8)
s3 = scales.reshape(G, 1, N)
z3 = zeros.reshape(G, 1, N)
packed = pack_columns(codes, 4)["w"]


def scan_over(fn_make_w, kernel, iters):
    @jax.jit
    def run(cp, x8, s3, z3):
        w = fn_make_w(cp)

        def body(c, _):
            bump = (c[0] > 1e30).astype(jnp.int8)
            o = kernel(x8 + bump, w, s3, z3)
            return c + o[0, :8], None

        acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), None,
                              length=iters)
        return acc

    return run


def slope(tag, fn_make_w, kernel, arg):
    ts = {}
    for iters in (20, 60):
        run = scan_over(fn_make_w, kernel, iters)
        out = run(arg, x8, s3, z3)
        jax.block_until_ready(out)
        td = "/tmp/exp3_{}_{}".format(tag, iters)
        with jax.profiler.trace(td):
            out = run(arg, x8, s3, z3)
            jax.block_until_ready(out)
        ts[iters] = device_seconds(td, "jit_")
    per = (ts[60] - ts[20]) / 40 * 1e6
    print("{:24s} per-iter {:8.1f} us  (jit20={:.1f}us jit60={:.1f}us)".format(
        tag, per, ts[20] * 1e6, ts[60] * 1e6), flush=True)


slope("A_u8", lambda p: p,
      lambda x, w, s, z: _quant_matmul_pallas_a8(x, w, scales, zeros, 4, GS, N),
      packed)
slope("B_u4", lambda c: c.astype(jnp.uint4), u4_matmul, codes)
slope("D_s8", lambda c: (c - 8).astype(jnp.int8),
      lambda x, w, s, z: s8_matmul(x, w, s, z - 8.0), codes)
