"""Can the MXU take int4 weight operands directly?

If dot_general(s8 x, s4 codes) compiles, the u4->s8 cast (the last
~7 us/call of VPU excess over the DMA floor in exp12) disappears: pack
(code - 8) as signed nibbles, bitcast the u8 row-pair tile to int4 in
register, and shift the zero point by 8 at pack time (z' = z - 8).

Variants on the 7B wqkv shape (KB=2048, NT=6144):
  s4dot : dot(s8, s4) directly
  s4s8  : bitcast int4 -> astype(int8) -> dot (cast granularity probe)
  u4s8  : current path (baseline)
"""
import functools
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N, gs = 4096, 12288, 128
KB, NT = 2048, 6144
GB = KB // gs
B = 8
ITERS = 50


def pack_s4_rows(codes_signed):
    """(K, N) int codes in [-8, 7] -> (K//2, N) uint8 row pairs, low
    nibble = even row (matches pack_u4_rows' interleave)."""
    lo = (codes_signed[0::2] & 0xF).astype(np.uint32)
    hi = (codes_signed[1::2] & 0xF).astype(np.uint32)
    return jnp.asarray((lo | (hi << 4)).astype(np.uint8))


def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, variant):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[:, pl.ds(k * KB, KB)]
    s_blk = s_ref[...]
    z_blk = z_ref[...]
    if variant == "s4dot":
        codes = pltpu.bitcast(w_ref[...], jnp.int4)
    elif variant == "s4s8":
        codes = pltpu.bitcast(w_ref[...], jnp.int4).astype(jnp.int8)
    else:
        codes = pltpu.bitcast(w_ref[...], jnp.uint4).astype(jnp.int8)
    acc = None
    for g in range(GB):
        xg = xb[:, g * gs:(g + 1) * gs]
        cg = codes[g * gs:(g + 1) * gs, :]
        dot_g = jax.lax.dot_general(
            xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1,
                       keepdims=True).astype(jnp.float32)
        sg = s_blk[g, :][None, :]
        zg = z_blk[g, :][None, :]
        contrib = (dot_g - xsum * zg) * sg
        acc = contrib if acc is None else acc + contrib
    acc_ref[...] += acc
    o_ref[...] = acc_ref[...]


def build(variant):
    grid = (N // NT, K // KB)
    return pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, K), lambda n, k: (0, 0)),
            pl.BlockSpec((KB // 2, NT), lambda n, k: (k, n)),
            pl.BlockSpec((GB, NT), lambda n, k: (k, n)),
            pl.BlockSpec((GB, NT), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((B, NT), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, NT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def dev_us(trace_dir):
    paths = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    tot, cnt = 0.0, 0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and (
                "closed_call" in e.get("name", "")):
            tot += e["dur"]
            cnt += 1
    return tot / max(cnt, 1)


rng = np.random.default_rng(0)
u4codes = rng.integers(0, 16, (K, N), dtype=np.int32)
s = jax.random.uniform(jax.random.PRNGKey(1), (K // gs, N), jnp.float32,
                       0.001, 0.01)
z_u = jnp.full((K // gs, N), 8.0, jnp.float32)
x = jnp.asarray(rng.integers(-127, 128, (B, K)), jnp.int8)

# u8 pack of unsigned codes (current layout)
lo = (u4codes[0::2] & 0xF).astype(np.uint32)
hi = (u4codes[1::2] & 0xF).astype(np.uint32)
w_u4 = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
# s4 pack of shifted codes
w_s4 = pack_s4_rows(u4codes - 8)
z_s = z_u - 8.0

cases = [
    ("u4s8", w_u4, z_u),
    ("s4s8", w_s4, z_s),
    ("s4dot", w_s4, z_s),
]
ref = None
for variant, w, z in cases:
    try:
        f = jax.jit(build(variant))
        out = jax.block_until_ready(f(x, w, s, z))
    except Exception as e:
        print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        continue
    if ref is None:
        ref = out
    else:
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{variant} max|diff| vs u4s8: {err:.3e}", flush=True)

    @jax.jit
    def loop(x, w, s, z, f=f):
        def body(c, _):
            return c, f(x, w, s, z).sum()
        _, ys = jax.lax.scan(body, 0, None, length=ITERS)
        return ys

    jax.block_until_ready(loop(x, w, s, z))
    td = f"/tmp/exp13_{variant}"
    with jax.profiler.trace(td):
        jax.block_until_ready(loop(x, w, s, z))
    print(f"{variant}: {dev_us(td):7.2f} us/call (floor ~38, u4 ~45.4)",
          flush=True)
