"""Group-epilogue variants for the W4A8 k-step (7B wqkv shape).

V0 (current): per group g: (dot_g - xsum*z_g) * s_g accumulated
              -> ~5 VPU passes per (B, NT) per group.
V1 (factored): acc1 += dot_g * s_g per group (3 passes incl. i32->f32
              cast), zero-correction ONCE per k-step as an MXU dot:
              xsums (B, GB) @ (s*z) (GB, NT). Algebra:
              sum_g (dot_g - xsum_g z_g) s_g
                = sum_g dot_g s_g - xsums @ (z*s).
V2 (bf16 dot): skip the u4->s8 cast's s8 path; cast codes u4->bf16 and
              dot bf16 x bf16 (f32 accumulate; exact for 4-bit codes and
              |x|<=127, gs<=128). Measures whether the cast target dtype
              changes the VPU legalization cost.

Device time per pallas call from the profiler trace; DMA ideal for the
25 MB wqkv tile stream at 819 GB/s (v5e) is ~30.7 us/call.
"""
import functools
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsebit_tpu.ops.packing import pack_u4_rows
from sparsebit_tpu.ops.quant_matmul import _u4_tile

K, N, gs = 4096, 12288, 128
KB, NT = 2048, 6144  # megakernel wqkv tiles (k1_t=2, n1_t=2)
GB = KB // gs
B = 8
ITERS = 50


def kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, variant):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[:, pl.ds(k * KB, KB)]
    s_blk = s_ref[...]  # (GB, NT) rows for this k-step
    z_blk = z_ref[...]
    if variant == "v2":
        # u4 -> bf16 has no direct Mosaic lowering; go via the s8 cast
        codes = _u4_tile(w_ref[...]).astype(jnp.int8).astype(jnp.bfloat16)
    else:
        codes = _u4_tile(w_ref[...]).astype(jnp.int8)

    if variant == "v3":
        # dots only (no epilogue): per-group int8 dots accumulated in i32
        acc = None
        for g in range(GB):
            xg = xb[:, g * gs:(g + 1) * gs]
            cg = codes[g * gs:(g + 1) * gs, :]
            dot_g = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = dot_g if acc is None else acc + dot_g
        acc_ref[...] += acc.astype(jnp.float32)
        o_ref[...] = acc_ref[...]
        return
    if variant == "v4":
        # cast only: touch every unpacked s8 code group by group (mirrors
        # the loop structure), reduce, no MXU
        acc = None
        for g in range(GB):
            cg = codes[g * gs:(g + 1) * gs, :]
            t = jnp.sum(cg.astype(jnp.int32), axis=0, keepdims=True)
            acc = t if acc is None else acc + t
        acc_ref[...] += acc.astype(jnp.float32)
        o_ref[...] = acc_ref[...]
        return
    if variant == "v5":
        # ONE full-KB dot (WRONG math — perf shape probe): is the
        # group-split dot structure itself the cost?
        dot = jax.lax.dot_general(
            xb, codes, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        acc_ref[...] += dot * s_blk[0, :][None, :]
        o_ref[...] = acc_ref[...]
        return
    if variant == "v6":
        # stream only: no unpack, no dot — DMA floor probe (chunked u8
        # reduce so no full-tile wide temp)
        wb = w_ref[...]
        acc = None
        for g in range(GB // 2):
            cg = wb[g * gs:(g + 1) * gs, :]
            t = jnp.sum(cg.astype(jnp.int32), axis=0, keepdims=True)
            acc = t if acc is None else acc + t
        acc_ref[...] += acc.astype(jnp.float32)
        o_ref[...] = acc_ref[...]
        return
    if variant == "v7":
        # true DMA floor: the BlockSpec still streams the whole tile,
        # compute touches only an (8, NT) slice of the raw u8
        acc_ref[...] += w_ref[0:8, :].astype(jnp.int32).astype(jnp.float32)
        o_ref[...] = acc_ref[...]
        return
    if variant == "v0":
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
    else:
        pref = jnp.float32 if variant == "v2" else jnp.int32
        acc1 = None
        xs_cols = []
        for g in range(GB):
            xg = xb[:, g * gs:(g + 1) * gs]
            if variant == "v2":
                xg = xg.astype(jnp.bfloat16)
            cg = codes[g * gs:(g + 1) * gs, :]
            dot_g = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=pref,
            ).astype(jnp.float32)
            sg = s_blk[g, :][None, :]
            t = dot_g * sg
            acc1 = t if acc1 is None else acc1 + t
            xs_cols.append(jnp.sum(
                xb[:, g * gs:(g + 1) * gs].astype(jnp.int32), axis=1,
                keepdims=True))
        xsums = jnp.concatenate(xs_cols, axis=1).astype(jnp.float32)
        zs_blk = s_blk * z_blk
        zcorr = jax.lax.dot_general(
            xsums, zs_blk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] += acc1 - zcorr
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


key = jax.random.PRNGKey(0)
codes = jax.random.randint(key, (K, N), 0, 16, jnp.int32)
w = pack_u4_rows(codes)
s = jax.random.uniform(key, (K // gs, N), jnp.float32, 0.001, 0.01)
z = jnp.full((K // gs, N), 8.0, jnp.float32)
x = jax.random.randint(key, (B, K), -127, 128, jnp.int32).astype(jnp.int8)

ref = None
for variant in ("v0", "v1", "v3", "v4", "v5", "v6"):
    f = jax.jit(build(variant))
    out = jax.block_until_ready(f(x, w, s, z))
    if ref is None:
        ref = out
    else:
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{variant} max|diff| vs v0: {err:.3e}", flush=True)

    @jax.jit
    def loop(x, w, s, z, f=f):
        def body(c, _):
            return c, f(x, w, s, z).sum()
        _, ys = jax.lax.scan(body, 0, None, length=ITERS)
        return ys

    jax.block_until_ready(loop(x, w, s, z))
    td = f"/tmp/exp12_{variant}"
    with jax.profiler.trace(td):
        jax.block_until_ready(loop(x, w, s, z))
    us = dev_us(td)
    print(f"{variant}: {us:7.2f} us/call  (DMA ideal ~30.7)", flush=True)
