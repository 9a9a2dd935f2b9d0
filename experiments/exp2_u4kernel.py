"""Round-2 experiment 2: uint4-native kernel, with the u4 array built
INSIDE the jit (axon cannot pass device uint4 across the jit boundary:
arg path hits a device_put recursion, closure path an UNIMPLEMENTED host
transfer — see exp1 notes). The conversion hoists out of the token scan,
so per-token cost is the kernel alone; we read per-kernel device times
from the trace (kernel_events) rather than whole-jit time.

Also measures variant D (u8 shift/mask unpacked to *int8 codes* once, 2x
bytes streamed) as the "no-unpack" control.
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
from triage import kernel_events  # noqa: E402

from sparsebit_tpu.ops.packing import pack_columns  # noqa: E402
from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_a8  # noqa: E402

K, N, GS, B = 4096, 22016, 128, 8
ITERS = 20
G = K // GS


def _u4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, gs, g_blk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]
    codes = w_ref[...].astype(jnp.int8)
    acc = None
    for g in range(g_blk):
        xg = xb[:, g * gs : (g + 1) * gs]
        cg = codes[g * gs : (g + 1) * gs, :]
        dot_g = jax.lax.dot_general(
            xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(
            jnp.float32
        )
        contrib = (dot_g - xsum * z_ref[g, 0, :][None, :]) * s_ref[g, 0, :][None, :]
        acc = contrib if acc is None else acc + contrib
    acc_ref[...] += acc
    o_ref[...] = acc_ref[...]


def u4_matmul(x8, w4, s3, z3, k_blk=256):
    NT = N
    while k_blk * NT // 2 > 1_600_000:
        NT //= 2
    G_BLK = k_blk // GS
    grid = (N // NT, K // k_blk)
    return pl.pallas_call(
        functools.partial(_u4_kernel, gs=GS, g_blk=G_BLK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, k_blk), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blk, NT), lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, 1, NT), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, 1, NT), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, NT), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, NT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x8, w4, s3, z3)


def _s8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, gs, g_blk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]
    codes = w_ref[...]  # already int8
    acc = None
    for g in range(g_blk):
        xg = xb[:, g * gs : (g + 1) * gs]
        cg = codes[g * gs : (g + 1) * gs, :]
        dot_g = jax.lax.dot_general(
            xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(
            jnp.float32
        )
        contrib = (dot_g - xsum * z_ref[g, 0, :][None, :]) * s_ref[g, 0, :][None, :]
        acc = contrib if acc is None else acc + contrib
    acc_ref[...] += acc
    o_ref[...] = acc_ref[...]


def s8_matmul(x8, w8, s3, z3, k_blk=256):
    NT = N
    while k_blk * NT > 1_600_000:
        NT //= 2
    G_BLK = k_blk // GS
    grid = (N // NT, K // k_blk)
    return pl.pallas_call(
        functools.partial(_s8_kernel, gs=GS, g_blk=G_BLK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, k_blk), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blk, NT), lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, 1, NT), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, 1, NT), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, NT), lambda i, k: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B, NT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x8, w8, s3, z3)


def main():
    import time

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    codes = jax.random.randint(k1, (K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(k2, (G, N), jnp.float32, 0.001, 0.01)
    zeros = jnp.full((G, N), 8.0, jnp.float32)
    x8 = jax.random.randint(k1, (B, K), -127, 127, jnp.int8)
    s3 = scales.reshape(G, 1, N)
    z3 = zeros.reshape(G, 1, N)
    W = (codes.astype(jnp.float32) - zeros.repeat(GS, 0)) * scales.repeat(GS, 0)
    ref = jnp.dot(x8.astype(jnp.float32), W)
    packed = pack_columns(codes, 4)["w"]  # u8 container, column planes

    def run_case(tag, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        print("{}: compile {:.1f}s".format(tag, time.perf_counter() - t0), flush=True)
        trace_dir = "/tmp/exp2_" + tag
        with jax.profiler.trace(trace_dir):
            out = fn(*args)
            jax.block_until_ready(out)
        evs = kernel_events(trace_dir, min_us=3.0)
        for name, durs in sorted(evs.items()):
            if len(durs) >= 3:  # per-iteration kernels
                print(
                    "  {:40s} n={:3d} mean {:8.1f} us".format(
                        name[:40], len(durs), sum(durs) / len(durs)
                    ),
                    flush=True,
                )
        return out

    # correctness of u4 kernel (single call, u4 built inside jit)
    @jax.jit
    def u4_once(codes, x8, s3, z3):
        w4 = codes.astype(jnp.uint4)
        return u4_matmul(x8, w4, s3, z3)

    outB = u4_once(codes, x8, s3, z3)
    errB = float(jnp.max(jnp.abs(outB - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print("u4 err:", errB, flush=True)

    # scan variants: weight array built once inside the jit, then 20 kernels
    def scan_over(fn_make_w, kernel):
        @jax.jit
        def run(codes_or_packed, x8, s3, z3):
            w = fn_make_w(codes_or_packed)

            def body(c, _):
                bump = (c[0] > 1e30).astype(jnp.int8)
                o = kernel(x8 + bump, w, s3, z3)
                return c + o[0, :8], None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((8,), jnp.float32), None, length=ITERS
            )
            return acc

        return run

    run_case(
        "A_u8_container",
        scan_over(
            lambda p: p,
            lambda x, w, s, z: _quant_matmul_pallas_a8(
                x, w, scales, zeros, 4, GS, N
            ),
        ),
        packed, x8, s3, z3,
    )
    run_case(
        "B_u4_native",
        scan_over(lambda c: c.astype(jnp.uint4), u4_matmul),
        codes, x8, s3, z3,
    )
    for kb in (512,):
        run_case(
            "B_u4_kblk{}".format(kb),
            scan_over(
                lambda c: c.astype(jnp.uint4),
                lambda x, w, s, z: u4_matmul(x, w, s, z, k_blk=kb),
            ),
            codes, x8, s3, z3,
        )
    run_case(
        "D_s8_2x_bytes",
        scan_over(lambda c: (c - 8).astype(jnp.int8), s8_matmul),
        codes, x8, s3 * 1.0, (z3 - 8.0)),
    # note: D shifts codes to signed, zeros shifted to match


if __name__ == "__main__":
    main()
