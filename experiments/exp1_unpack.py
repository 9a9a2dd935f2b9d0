"""Round-2 experiment 1: unpack strategies + layer-indexed weights.

Q1: does a native uint4 weight array (XLA packed layout, Mosaic-lowered
    convert) beat the u8-container shift/mask unpack that is VPU-bound
    (docs/perf_notes.md round-1 closing analysis)?
Q2: does a scalar-prefetch layer-indexed kernel over stacked (L, K, NP)
    weights run at per-layer speed (i.e. no stacked-weight copy)?

Workload: w13-shaped decode matmul, K=4096, N=22016 (LLaMA-7B fused
gate+up), B=8 (padded batch-1), int8 activations, groupsize 128.
All variants run inside one lax.scan with the kernel input XORed with a
carry-dependent byte so XLA cannot hoist the call out of the loop
(v1 of this script measured exactly that hoist: 4.3 us/iter = one call).
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
from triage import timed  # noqa: E402

from sparsebit_tpu.ops.packing import pack_columns  # noqa: E402
from sparsebit_tpu.ops.quant_matmul import _quant_matmul_pallas_a8  # noqa: E402

K, N, GS, B = 4096, 22016, 128, 8
ITERS = 20
G = K // GS


def make_inputs(key):
    k1, k2 = jax.random.split(key)
    codes = jax.random.randint(k1, (K, N), 0, 16, jnp.int32)
    scales = jax.random.uniform(k2, (G, N), jnp.float32, 0.001, 0.01)
    zeros = jnp.full((G, N), 8.0, jnp.float32)
    x8 = jax.random.randint(k1, (B, K), -127, 127, jnp.int8)
    return codes, scales, zeros, x8


def scan_wrap(fn, n=ITERS):
    """fn(x8, *args); x8 is perturbed per-iteration from the carry so the
    kernel stays inside the loop."""

    @jax.jit
    def run(x8, *args):
        def body(c, _):
            bump = (c[0] > 1e30).astype(jnp.int8)  # always 0, data-dependent
            o = fn(x8 + bump, *args)
            return c + o[0, :8].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32), None, length=n)
        return acc

    return run


# ---- variant B: native uint4 weights, row-major (K, N), no planes ----------


def _u4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, gs, g_blk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]  # (B, K_BLK) int8
    codes = w_ref[...].astype(jnp.int8)  # (K_BLK, NT) from uint4
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


def u4_matmul(x8, w4, s3, z3, k_blk=256, nt=None):
    NT = nt or N
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


# ---- variant C: layer-indexed u8 container (scalar prefetch) ---------------


def _qmm_a8_idx_kernel(li_ref, x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *,
                       bits, gs, g_blk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]
    p = 8 // bits
    mask = (1 << bits) - 1
    wb = w_ref[0].astype(jnp.int32)
    for j in range(p):
        codes = ((wb >> (j * bits)) & mask).astype(jnp.int8)
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
            contrib = (dot_g - xsum * z_ref[0, g, j, :][None, :]) * s_ref[0, g, j, :][None, :]
            acc = contrib if acc is None else acc + contrib
        acc_ref[:, j, :] += acc
    o_ref[...] = acc_ref[...]


def indexed_matmul(x8, w_stack, s_stack, z_stack, li, k_blk=256, nt=None):
    """w_stack (L, K, NP) u8; s/z_stack (L, G, 2, NP) f32; li traced int32."""
    NP = N // 2
    NT = nt or NP
    while k_blk * NT > 1_600_000:
        NT //= 2
    G_BLK = k_blk // GS
    grid = (NP // NT, K // k_blk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((B, k_blk), lambda i, k, li: (0, k)),
            pl.BlockSpec((1, k_blk, NT), lambda i, k, li: (li[0], k, i)),
            pl.BlockSpec((1, G_BLK, 2, NT), lambda i, k, li: (li[0], k, 0, i)),
            pl.BlockSpec((1, G_BLK, 2, NT), lambda i, k, li: (li[0], k, 0, i)),
        ],
        out_specs=pl.BlockSpec((B, 2, NT), lambda i, k, li: (0, 0, i)),
        scratch_shapes=[pltpu.VMEM((B, 2, NT), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_qmm_a8_idx_kernel, bits=4, gs=GS, g_blk=G_BLK),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2, NP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.full((1,), li, jnp.int32), x8, w_stack, s_stack, z_stack)
    return out.reshape(B, N)


def hbm_bytes():
    try:
        return jax.devices()[0].memory_stats()["bytes_in_use"]
    except Exception:
        return None


def main():
    key = jax.random.PRNGKey(0)
    codes, scales, zeros, x8 = make_inputs(key)
    print("devices:", jax.devices(), flush=True)

    # correctness oracle on small slice via dense dequant
    W = (codes.astype(jnp.float32) - zeros.repeat(GS, 0)) * scales.repeat(GS, 0)
    ref = jnp.dot(x8.astype(jnp.float32), W)

    # A: current u8-container a8 kernel
    packed = pack_columns(codes, 4)
    outA = _quant_matmul_pallas_a8(x8, packed["w"], scales, zeros, 4, GS, N)
    errA = float(jnp.max(jnp.abs(outA - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print("A err:", errA, flush=True)
    timed(
        "A u8-container shift/mask",
        scan_wrap(lambda x, w, s, z: _quant_matmul_pallas_a8(x, w, s, z, 4, GS, N)),
        x8, packed["w"], scales, zeros, iters=ITERS,
    )

    # B: native uint4 — check HBM packing first
    try:
        before = hbm_bytes()
        w4 = jax.device_put(codes.astype(jnp.uint4))
        w4.block_until_ready()
        after = hbm_bytes()
        if before is not None:
            print(
                "uint4 HBM bytes for {} elems: {} (packed would be {})".format(
                    codes.size, after - before, codes.size // 2
                ),
                flush=True,
            )
        # (G, 1, N): second-to-last dim == array dim satisfies the tiling rule
        s3 = scales.reshape(G, 1, N)
        z3 = zeros.reshape(G, 1, N)
        outB = u4_matmul(x8, w4, s3, z3)
        errB = float(jnp.max(jnp.abs(outB - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print("B err:", errB, flush=True)
        timed(
            "B native uint4 rowmajor",
            scan_wrap(lambda x, w, s, z: u4_matmul(x, w, s, z)),
            x8, w4, s3, z3, iters=ITERS,
        )
        for kb in (512, 1024):
            try:
                timed(
                    "B uint4 K_BLK={}".format(kb),
                    scan_wrap(lambda x, w, s, z, kb=kb: u4_matmul(x, w, s, z, k_blk=kb)),
                    x8, w4, s3, z3, iters=ITERS,
                )
            except Exception as e:
                print("B K_BLK={} failed: {}".format(kb, repr(e)[:200]), flush=True)
    except Exception as e:
        print("B failed:", repr(e)[:500], flush=True)

    # C: layer-indexed stacked u8 (4 layers to keep memory sane)
    try:
        L = 4
        w_stack = (
            jnp.broadcast_to(packed["w"][None], (L,) + packed["w"].shape)
            + jnp.zeros((L, 1, 1), jnp.uint8)
        )
        s_stack = jnp.broadcast_to(
            scales.reshape(1, G, 2, N // 2), (L, G, 2, N // 2)
        ) * 1.0
        z_stack = jnp.broadcast_to(
            zeros.reshape(1, G, 2, N // 2), (L, G, 2, N // 2)
        ) * 1.0
        outC = indexed_matmul(x8, w_stack, s_stack, z_stack, 1)
        errC = float(jnp.max(jnp.abs(outC - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print("C err:", errC, flush=True)

        @jax.jit
        def scan_layers(x8, w_stack, s_stack, z_stack):
            def body(c, li):
                bump = (c[0] > 1e30).astype(jnp.int8)
                o = indexed_matmul(x8 + bump, w_stack, s_stack, z_stack, li)
                return c + o[0, :8], None

            acc, _ = jax.lax.scan(
                body, jnp.zeros((8,), jnp.float32),
                jnp.arange(ITERS, dtype=jnp.int32) % L,
            )
            return acc

        timed(
            "C scalar-prefetch layer-indexed",
            scan_layers, x8, w_stack, s_stack, z_stack, iters=ITERS,
        )
    except Exception as e:
        print("C failed:", repr(e)[:500], flush=True)


if __name__ == "__main__":
    main()
