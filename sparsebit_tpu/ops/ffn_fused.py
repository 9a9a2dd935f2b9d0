"""Fused decode FFN block: rms_norm + W13 + GLU + W2 + residual, ONE launch.

The decode FFN path costs two Pallas launches (w13, w2) plus XLA fusions
for the norm, the per-token int8 quant (twice) and the silu*up gate — every
dependent event pays the fabric's fixed turnaround (docs/perf_notes.md), and
on real TPUs each launch re-reads x/h activations from HBM. This kernel runs

    out = x + W2( glu( W13( q8(rms_norm(x)) ) ) ),   glu(g, u) = silu(g)*u

in one launch: a 1-D grid walks the W13 tiles then the W2 tiles (k
innermost); phase transitions are `pl.when`-gated on the step index. The
normalized activations, their int8 quantization, the (B, 2F) W13 output,
and the gated int8 (B, F) all live in VMEM scratch across steps — nothing
round-trips HBM except the streamed u4 weight tiles (the speed-of-light
term) and the (B, dim) input/output rows.

Weights use the u4-native serving layout (codes as uint4 -> int8 MXU, see
ops/quant_matmul.py); the W4A8 math (per-token int8 quant + group-factored
epilogue) matches quant_matmul_a8 exactly, so the oracle is the unfused
pipeline. Layer-stacked weights (L, K, N) ride a scalar-prefetch layer
index like the stacked matmul kernels — the scan-over-layers decode calls
this with zero per-layer copies.

Reference: the CUDA decode path launches 3 matvec kernels + eltwise for the
same block (cuda_kernel_4bit.cu per linear); this is its one-launch TPU
replacement.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsebit_tpu.ops.quant_matmul import (
    _lane_ok,
    _pick_tiles_u4,
    _sz_layout,
    _sz_rows,
    _u4_tile,
)


def _ffn_kernel(li_ref, x_ref, xres_ref, nw_ref,
                w13_ref, s13_ref, z13_ref, w2_ref, s2_ref, z2_ref,
                o_ref, xq_ref, xs_ref, h1_ref, a8_ref, as_ref,
                acc13_ref, acc2_ref, *,
                gs, dim, F, KB1, NT1, GB1, G81, KB2, NT2, GB2, G82, k1_t,
                n1_t, k2_t, eps, signed=False):
    s = pl.program_id(0)
    T13 = n1_t * k1_t

    @pl.when(s == 0)
    def _prologue():
        xf = x_ref[...].astype(jnp.float32)  # (B, dim)
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        # norm block is an 8-row layer window (unit-sublane blocks force a
        # whole-array retile that XLA sinks into the decode loop); pick
        # this layer's row with where+reduce (a one-hot DOT would
        # propagate 0 x NaN from out-of-bounds garbage when L % 8 != 0)
        blk = nw_ref[...]
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
            == li_ref[0] % blk.shape[0]
        )
        nw = jnp.sum(jnp.where(sel, blk, 0.0), axis=0, keepdims=True)
        xn = xf * jax.lax.rsqrt(var + eps) * nw  # (1, dim) bcast
        absmax = jnp.max(jnp.abs(xn), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        xq_ref[...] = jnp.clip(
            jnp.round(xn / scale), -128, 127
        ).astype(jnp.int8)
        xs_ref[...] = scale

    @pl.when(s < T13)
    def _w13_step():
        k1 = s % k1_t

        @pl.when(k1 == 0)
        def _():
            acc13_ref[...] = jnp.zeros_like(acc13_ref)

        off = pl.multiple_of(k1 * KB1, KB1)
        xb = xq_ref[:, pl.ds(off, KB1)]  # (B, KB1) int8
        codes = _u4_tile(w13_ref[0], signed).astype(jnp.int8)  # (KB1, NT1)
        acc = None
        for g in range(GB1):
            xg = xb[:, g * gs: (g + 1) * gs]
            cg = codes[g * gs: (g + 1) * gs, :]
            dot_g = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1,
                           keepdims=True).astype(jnp.float32)
            sg, zg = _sz_rows(s13_ref, z13_ref, k1, g, GB1, G81, lead=(0,))
            if signed:
                zg = zg - 8.0  # s4r nibbles store code-8
            contrib = (dot_g - xsum * zg) * sg
            acc = contrib if acc is None else acc + contrib
        acc13_ref[...] += acc

        @pl.when(k1 == k1_t - 1)
        def _():
            n1 = s // k1_t
            hoff = pl.multiple_of(n1 * NT1, NT1)
            h1_ref[:, pl.ds(hoff, NT1)] = acc13_ref[...] * xs_ref[...]

    @pl.when(s == T13)
    def _glu():
        h = h1_ref[...]  # (B, 2F)
        g_, u_ = h[:, :F], h[:, F:]
        a = (g_ * jax.nn.sigmoid(g_)) * u_  # silu(g) * u
        absmax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        a8_ref[...] = jnp.clip(jnp.round(a / scale), -128, 127).astype(jnp.int8)
        as_ref[...] = scale

    @pl.when(s >= T13)
    def _w2_step():
        t = s - T13
        k2 = t % k2_t

        @pl.when(k2 == 0)
        def _():
            acc2_ref[...] = jnp.zeros_like(acc2_ref)

        off = pl.multiple_of(k2 * KB2, KB2)
        ab = a8_ref[:, pl.ds(off, KB2)]  # (B, KB2) int8
        codes = _u4_tile(w2_ref[0], signed).astype(jnp.int8)  # (KB2, NT2)
        acc = None
        for g in range(GB2):
            xg = ab[:, g * gs: (g + 1) * gs]
            cg = codes[g * gs: (g + 1) * gs, :]
            dot_g = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1,
                           keepdims=True).astype(jnp.float32)
            sg, zg = _sz_rows(s2_ref, z2_ref, k2, g, GB2, G82, lead=(0,))
            if signed:
                zg = zg - 8.0  # s4r nibbles store code-8
            contrib = (dot_g - xsum * zg) * sg
            acc = contrib if acc is None else acc + contrib
        acc2_ref[...] += acc

        @pl.when(k2 == k2_t - 1)
        def _():
            o_ref[...] = (
                xres_ref[...].astype(jnp.float32) + acc2_ref[...] * as_ref[...]
            )


def ffn_block_supported(dim, F, gs, B=1):
    """Shape gate: groupsize-tileable K dims, 128-lane N dims, no padding
    (n_padded == out_features), modest batch."""
    if gs <= 0 or B > 64:
        return False
    if dim % gs or F % gs or (2 * F) % 128 or dim % 128:
        return False
    KB1, NT1 = _pick_tiles_u4(dim, 2 * F, gs, False)
    KB2, NT2 = _pick_tiles_u4(F, dim, gs, False)
    # the w2 output block is the whole row (residual add needs x columns
    # aligned with the h1/a8 lanes); keep NT2 == dim for simplicity
    return (
        _lane_ok(KB1, dim) and _lane_ok(NT1, 2 * F)
        and _lane_ok(KB2, F) and NT2 == dim
    )


def ffn_block_fused(x, w13_u4, s13, z13, w2_u4, s2, z2, norm_w, li,
                    gs, eps, interpret=False, signed=False):
    """x (B, dim) f32/bf16 -> (B, dim) f32 = x + FFN(rms_norm(x)).

    w13_u4 (L, dim, 2F) uint4 or (L, dim//2, 2F) uint8 row-pairs
    (pack_u4_rows; both weights must use the same layout);
    s13/z13 (L, G1, 2F) f32; w2_u4 (L, F, dim) uint4 or (L, F//2, dim)
    uint8; s2/z2 (L, G2, dim) f32; norm_w (L, dim); li () int32 layer
    index (scalar-prefetched). Unstacked callers pass L=1 views and li=0.
    """
    B, dim = x.shape
    rowpair = w13_u4.dtype == jnp.uint8
    assert (w2_u4.dtype == jnp.uint8) == rowpair
    Lx, _, N1 = w13_u4.shape
    F = N1 // 2
    KB1, NT1 = _pick_tiles_u4(dim, N1, gs, False)
    KB2, NT2 = _pick_tiles_u4(F, dim, gs, False)
    GB1, GB2 = KB1 // gs, KB2 // gs
    G1, G2 = dim // gs, F // gs
    G81 = _sz_layout(G1, GB1, s13.dtype)
    G82 = _sz_layout(G2, GB2, s2.dtype)
    k1_t, n1_t = dim // KB1, N1 // NT1
    k2_t = F // KB2
    assert NT2 == dim, "w2 tiles must span the full output row"
    T = n1_t * k1_t + k2_t
    Wn = 8 if Lx >= 8 else Lx  # norm-stack layer window

    B_pad = max(8, ((B + 7) // 8) * 8)
    if B_pad != B:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))

    li_arr = jnp.reshape(li, (1,)).astype(jnp.int32)

    def pin13(s, li_r):
        # active during W13 steps; afterwards pinned on the last tile (an
        # unchanged block index elides the DMA entirely)
        sc = jnp.minimum(s, n1_t * k1_t - 1)
        return sc // k1_t, sc % k1_t

    def pin2(s, li_r):
        t = jnp.clip(s - n1_t * k1_t, 0, k2_t - 1)
        return t

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((B_pad, dim), lambda s, li_r: (0, 0)),     # x (norm)
            pl.BlockSpec((B_pad, dim), lambda s, li_r: (0, 0)),     # x (res)
            # 8-row layer window over (L, dim); the kernel one-hot-selects
            # row li % W (default tiling — no whole-array retile)
            pl.BlockSpec((Wn, dim), lambda s, li_r: (li_r[0] // Wn, 0)),
            pl.BlockSpec(
                (1, KB1 // 2 if rowpair else KB1, NT1),
                lambda s, li_r: (li_r[0], pin13(s, li_r)[1], pin13(s, li_r)[0]),
            ),                                                      # w13
            # scale/zero blocks are (G8, NT) windows with DEFAULT tiling —
            # unit-sublane blocks force a T(1,128) retile of the whole
            # array that XLA sinks into the decode loop (see
            # quant_matmul._sz_layout)
            pl.BlockSpec(
                (1, G81, NT1),
                lambda s, li_r: (
                    li_r[0], (pin13(s, li_r)[1] * GB1) // G81,
                    pin13(s, li_r)[0],
                ),
            ),                                                      # s13
            pl.BlockSpec(
                (1, G81, NT1),
                lambda s, li_r: (
                    li_r[0], (pin13(s, li_r)[1] * GB1) // G81,
                    pin13(s, li_r)[0],
                ),
            ),                                                      # z13
            pl.BlockSpec(
                (1, KB2 // 2 if rowpair else KB2, NT2),
                lambda s, li_r: (li_r[0], pin2(s, li_r), 0),
            ),                                                      # w2
            pl.BlockSpec(
                (1, G82, NT2),
                lambda s, li_r: (li_r[0], (pin2(s, li_r) * GB2) // G82, 0),
            ),                                                      # s2
            pl.BlockSpec(
                (1, G82, NT2),
                lambda s, li_r: (li_r[0], (pin2(s, li_r) * GB2) // G82, 0),
            ),                                                      # z2
        ],
        out_specs=pl.BlockSpec((B_pad, dim), lambda s, li_r: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((B_pad, dim), jnp.int8),    # xq
            pltpu.VMEM((B_pad, 1), jnp.float32),   # x scale
            pltpu.VMEM((B_pad, N1), jnp.float32),  # h1
            pltpu.VMEM((B_pad, F), jnp.int8),      # a8
            pltpu.VMEM((B_pad, 1), jnp.float32),   # a scale
            pltpu.VMEM((B_pad, NT1), jnp.float32),  # acc13
            pltpu.VMEM((B_pad, NT2), jnp.float32),  # acc2
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _ffn_kernel, gs=gs, dim=dim, F=F, KB1=KB1, NT1=NT1, GB1=GB1,
            G81=G81, KB2=KB2, NT2=NT2, GB2=GB2, G82=G82, k1_t=k1_t,
            n1_t=n1_t, k2_t=k2_t, eps=eps, signed=signed,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B_pad, dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(li_arr, x, x, norm_w, w13_u4, s13, z13, w2_u4, s2, z2)
    return out[:B]
