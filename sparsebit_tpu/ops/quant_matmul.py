"""Group-wise dequantize+matmul over packed sub-byte weights.

TPU-native replacement for the reference's packed dequant-matvec CUDA
kernels (large_language_models/llama/quantization/cuda/cuda_kernel_{2,3,4}bit.cu:89-180
and QuantLinear.forward, utils/quant.py:262-307).

Design (see ops/packing.py for the column-plane layout):
- weights stay packed in HBM (the bandwidth win IS the speedup: decode is
  HBM-bound, so 4-bit weights stream ~4x faster than fp16);
- the Pallas kernel unpacks each (K_BLK, NT) byte tile in VMEM with a
  shift+mask per plane, dequantizes against per-group scales/zeros, and
  feeds the MXU — full W is never materialised in HBM;
- output viewed as (B, p, N//p): plane j of a packed tile produces the
  contiguous column block out[:, j, :], so one BlockSpec covers all planes;
- grid (N tiles, K tiles) with K innermost accumulating into the output
  block in VMEM (revisited across k steps).

An XLA path (unpack -> dequant -> dot) serves as CPU/interpret oracle and
as fallback for 3-bit (two-plane packing) until its kernel lands.

Gradients: custom_vjp gives dx = g @ W^T (weights are frozen in every
consumer: GPTQ inference and QLoRA, reference qmatmul.py:45-69).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsebit_tpu.ops.packing import unpack_columns


def _expand_qparams(arr, K, gs):
    """(G, N) group params -> (K, N) rows."""
    if arr.shape[0] == K:
        return arr
    return jnp.repeat(arr, gs, axis=0)[:K]


def dequant_weights(packed, scales, zeros, bits, N, gs):
    """Materialise the float weight matrix (K, N). Oracle/fallback path."""
    codes = unpack_columns(packed, bits, N).astype(jnp.float32)
    K = codes.shape[0]
    gs_eff = gs if gs > 0 else K
    # qparams may be stored bf16 (serving layout); dequant math is f32 so
    # this path stays the exact oracle of the kernels' f32 epilogue
    s = _expand_qparams(scales.astype(jnp.float32), K, gs_eff)
    z = _expand_qparams(zeros.astype(jnp.float32), K, gs_eff)
    return (codes - z) * s


# ---- Pallas kernel ----------------------------------------------------------


def _qmm_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, gs, g_blk):
    """Group-factored dequant-matmul: within a group g every row shares
    (s_g, z_g) per column, so

        x_g @ ((C_g - z_g) * s_g)  ==  (x_g @ C_g - sum(x_g) * z_g) * s_g

    — the dequantized weight tile is never materialised and the per-element
    scale multiply collapses to one (B, NT) epilogue per group. (The
    reference CUDA kernel dequantizes per element in registers,
    cuda_kernel_4bit.cu:89-180; on TPU the epilogue form keeps the VPU out
    of the inner loop entirely.)

    Accumulation uses a VMEM scratch, NOT read-modify-write on o_ref:
    RMW on a revisited output block serializes the grid pipeline (measured
    ~10us un-hidden DMA latency per k-step on v5e); write-only o_ref lets
    Mosaic double-buffer the weight tile DMA."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...].astype(jnp.float32)  # (B, K_BLK)
    p = 8 // bits if bits != 8 else 1
    mask = (1 << bits) - 1
    wb_i32 = w_ref[...].astype(jnp.int32)  # Mosaic has no uint8->f32 cast
    for j in range(p):  # static unroll over column planes
        if bits == 8:
            codes = wb_i32.astype(jnp.float32)
        else:
            codes = ((wb_i32 >> (j * bits)) & mask).astype(jnp.float32)
        acc = None
        for g in range(g_blk):  # static unroll over quant groups
            xg = xb[:, g * gs : (g + 1) * gs]  # (B, gs)
            cg = codes[g * gs : (g + 1) * gs, :]  # (gs, NT)
            dot_g = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
            xsum = jnp.sum(xg, axis=1, keepdims=True)  # (B, 1)
            contrib = (dot_g - xsum * z_ref[g, j, :][None, :]) * s_ref[g, j, :][None, :]
            acc = contrib if acc is None else acc + contrib
        acc_ref[:, j, :] += acc
    o_ref[...] = acc_ref[...]


# K_BLK * NT cells per weight tile. Live VMEM ~= tile (x2 buffers) + the
# i32 unpack temp (4 bytes/cell) + f32 accumulator: 1.6M cells ~= 10 MB.
# Measured on v5e (wqkv 4096x12288): K_BLK 128 -> 256 at full-width NT cut
# per-call time 44.3 -> 39.9 us (ideal 29); K_BLK 512 OOMs on the temp.
_TILE_CELL_BUDGET = 1_600_000


def _pick_tiles(K, NP, gs_eff, per_channel):
    """(K_BLK, NT): K_BLK nests with the groupsize; NT as wide as possible
    (full packed rows -> contiguous HBM DMA; narrow tiles measured ~1/30th
    of HBM bandwidth on v5e) under the VMEM cell budget."""
    if per_channel:
        K_BLK = 512
        while K % K_BLK != 0 and K_BLK > 8:
            K_BLK //= 2
        if K % K_BLK != 0:
            K_BLK = K
    else:
        K_BLK = gs_eff
    # widest lane-aligned divisor of NP fitting the budget
    NT = NP
    for cand in sorted(
        {d for d in range(128, NP + 1, 128) if NP % d == 0} | {NP},
        reverse=True,
    ):
        if K_BLK * cand <= _TILE_CELL_BUDGET:
            NT = cand
            break
    else:
        NT = 128 if NP % 128 == 0 else NP
    # grow K_BLK (grouped case) while budget allows
    while (
        not per_channel
        and K_BLK < 512
        and K % (K_BLK * 2) == 0
        and K_BLK * 2 * NT <= _TILE_CELL_BUDGET
    ):
        K_BLK *= 2
    return K_BLK, NT


def _quant_matmul_pallas(x, w, scales, zeros, bits, gs, N, nt=None, k_blk=None):
    """x (B, K) f32/bf16; w packed uint8 (K, NP); scales/zeros (G, N)."""
    B, K = x.shape
    p = 8 // bits if bits != 8 else 1
    NP = N // p
    G = scales.shape[0]
    per_channel = gs <= 0
    gs_eff = gs if gs > 0 else K

    K_BLK, NT = _pick_tiles(K, NP, gs_eff, per_channel)
    if k_blk:
        K_BLK = k_blk
    if nt:
        NT = nt
    if K % K_BLK != 0:
        raise ValueError("K={} not tileable by {}".format(K, K_BLK))
    if NP % NT != 0:
        raise ValueError("packed N={} not tileable by {}".format(NP, NT))
    if per_channel:
        # every k-tile applies the same (1, N) qparams; the kernel treats
        # the whole K_BLK panel as one group
        G_BLK, gs_kernel = 1, K_BLK
        s_index = lambda i, k: (0, 0, i)
    else:
        G_BLK, gs_kernel = K_BLK // gs_eff, gs_eff
        s_index = lambda i, k: (k, 0, i)

    # pad batch to sublane granularity
    B_pad = max(8, ((B + 7) // 8) * 8)
    if B_pad != B:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))

    s3 = scales.reshape(G, p, NP).astype(jnp.float32)
    z3 = zeros.reshape(G, p, NP).astype(jnp.float32)

    grid = (NP // NT, K // K_BLK)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, bits=bits, gs=gs_kernel, g_blk=G_BLK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_pad, K_BLK), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_BLK, NT), lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, p, NT), s_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, p, NT), s_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B_pad, p, NT), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, p, NP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_pad, p, NT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * K * N,
            bytes_accessed=K * NP + G * N * 8 + B_pad * K * 4 + B_pad * N * 4,
            transcendentals=0,
        ),
    )(x, w, s3, z3)
    out = out.reshape(B_pad, N)
    return out[:B]


def _lane_ok(blk, dim):
    """Mosaic requires a block's last dim to be a multiple of 128 or equal
    to the full array dim (sublane analogue: multiple of 8)."""
    return blk == dim or blk % 128 == 0


def _supports_pallas(bits, K, N, gs, B=1):
    gs_eff = gs if gs > 0 else K
    if K % gs_eff != 0:
        return False
    if B > 64:
        # the kernel is a decode/matvec kernel: its output block is
        # (B_pad, p, NT) f32 resident in VMEM. Big-batch (prefill/GPTQ
        # re-run) matmuls are MXU-bound, where XLA's dense path on the
        # dequantized weight is already the right schedule.
        return False
    if bits == 3:
        # _quant_matmul_pallas_3bit uses K_BLK = gs_eff directly (no
        # growth); the x block's last dim is K_BLK.
        return (
            N % 8 == 0
            and (N // 8) % 128 == 0
            and _lane_ok(gs_eff, K)
        )
    if bits not in (2, 4, 8):
        return False
    p = 8 // bits if bits != 8 else 1
    NP = N // p
    if NP % 128 != 0:
        return False
    K_BLK, NT = _pick_tiles(K, NP, gs_eff, gs <= 0)
    return _lane_ok(K_BLK, K) and _lane_ok(NT, NP)


# ---- 3-bit kernel: two packed planes (low2 + high1) -------------------------


def _qmm3_kernel(x_ref, lo_ref, hi_ref, s_ref, z_ref, o_ref, acc_ref, *,
                 gs, g_blk, a8):
    """3-bit dequant-matmul over the two-plane packing (ops/packing.py):
    low2 (K, N/4) holds bits 0-1 in 4 column planes; high1 (K, N/8) holds
    bit 2 in 8 planes. Output plane j of the p=8 view takes its low bits
    from low2 plane j//2, column half j%2. Same group-factored epilogue as
    the 4/2-bit kernels; ``a8`` switches the dots to the int8 MXU.
    (Replaces the reference's 10-codes-per-int32 3-bit CUDA scheme,
    cuda_kernel_3bit.cu — that layout would force cross-lane gathers here.)
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    NT = o_ref.shape[2]
    xb = x_ref[...] if a8 else x_ref[...].astype(jnp.float32)
    lo32 = lo_ref[...].astype(jnp.int32)  # (K_BLK, 4*NT... full low2 tile)
    hi32 = hi_ref[...].astype(jnp.int32)  # (K_BLK, NT*? full high1 tile)
    for j in range(8):
        jl, half = j // 2, j % 2
        low = (lo32[:, half * NT : (half + 1) * NT] >> (2 * jl)) & 3
        high = (hi32 >> j) & 1
        codes_i = low | (high << 2)
        codes = codes_i.astype(jnp.int8) if a8 else codes_i.astype(jnp.float32)
        acc = None
        for g in range(g_blk):
            xg = xb[:, g * gs : (g + 1) * gs]
            cg = codes[g * gs : (g + 1) * gs, :]
            if a8:
                dot_g = jax.lax.dot_general(
                    xg, cg,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                xsum = jnp.sum(
                    xg.astype(jnp.int32), axis=1, keepdims=True
                ).astype(jnp.float32)
            else:
                dot_g = jnp.dot(xg, cg, preferred_element_type=jnp.float32)
                xsum = jnp.sum(xg, axis=1, keepdims=True)
            contrib = (dot_g - xsum * z_ref[g, j, :][None, :]) * s_ref[g, j, :][None, :]
            acc = contrib if acc is None else acc + contrib
        acc_ref[:, j, :] += acc
    o_ref[...] = acc_ref[...]


def _quant_matmul_pallas_3bit(x, packed, scales, zeros, gs, N, a8=False):
    """x (B, K) f32 (or int8 when a8); packed {"low2","high1"} — or the
    plane-concat serving container {"pl"} (pack_planes_serving), whose
    low2/high1 are column slices of the same array."""
    if "low2" not in packed and "pl" in packed:
        NP8 = N // 8
        packed = {"low2": packed["pl"][..., : 2 * NP8],
                  "high1": packed["pl"][..., 2 * NP8:]}
    B, K = x.shape
    NP = N // 8  # output column planes of the p=8 view
    G = scales.shape[0]
    per_channel = gs <= 0
    gs_eff = gs if gs > 0 else K
    if per_channel:
        K_BLK = 512
        while K % K_BLK != 0 and K_BLK > 8:
            K_BLK //= 2
        G_BLK, gs_kernel = 1, K_BLK
        s_index = lambda i, k: (0, 0, i)
    else:
        K_BLK = gs_eff
        G_BLK, gs_kernel = 1, gs_eff
        s_index = lambda i, k: (k, 0, i)
    if K % K_BLK != 0:
        raise ValueError("K={} not tileable by {}".format(K, K_BLK))

    B_pad = max(8, ((B + 7) // 8) * 8)
    if B_pad != B:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))
    s3 = scales.reshape(G, 8, NP).astype(jnp.float32)
    z3 = zeros.reshape(G, 8, NP).astype(jnp.float32)

    grid = (1, K // K_BLK)  # full-width tiles (NP is small: N/8)
    out = pl.pallas_call(
        functools.partial(
            _qmm3_kernel, gs=gs_kernel, g_blk=G_BLK, a8=a8
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_pad, K_BLK), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_BLK, 2 * NP), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_BLK, NP), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, 8, NP), s_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, 8, NP), s_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B_pad, 8, NP), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, 8, NP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_pad, 8, NP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, packed["low2"], packed["high1"], s3, z3)
    return out.reshape(B_pad, N)[:B]


# ---- u4-native kernel: sub-byte codes as a uint4 array ----------------------
#
# The u8-container kernels above unpack with shift+mask per element; Mosaic
# legalizes those at i32 lane granularity, which measures VPU-bound (~78 us
# sustained for the 7B w13 tile vs a 51 us DMA floor, experiments/exp3).
# Storing the codes as a NATIVE uint4 array instead removes the unpack
# entirely: Mosaic loads u4 tiles packed (4 bits/elem in HBM and VMEM, same
# footprint as the container) and the only per-element op is a u4->s8 cast
# feeding the int8 MXU. Measured sustained per-iter on the same tile: 27.7 us
# (2.8x the container kernel; at/below the DMA floor thanks to double
# buffering).
#
# Constraint (axon runtime): uint4 arrays cannot cross the jit boundary
# (device_put recursion on the arg path, UNIMPLEMENTED host transfer on the
# closure path). So the u4 array is materialised INSIDE the serving jit via
# ``codes_to_u4`` — one unpack pass per dispatch, hoisted out of the token
# scan by XLA (amortised to noise over a multi-token scan).
#
# bits<4 also route here: 3/2-bit codes fit in u4. Their HBM traffic is then
# 4 bits/weight instead of 3/2 — still far cheaper than the VPU-bound
# container unpack, and the 3-bit two-plane layout stays the checkpoint
# format. (Reference kernels: cuda_kernel_{2,3,4}bit.cu one-launch matvecs.)


def codes_to_u4(packed, bits, N):
    """Unpack the u8 container to a (K, N) uint4 codes array (in-jit)."""
    return unpack_columns(packed, bits, N).astype(jnp.uint4)


# Scale/zero block layout rule (applies to every kernel below): a block
# whose sublane extent is not a multiple of 8 (e.g. the old (G_BLK, 1, NT)
# unit-sublane blocks) forces a NON-DEFAULT memory tiling (T(1,128)) on the
# whole operand — XLA then inserts a retiling copy of the full scale/zero
# arrays to feed the kernel, and its invariant-code-SINKING pass pushes
# that copy INSIDE the decode loop (measured: ~50 MB of scale copies per
# layer step at 7B = 4.6 ms/tok, the round-2 scan bottleneck). Blocks here
# are therefore (G8, NT) with G8 either the per-k-step group count (when a
# multiple of 8) or an 8-row window — default tiling, zero copies. Rows
# inside the window are picked statically, or via a tiny one-hot dot when
# the in-window offset is grid-dependent.


def _sz_layout(G, GB, dtype=jnp.float32):
    """Window sublane count G8 for the scale/zero BlockSpec.

    The window must be a multiple of the dtype's native sublane tile
    (8 rows for 4-byte, 16 for 2-byte — bf16 serving qparams halve the
    scale-stream bytes) OR span the full G (a full-dim block is always
    default-tiled), AND be a multiple of GB so one k-step's rows never
    straddle two windows (_sz_rows' in-window offset assumes GB | G8)."""
    q = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    if GB % q == 0:
        return GB
    import math as _math

    w = GB * (q // _math.gcd(GB, q))  # lcm(GB, q)
    return w if w <= G else G


def _sz_rows(s_ref, z_ref, k, g, GB, G8, lead=()):
    """Extract the (1, NT) f32 scale/zero rows for group ``g`` of k-step
    ``k`` from a (G8, NT) block (possibly behind leading unit axes
    ``lead``). Blocks may be stored bf16 (serving layout — halves the
    qparam stream); rows are upcast to f32 AFTER selection so the epilogue
    math stays f32 and only (1, NT) is cast per group.

    Selection is masked-where + sublane reduce, NOT a one-hot dot: when G
    is not a multiple of the window the last window's tail rows are
    out-of-bounds VMEM garbage, and a dot's 0 x NaN poisons every lane
    (hit at 7B: w2 has G=86). ``where`` never reads the unselected rows'
    values into the result."""
    s_blk = s_ref[lead] if lead else s_ref[...]
    z_blk = z_ref[lead] if lead else z_ref[...]
    if G8 == GB:  # block holds exactly this k-step's rows; g is static
        return (s_blk[g, :][None, :].astype(jnp.float32),
                z_blk[g, :][None, :].astype(jnp.float32))
    off = (k * GB) % G8 + g  # traced; masking avoids dynamic sublanes
    sel = jax.lax.broadcasted_iota(jnp.int32, s_blk.shape, 0) == off
    sg = jnp.sum(jnp.where(sel, s_blk, 0), axis=0, keepdims=True)
    zg = jnp.sum(jnp.where(sel, z_blk, 0), axis=0, keepdims=True)
    return sg.astype(jnp.float32), zg.astype(jnp.float32)


def _u4_tile(wb, signed=False):
    """Weight tile -> (KB, NT) 4-bit codes. uint8 tiles are ROW-PAIR packed
    (ops/packing.pack_u4_rows / pack_s4_rows, KB/2 sublanes): pltpu.bitcast
    doubles the sublane dim interleaved low-nibble-first — a free register
    reinterpret, zero VPU unpack ops. ``signed`` selects the int4 view for
    s4r containers (nibbles store code-8; the int4 -> int8 widening cast
    is ~1.4 us/call cheaper than uint4 -> int8 on 7B tiles, exp13); the
    caller's epilogue must then use (zero - 8). uint4 tiles pass through
    (legacy in-jit with_u4 layout)."""
    if wb.dtype == jnp.uint8:
        return pltpu.bitcast(wb, jnp.int4 if signed else jnp.uint4)
    return wb


def _qmm_u4_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, gs, g_blk,
                   g8, signed=False, k_axis=1):
    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]  # (B, K_BLK) int8
    codes = _u4_tile(w_ref[...], signed).astype(jnp.int8)  # no shift/mask
    acc = None
    for g in range(g_blk):
        xg = xb[:, g * gs : (g + 1) * gs]
        cg = codes[g * gs : (g + 1) * gs, :]
        dot_g = jax.lax.dot_general(
            xg, cg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(
            jnp.float32
        )
        sg, zg = _sz_rows(s_ref, z_ref, k, g, g_blk, g8)
        if signed:
            zg = zg - 8.0  # s4r nibbles store code-8
        contrib = (dot_g - xsum * zg) * sg
        acc = contrib if acc is None else acc + contrib
    acc_ref[...] += acc
    o_ref[...] = acc_ref[...]


# u4 tiles cost 0.5 byte/cell + 1 byte/cell for the s8 cast temp. The
# round-2 per-phase profile put per-grid-step overhead at ~0.33 us, so
# fewer/bigger k-steps win until the double-buffered tile pair (+ s8 temp)
# crowds VMEM: 6.6M cells = 3.3 MB/tile, ~13 MB live with the cast temp —
# still inside the 16 MB scoped default for the standalone kernels.
_TILE_CELL_BUDGET_U4 = 6_600_000


def _pick_tiles_u4(K, N, gs_eff, per_channel, cell_budget=None, k_cap=1024):
    """Grouped path: K tiles are chosen FIRST, preferring K_BLK = 8*gs
    (then the scale/zero window rows are picked statically — _sz_rows'
    masked-select over an (8, NT) window costs ~0.4 us/step at 7B widths),
    trading N-tile width down within the cell budget. Fewer, bigger
    k-steps also amortise the ~0.33 us/grid-step overhead (round-2 phase
    profile). cell_budget/k_cap default to the standalone kernels' 16 MB
    scoped-VMEM-safe values; the whole-layer megakernel raises both
    (u8 row-pair tiles cost half the bytes, and it already runs under a
    100 MB limit — measured +1.7 tok/s at 7B)."""
    if cell_budget is None:
        cell_budget = _TILE_CELL_BUDGET_U4
    if per_channel:
        K_BLK = 512
        while K % K_BLK != 0 and K_BLK > 8:
            K_BLK //= 2
        if K % K_BLK != 0:
            K_BLK = K
        NT = N
        for cand in sorted(
            {d for d in range(128, N + 1, 128) if N % d == 0} | {N},
            reverse=True,
        ):
            if K_BLK * cand <= cell_budget:
                NT = cand
                break
        else:
            NT = 128 if N % 128 == 0 else N
        return K_BLK, NT

    kcands = [
        m for m in range(gs_eff, min(K, k_cap) + 1, gs_eff) if K % m == 0
    ]
    static8 = [m for m in kcands if (m // gs_eff) % 8 == 0]
    ncands = sorted(
        {d for d in range(128, N + 1, 128) if N % d == 0} | {N},
        reverse=True,
    )
    K_BLK = max(static8) if static8 else max(kcands, default=gs_eff)
    for cand in ncands:
        if K_BLK * cand <= cell_budget:
            return K_BLK, cand
    # N has no narrow-enough lane divisor: shrink K instead
    NT = ncands[-1] if ncands else N
    for m in sorted(kcands, reverse=True):
        if m * NT <= cell_budget:
            return m, NT
    return gs_eff, NT


def _pick_b_blk(B):
    """Batch tile for the large-B (prefill) grid: 256 rows covers the MXU
    and keeps out+acc VMEM modest; smaller B gets one b-step (padded to
    sublane granularity)."""
    if B >= 256:
        return 256, -(-B // 256) * 256
    B_pad = max(8, ((B + 7) // 8) * 8)
    return B_pad, B_pad


def _pick_tiles_u4_bigb(K, N, gs_eff, b_blk):
    """Prefill-regime tiles. Measured sweep at B=2048/7B shapes (v5e):
    K_BLK 2048 beats 1024 and NT ~2048-2752 beats narrower — wqkv
    (2048, 2048) 223.5 TOP/s vs the old (1024, 2048) 212.6; w13
    (2048, 2752) ~224 vs the old (1024, 1376) 150. The 24 MB budget
    admits those; the pallas_call raises its scoped-VMEM limit for the
    big-B grid (21-24 MB live tiles exceed the 16 MB default)."""
    kcands = [
        m for m in range(gs_eff, min(K, 2048) + 1, gs_eff) if K % m == 0
    ]
    static8 = [m for m in kcands if (m // gs_eff) % 8 == 0]
    K_BLK = max(static8) if static8 else max(kcands, default=gs_eff)
    budget = 24 * 2**20
    ncands = sorted(
        {d for d in range(128, N + 1, 128) if N % d == 0}, reverse=True
    )
    for nt in ncands:
        vmem = b_blk * nt * 8 + 3 * K_BLK * nt + 2 * b_blk * K_BLK
        if vmem <= budget:
            return K_BLK, nt
    return K_BLK, (ncands[-1] if ncands else N)


_BIG_B_CAP = 8192  # prefill rows (B x S); past this fall back to XLA


def _supports_pallas_u4(K, N, gs, B=1):
    gs_eff = gs if gs > 0 else K
    if K % gs_eff != 0 or N % 128 != 0:
        return False
    if B > 64:
        # large-B (prefill) path: grouped only, B-tiled grid
        if gs <= 0 or B > _BIG_B_CAP:
            return False
        b_blk, _ = _pick_b_blk(B)
        K_BLK, NT = _pick_tiles_u4_bigb(K, N, gs_eff, b_blk)
        return _lane_ok(K_BLK, K) and _lane_ok(NT, N)
    K_BLK, NT = _pick_tiles_u4(K, N, gs_eff, gs <= 0)
    return _lane_ok(K_BLK, K) and _lane_ok(NT, N)


def _quant_matmul_pallas_u4(x8, w4, scales, zeros, gs, N, interpret=False,
                            k_blk=None, nt=None, vmem_limit=None,
                            signed=False):
    """x8 (B, K) int8; w4 (K, N) uint4 OR (K//2, N) uint8 row-pairs
    (pack_u4_rows — the serving layout; the kernel bitcasts tiles back to
    u4 for free); scales/zeros (G, N) f32. Returns UNSCALED f32 (B, N)
    (caller applies the per-token act scale). k_blk/nt/vmem_limit
    override the tile heuristics (perf experiments)."""
    B, K = x8.shape
    rowpair = w4.dtype == jnp.uint8
    G = scales.shape[0]
    per_channel = gs <= 0
    gs_eff = gs if gs > 0 else K
    big_b = B > 64
    if big_b:
        B_BLK, B_pad = _pick_b_blk(B)
        K_BLK, NT = _pick_tiles_u4_bigb(K, N, gs_eff, B_BLK)
    else:
        K_BLK, NT = _pick_tiles_u4(K, N, gs_eff, per_channel)
        B_pad = max(8, ((B + 7) // 8) * 8)
        B_BLK = B_pad
    if k_blk:
        K_BLK = k_blk
    if nt:
        NT = nt
    if per_channel:
        G_BLK, gs_kernel = 1, K_BLK
    else:
        G_BLK, gs_kernel = K_BLK // gs_eff, gs_eff

    if B_pad != B:
        x8 = jnp.pad(x8, ((0, B_pad - B), (0, 0)))

    # f32 and bf16 qparams stream natively (bf16 = half the scale bytes;
    # _sz_rows upcasts selected rows in-kernel); anything else is cast once
    if scales.dtype in (jnp.float32, jnp.bfloat16):
        s2d, z2d = scales, zeros.astype(scales.dtype)
    else:
        s2d, z2d = scales.astype(jnp.float32), zeros.astype(jnp.float32)
    G8 = _sz_layout(G, G_BLK, s2d.dtype)
    if big_b:
        # prefill regime: tile the batch in the grid too — out/acc blocks
        # stay (B_BLK, NT) regardless of B, so 2048-row admission chunks
        # run the same fused-dequant kernel the decode path uses
        s_index = lambda b, i, k: ((k * G_BLK) // G8, i)
        grid = (B_pad // B_BLK, N // NT, K // K_BLK)
        in_specs = [
            pl.BlockSpec((B_BLK, K_BLK), lambda b, i, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K_BLK // 2 if rowpair else K_BLK, NT),
                         lambda b, i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G8, NT), s_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((G8, NT), s_index, memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec(
            (B_BLK, NT), lambda b, i, k: (b, i), memory_space=pltpu.VMEM
        )
        semantics = ("parallel", "parallel", "arbitrary")
        k_axis = 2
    else:
        s_index = lambda i, k: ((k * G_BLK) // G8, i)
        grid = (N // NT, K // K_BLK)
        in_specs = [
            pl.BlockSpec((B_pad, K_BLK), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            # row-pair u8 arrays have K//2 sublanes; the block INDEX is in
            # block units, so only the block shape halves
            pl.BlockSpec((K_BLK // 2 if rowpair else K_BLK, NT),
                         lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G8, NT), s_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((G8, NT), s_index, memory_space=pltpu.VMEM),
        ]
        out_specs = pl.BlockSpec(
            (B_pad, NT), lambda i, k: (0, i), memory_space=pltpu.VMEM
        )
        semantics = ("parallel", "arbitrary")
        k_axis = 1
    out = pl.pallas_call(
        functools.partial(_qmm_u4_kernel, gs=gs_kernel, g_blk=G_BLK, g8=G8,
                          signed=signed, k_axis=k_axis),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((B_pad, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_BLK, NT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=(vmem_limit if vmem_limit
                              else (64 * 2**20 if big_b else None)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * K * N,
            bytes_accessed=K * N // 2 + G * N * 8 + B_pad * K + B_pad * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, w4, s2d, z2d)
    return out[:B]


# ---- stacked (layer-indexed) u4 kernel --------------------------------------
#
# Scan-over-layers decode needs per-layer weight selection WITHOUT copying:
# passing stacked weights as lax.scan xs makes XLA dynamic-slice (i.e. copy)
# every layer's packed weights each token (round-1: 140 -> 73 tok/s). Here
# the layer index rides a scalar-prefetch operand and the BlockSpec
# index_map addresses the stacked (L, K, N) array directly in HBM — the
# kernel DMAs exactly layer li's tiles, zero copies, and the scan body
# closes over the weights as loop invariants (VERDICT #7).


def _qmm_u4_stacked_kernel(li_ref, x_ref, w_ref, s_ref, z_ref, o_ref,
                           acc_ref, *, gs, g_blk, g8, signed=False,
                           k_axis=1):
    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]  # (B, K_BLK) int8
    codes = _u4_tile(w_ref[0], signed).astype(jnp.int8)  # (K_BLK, NT)
    acc = None
    for g in range(g_blk):
        xg = xb[:, g * gs : (g + 1) * gs]
        cg = codes[g * gs : (g + 1) * gs, :]
        dot_g = jax.lax.dot_general(
            xg, cg,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(
            jnp.float32
        )
        sg, zg = _sz_rows(s_ref, z_ref, k, g, g_blk, g8, lead=(0,))
        if signed:
            zg = zg - 8.0  # s4r nibbles store code-8
        contrib = (dot_g - xsum * zg) * sg
        acc = contrib if acc is None else acc + contrib
    acc_ref[...] += acc
    o_ref[...] = acc_ref[...]


def _quant_matmul_pallas_u4_stacked(x8, w4s, s4, z4, li, gs, N,
                                    interpret=False, signed=False):
    """x8 (B, K) int8; w4s (L, K, N) uint4 or (L, K//2, N) uint8
    row-pairs (pack_u4_rows / pack_s4_rows with signed=True); s4/z4
    (L, G, N) f32; li scalar int32 layer index. Returns UNSCALED f32
    (B, N)."""
    B, K = x8.shape
    rowpair = w4s.dtype == jnp.uint8
    Lk = w4s.shape[0]
    G = s4.shape[1]
    per_channel = gs <= 0
    gs_eff = gs if gs > 0 else K
    big_b = B > 64
    if big_b:
        B_BLK, B_pad = _pick_b_blk(B)
        K_BLK, NT = _pick_tiles_u4_bigb(K, N, gs_eff, B_BLK)
    else:
        K_BLK, NT = _pick_tiles_u4(K, N, gs_eff, per_channel)
        B_pad = max(8, ((B + 7) // 8) * 8)
        B_BLK = B_pad
    if per_channel:
        G_BLK, gs_kernel = 1, K_BLK
    else:
        G_BLK, gs_kernel = K_BLK // gs_eff, gs_eff
    G8 = _sz_layout(G, G_BLK, s4.dtype)

    if B_pad != B:
        x8 = jnp.pad(x8, ((0, B_pad - B), (0, 0)))

    if big_b:
        # prefill regime (flash scanned prefill over stacked layers):
        # B-tiled grid, weights still indexed in place in HBM via the
        # prefetched layer index — no per-layer copies, fused dequant
        s_index = lambda b, i, k, li_ref: (li_ref[0], (k * G_BLK) // G8, i)
        grid = (B_pad // B_BLK, N // NT, K // K_BLK)
        in_specs = [
            pl.BlockSpec((B_BLK, K_BLK), lambda b, i, k, li_ref: (b, k)),
            pl.BlockSpec((1, K_BLK // 2 if rowpair else K_BLK, NT),
                         lambda b, i, k, li_ref: (li_ref[0], k, i)),
            pl.BlockSpec((1, G8, NT), s_index),
            pl.BlockSpec((1, G8, NT), s_index),
        ]
        out_specs = pl.BlockSpec((B_BLK, NT), lambda b, i, k, li_ref: (b, i))
        semantics = ("parallel", "parallel", "arbitrary")
        k_axis = 2
    else:
        s_index = lambda i, k, li_ref: (li_ref[0], (k * G_BLK) // G8, i)
        grid = (N // NT, K // K_BLK)
        in_specs = [
            pl.BlockSpec((B_pad, K_BLK), lambda i, k, li_ref: (0, k)),
            pl.BlockSpec((1, K_BLK // 2 if rowpair else K_BLK, NT),
                         lambda i, k, li_ref: (li_ref[0], k, i)),
            pl.BlockSpec((1, G8, NT), s_index),
            pl.BlockSpec((1, G8, NT), s_index),
        ]
        out_specs = pl.BlockSpec((B_pad, NT), lambda i, k, li_ref: (0, i))
        semantics = ("parallel", "arbitrary")
        k_axis = 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((B_BLK, NT), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _qmm_u4_stacked_kernel, gs=gs_kernel, g_blk=G_BLK, g8=G8,
            signed=signed, k_axis=k_axis,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B_pad, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
            vmem_limit_bytes=64 * 2**20 if big_b else None,
        ),
        interpret=interpret,
    )(jnp.asarray([li], jnp.int32), x8, w4s, s4, z4)
    return out[:B]


def quant_matmul_a8_stacked(x, packed, scales, zeros, li, bits, groupsize, N,
                            interpret=False):
    """Layer-indexed W4A8 matmul over stacked weights: packed leaves carry a
    leading layer axis; ``li`` (traced int32) selects the layer. The Pallas
    path indexes HBM in place (scalar prefetch); the fallback
    dynamic-slices one layer (a copy — CPU/irregular shapes only)."""
    from sparsebit_tpu.ops.int8_matmul import tokenwise_quant

    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    xq, x_scale = tokenwise_quant(x2.astype(jnp.float32))
    Lk = scales.shape[0]
    G = scales.shape[1]
    use_pallas = (
        ("s4r" in packed or "u4r" in packed or "u4" in packed)
        and _supports_pallas_u4(K, N, groupsize, xq.shape[0])
        and (interpret or jax.default_backend() == "tpu")
    )
    if use_pallas:
        w_arr = packed.get("s4r", packed.get("u4r", packed.get("u4")))
        out = _quant_matmul_pallas_u4_stacked(
            xq, w_arr, scales, zeros,
            li, groupsize, N, interpret=interpret,
            signed="s4r" in packed,
        )
    else:
        packed_l = {k2: v2[li] for k2, v2 in packed.items() if k2 != "u4"}
        W = dequant_weights(packed_l, scales[li], zeros[li], bits, N, groupsize)
        out = jnp.dot(
            xq.astype(jnp.float32), W, preferred_element_type=jnp.float32
        )
    return (out * x_scale).reshape(lead + (N,))


# ---- W4A8 kernel: int8 activations, codes stay int8 into the MXU -----------


def _qmm_a8_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, bits, gs, g_blk):
    """Same group-factored math as _qmm_kernel but on the int8 MXU:

        out_g = (x8_g @ C_g - sum(x8_g) * z_g) * s_g        (epilogue f32)

    The unpacked codes never leave int8, so the per-element VPU work is
    just shift+mask (the f32-cast variant measured VPU-bound at ~20x the
    DMA time on v5e; this is the speed-of-light path for decode).
    Caller rescales by the per-token activation scale.
    """
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]  # (B, K_BLK) int8
    p = 8 // bits if bits != 8 else 1
    mask = (1 << bits) - 1
    # Mosaic cannot legalize u8 shifts (arith.shrui); shift in i32.
    # 8-bit codes [0,255] don't fit s8: shift by -128 and fold into z.
    zshift = 128 if bits == 8 else 0
    wb = w_ref[...].astype(jnp.int32)  # (K_BLK, NT)
    for j in range(p):
        if bits == 8:
            codes = (wb - zshift).astype(jnp.int8)
        else:
            codes = ((wb >> (j * bits)) & mask).astype(jnp.int8)
        acc = None
        for g in range(g_blk):
            xg = xb[:, g * gs : (g + 1) * gs]
            cg = codes[g * gs : (g + 1) * gs, :]
            dot_g = jax.lax.dot_general(
                xg, cg,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True).astype(
                jnp.float32
            )
            z_eff = z_ref[g, j, :][None, :] - zshift
            contrib = (dot_g - xsum * z_eff) * s_ref[g, j, :][None, :]
            acc = contrib if acc is None else acc + contrib
        acc_ref[:, j, :] += acc
    o_ref[...] = acc_ref[...]


def _quant_matmul_pallas_a8(x8, w, scales, zeros, bits, gs, N, k_blk=None, nt=None):
    """x8 (B, K) int8 (per-token pre-quantized); returns UNSCALED f32 out
    (caller multiplies by the per-token activation scale)."""
    B, K = x8.shape
    p = 8 // bits if bits != 8 else 1
    NP = N // p
    G = scales.shape[0]
    per_channel = gs <= 0
    gs_eff = gs if gs > 0 else K
    K_BLK, NT = _pick_tiles(K, NP, gs_eff, per_channel)
    if k_blk:
        K_BLK = k_blk
    if nt:
        NT = nt
    if per_channel:
        G_BLK, gs_kernel = 1, K_BLK
        s_index = lambda i, k: (0, 0, i)
    else:
        G_BLK, gs_kernel = K_BLK // gs_eff, gs_eff
        s_index = lambda i, k: (k, 0, i)

    B_pad = max(8, ((B + 7) // 8) * 8)
    if B_pad != B:
        x8 = jnp.pad(x8, ((0, B_pad - B), (0, 0)))

    s3 = scales.reshape(G, p, NP).astype(jnp.float32)
    z3 = zeros.reshape(G, p, NP).astype(jnp.float32)
    grid = (NP // NT, K // K_BLK)
    out = pl.pallas_call(
        functools.partial(_qmm_a8_kernel, bits=bits, gs=gs_kernel, g_blk=G_BLK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((B_pad, K_BLK), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((K_BLK, NT), lambda i, k: (k, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, p, NT), s_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((G_BLK, p, NT), s_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B_pad, p, NT), lambda i, k: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B_pad, p, NP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_pad, p, NT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * K * N,
            bytes_accessed=K * NP + G * N * 8 + B_pad * K + B_pad * N * 4,
            transcendentals=0,
        ),
    )(x8, w, s3, z3)
    return out.reshape(B_pad, N)[:B]


def _a8_groupdot_int8(xq, packed, scales, zeros, bits, gs, N):
    """Large-B (prefill) fallback on the INT8 MXU: lax.scan over weight
    groups, each step an exact s8 x s8 -> s32 dot over one (gs, N) code
    block, with the Pallas kernels' group-factored f32 epilogue
    out = sum_g s_g * (dot_g - z_g * rowsum_g). Equals the f32 densify
    dot up to f32 summation order, runs at the int8 MXU rate (~8x the
    f32 dot on v5e), and never materialises the f32 weight — this is
    what the 2048-token flash-prefill path hits for every packed matmul
    (B = B x S rows > the decode kernels' 64-row cap)."""
    codes = unpack_columns(packed, bits, N)
    K = codes.shape[0]
    gs_eff = gs if gs > 0 else K
    G = K // gs_eff
    s = scales.astype(jnp.float32)
    z = zeros.astype(jnp.float32)
    if bits == 8:
        # uint8 codes don't fit int8 — recenter codes AND zeros by 128
        # ((c - 128) - (z - 128) == c - z)
        codes = (codes.astype(jnp.int32) - 128).astype(jnp.int8)
        z = z - 128.0
    else:
        codes = codes.astype(jnp.int8)
    B = xq.shape[0]
    codes_g = codes.reshape(G, gs_eff, N)
    xq_g = jnp.moveaxis(xq.reshape(B, G, gs_eff), 1, 0)  # (G, B, gs)
    rowsum = jnp.sum(xq_g.astype(jnp.int32), axis=-1)  # (G, B)

    def body(acc, args):
        c_g, x_g, rs_g, s_g, z_g = args
        d = jax.lax.dot(x_g, c_g, preferred_element_type=jnp.int32)
        acc = acc + s_g[None, :] * (
            d.astype(jnp.float32)
            - z_g[None, :] * rs_g[:, None].astype(jnp.float32)
        )
        return acc, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((B, N), jnp.float32), (codes_g, xq_g, rowsum, s, z)
    )
    return acc


def quant_matmul_a8(x, packed, scales, zeros, bits, groupsize, N):
    """W4A8 matmul: per-token dynamic int8 activations + packed sub-byte
    weights on the int8 MXU. ~accuracy of LLM.int8-style per-token quant;
    use for decode serving (the f32 path remains the exact oracle)."""
    from sparsebit_tpu.ops.int8_matmul import tokenwise_quant

    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    xq, x_scale = tokenwise_quant(x2.astype(jnp.float32))
    if bits == 4 and "u4p" in packed and "u4" not in packed:
        # nibble-pair serving layout (QuantLinear.with_u4_pairs, possibly
        # drop_fold-ed so no "w" container exists): the u4 kernel view is
        # a free in-jit bitcast. Keep "u4p" so the dense fallback's
        # unpack_columns still has a jit-boundary-crossing container.
        from sparsebit_tpu.ops.packing import u4_from_pairs

        packed = dict(packed)
        packed["u4"] = u4_from_pairs(packed["u4p"])
    if (
        ("s4r" in packed or "u4r" in packed or "u4" in packed)
        and _supports_pallas_u4(K, N, groupsize, xq.shape[0])
        and jax.default_backend() == "tpu"
    ):
        # prefer the u8 row-pair containers (with_s4_rows/with_u4_rows):
        # they need no top-level conversion at all (kernel-side bitcast)
        out = _quant_matmul_pallas_u4(
            xq, packed.get("s4r", packed.get("u4r", packed.get("u4"))),
            scales, zeros, groupsize, N, signed="s4r" in packed,
        )
    elif (
        (bits == 3 or "w" in packed)
        and _supports_pallas(bits, K, N, groupsize, xq.shape[0])
        and jax.default_backend() == "tpu"
    ):
        if bits == 3:
            out = _quant_matmul_pallas_3bit(
                xq, packed, scales, zeros, groupsize, N, a8=True
            )
        else:
            out = _quant_matmul_pallas_a8(
                xq, packed["w"], scales, zeros, bits, groupsize, N
            )
    elif jax.default_backend() == "tpu" and K % max(groupsize, 1) == 0:
        # past the kernels' 64-row cap (prefill): int8 MXU group dots
        out = _a8_groupdot_int8(xq, packed, scales, zeros, bits, groupsize, N)
    else:
        # x8 @ dequant(W) == the kernel's int-dot + epilogue, exactly
        # (CPU oracle; also irregular K/groupsize)
        W = dequant_weights(packed, scales, zeros, bits, N, groupsize)
        out = jnp.dot(
            xq.astype(jnp.float32), W, preferred_element_type=jnp.float32
        )
    return (out * x_scale).reshape(lead + (N,))


# ---- public op with custom_vjp ----------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def quant_matmul(x, packed, scales, zeros, bits, groupsize, N, impl="auto"):
    """x (..., K) @ dequant(packed) -> (..., N).

    packed: dict from ops.packing.pack_columns (values uint8).
    scales/zeros: (G, N) with G = K//groupsize (or (1, N) per-channel).
    impl: "auto" | "pallas" | "xla".
    """
    return _qmm_fwd_impl(x, packed, scales, zeros, bits, groupsize, N, impl)


def _qmm_fwd_impl(x, packed, scales, zeros, bits, groupsize, N, impl):
    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    has_kernel_container = bits == 3 or "w" in packed
    use_pallas = has_kernel_container and (
        impl == "pallas"
        or (
            impl == "auto"
            and _supports_pallas(bits, K, N, groupsize, x2.shape[0])
            and jax.default_backend() == "tpu"
        )
    )
    if use_pallas and bits == 3:
        out = _quant_matmul_pallas_3bit(x2, packed, scales, zeros, groupsize, N)
    elif use_pallas:
        out = _quant_matmul_pallas(
            x2, packed["w"], scales, zeros, bits, groupsize, N
        )
    else:
        W = dequant_weights(packed, scales, zeros, bits, N, groupsize)
        out = jnp.dot(
            x2.astype(jnp.float32), W, preferred_element_type=jnp.float32
        )
    return out.reshape(lead + (N,))


def _qmm_fwd(x, packed, scales, zeros, bits, groupsize, N, impl):
    out = _qmm_fwd_impl(x, packed, scales, zeros, bits, groupsize, N, impl)
    return out, (packed, scales, zeros, x.shape, jnp.zeros((0,), x.dtype))


def _qmm_bwd(bits, groupsize, N, impl, res, g):
    packed, scales, zeros, x_shape, x_proto = res
    x_dtype = x_proto.dtype
    K = x_shape[-1]
    W = dequant_weights(packed, scales, zeros, bits, N, groupsize)
    g2 = g.reshape(-1, N).astype(jnp.float32)
    dx = (
        jnp.dot(g2, W.T, preferred_element_type=jnp.float32)
        .reshape(x_shape)
        .astype(x_dtype)  # cotangent must match the primal dtype
    )
    from sparsebit_tpu.ops.int8_matmul import zero_cotangent

    zero_packed = jax.tree.map(zero_cotangent, packed)
    return dx, zero_packed, jnp.zeros_like(scales), jnp.zeros_like(zeros)


quant_matmul.defvjp(_qmm_fwd, _qmm_bwd)


# ---- trainable variant: int8 backward gemm (reference qmatmul.py:45-69) -----


def prepare_a8_backward(packed, scales, zeros, bits, N, groupsize):
    """Per-input-channel int8 requantization of W^T for the backward gemm.

    Reference `prepare_backward_scales` (alpaca-qlora/utils.py:230-255)
    computes this once when the model enters training; same here — call
    inside jit at train-prep, store the (N, K) int8 + (1, K) f32 results
    as frozen pytree leaves. Returns (bwd_wq, bwd_scale)."""
    W = dequant_weights(packed, scales, zeros, bits, N, groupsize)  # (K, N)
    wt = W.T  # (N, K)
    absmax = jnp.max(jnp.abs(wt), axis=0, keepdims=True)  # (1, K)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wt / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def quant_matmul_a8bwd(x, packed, scales, zeros, bwd_wq, bwd_scale,
                       bits, groupsize, N, impl="auto"):
    """quant_matmul whose BACKWARD runs on the int8 MXU: dx =
    tokenwise-int8(g) @ bwd_wq, rescaled by the grad's per-token scale and
    the weight's per-input-channel scale — end-to-end int8 QLoRA training
    cost, matching the reference backward (qmatmul.py:45-69 →
    tokenwise_quant.cu + unpack_backward + int8gemm) instead of
    materialising the f32 dequant weight per step."""
    return _qmm_fwd_impl(x, packed, scales, zeros, bits, groupsize, N, impl)


def _qmm_a8bwd_fwd(x, packed, scales, zeros, bwd_wq, bwd_scale,
                   bits, groupsize, N, impl):
    out = _qmm_fwd_impl(x, packed, scales, zeros, bits, groupsize, N, impl)
    return out, (bwd_wq, bwd_scale, x.shape, jnp.zeros((0,), x.dtype),
                 packed, scales, zeros)


def _qmm_a8bwd_bwd(bits, groupsize, N, impl, res, g):
    from sparsebit_tpu.ops.int8_matmul import (
        int8_gemm,
        tokenwise_quant,
        zero_cotangent,
    )

    bwd_wq, bwd_scale, x_shape, x_proto, packed, scales, zeros = res
    g2 = g.reshape(-1, N)
    gq, g_scale = tokenwise_quant(g2)
    dx = (
        (int8_gemm(gq, bwd_wq).astype(jnp.float32) * g_scale * bwd_scale)
        .reshape(x_shape)
        .astype(x_proto.dtype)
    )
    zero_packed = jax.tree.map(zero_cotangent, packed)
    return (dx, zero_packed, jnp.zeros_like(scales), jnp.zeros_like(zeros),
            zero_cotangent(bwd_wq), jnp.zeros_like(bwd_scale))


quant_matmul_a8bwd.defvjp(_qmm_a8bwd_fwd, _qmm_a8bwd_bwd)
