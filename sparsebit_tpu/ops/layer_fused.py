"""Decoder-layer decode megakernel: ONE launch per layer — or, via
``fused_decoder_layers``, ONE launch for the whole backbone (grid
``(n_layers, phases)`` with the activation row carried in VMEM scratch
between layers, so the per-launch pipeline fill and dispatch gap are paid
once per token instead of once per layer).

    x' = x + Wo(attn(rope(Wqkv(rms_norm(x))), cache))          (attn half)
    out = x' + W2(glu(W13(rms_norm(x'))))                      (ffn half)

with the INT8 KV cache in the round-5 serving layout:

- k/v stay (L, B, S, Hkv, D) int8 in HBM (paged: (L, n_blocks, block,
  Hkv, D)); the kernel RESHAPES the HBM ref to (.., S, Hkv*D) for the
  slab loads (free — HBM is linear), so the attention dots consume FLAT
  (S, Hkv*D) slabs with no sublane->lane relayout (the ~209 us/layer
  B=32 residual of round 4, exp23/exp30), while the current token's
  rows commit IN-KERNEL as (Hkv, D) DMA writes at the untiled S index
  (the round-4 pattern — aliased outputs, no XLA-side commit cost).
- scale slabs are bf16 tight-head TRANSPOSED (L, B, Hkv, S) — 8x fewer
  bytes than round 4's f32 Hp=128 lane padding, which capped
  single-chip batch at 32 (VERDICT r4 #2/#3). Mosaic rejects EVERY
  1-row store/DMA a bf16 row commit would need (probe_row_writes:
  only f32 (S,128) rows and int8 (Hkv,D)-at-untiled-S blocks pass), so
  fresh scale rows are emitted as small outputs and committed OUTSIDE
  by the wrapper (one advanced-index scatter per buffer — the scale
  buffers are ~100x smaller than k/v, the scatter's operand copy is
  noise; scattering the multi-GB k/v buffers this way copied 4x1.6
  ms/step, and per-row DUS chains paid this fabric's per-dependency
  latency x B).

Because the in-VMEM slabs cannot be patched with the current token's
row either (1-row dynamic-sublane stores rejected), the attention
CORRECTS each row's ``length`` column from the fresh-rows scratch
(ops/attention._flat_attention_rows_int8 — integer-exact vs a patched
formulation). The HBM row writes may race the slab loads of LATER
grid steps in the same layer — benign, that column is corrected from
scratch regardless of which bytes the load saw.

Why one launch: decode on this fabric pays a fixed per-dispatch turnaround
(~30 us measured — docs/perf_notes.md) and on real TPUs every kernel
boundary round-trips activations through HBM. Per layer the unfused path
is 4 matmul launches + the attention kernel + XLA glue; this kernel walks
ONE 1-D grid through five phases —

    [Wqkv tiles] [B x head-group attention steps] [Wo tiles]
    [W13 tiles] [W2 tiles]

— `pl.when`-gated on the step index, with every intermediate (normalized
activations, int8 quantizations, the qkv row, attention output, the (B,2F)
W13 output) living in VMEM scratch. HBM traffic is the streamed u4 weight
tiles (the speed-of-light term), the K/V slabs, and one (B, dim) row in
and out.

The W4A8 math matches quant_matmul_a8 / ffn_fused exactly; the KV row
quantization (per-head INT8, bf16-rounded scales) matches
kv_cache._quant_heads. Attention itself runs INT8 end-to-end (round 4):
a per-row-quantized block-diagonal q8 dots the int8 K slab directly and
the scale-folded probabilities are int8-quantized for the value mix
(ops/attention._flat_attention_rows_int8) — the bf16 formulation's
int8->bf16 slab casts were the dominant batched attention cost
(exp22/exp23), and the B=1 and batched paths are row-exact against each
other (cross-engine token parity). Scale/zero and norm operands
use the default-tiled window layout of quant_matmul._sz_layout — unit-
sublane blocks would retile the whole arrays inside the decode loop.

Layer-stacked weights (L, K, N) ride the scalar-prefetched layer index.
Reference: one CUDA matvec launch per linear + eager attention
(cuda_kernel_4bit.cu, llama_wrapper.py); this is the TPU answer.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparsebit_tpu.ops.attention import (
    _flat_attention_rows_int8,
    _head_sel,
)
from sparsebit_tpu.ops.quant_matmul import (
    _lane_ok,
    _pick_tiles_u4,
    _sz_layout,
    _sz_rows,
    _u4_tile,
)

# the megakernel runs under a raised (100 MB) scoped-VMEM limit and its u8
# row-pair tiles cost half the bytes of the standalone kernels' assumption,
# so it affords double the tile cells and 2x K rows: fewer, bigger k-steps
# (the per-step un-hidden epilogue/cast was ~1.3 us on 7B wqkv tiles;
# measured +1.7 tok/s end-to-end). Going bigger LOSES: whole-K 4096-row
# tiles (25.3M cells, 11 steps/layer vs 26) measured -2% end-to-end —
# past ~13M cells the huge double-buffered windows crowd VMEM and the
# per-phase pipeline has too few steps to hide the first-tile fill.
# The env knobs exist for hardware sweeps (experiments/), not production.
import os as _os

_FUSED_TILE_BUDGET = int(_os.environ.get("SBT_FUSED_BUDGET", 13_200_000))
_FUSED_K_CAP = int(_os.environ.get("SBT_FUSED_KCAP", 2048))


def _fused_tiles(K, N, gs):
    return _pick_tiles_u4(
        K, N, gs, False, cell_budget=_FUSED_TILE_BUDGET, k_cap=_FUSED_K_CAP
    )


def _kb_of(w_ref):
    """Logical K rows of a weight tile ref: u8 row-pair tiles
    (pack_u4_rows) hold KB//2 sublanes."""
    return w_ref.shape[-2] * (2 if w_ref.dtype == jnp.uint8 else 1)


def _norm_row(nw_ref, li, eps, xf):
    """rms_norm(xf) * norm_row(li) — norm stacks are 8-row layer windows;
    the row is picked with where+reduce (a one-hot DOT would propagate
    0 x NaN from out-of-bounds garbage rows when L % 8 != 0)."""
    blk = nw_ref[...]
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, blk.shape, 0)
        == li % blk.shape[0]
    )
    nw = jnp.sum(jnp.where(sel, blk, 0.0), axis=0, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True)
    return xf * jax.lax.rsqrt(var + eps) * nw


def _quant_rows(x, eps=1e-8):
    """(B, K) f32 -> int8 codes + (B, 1) f32 scale (tokenwise_quant)."""
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, eps) / 127.0
    q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return q, scale


def _mm_step(xq_ref, w_ref, s_ref, z_ref, acc_ref, k, col_off, *, gs, GB, G8,
             signed=False):
    """One W4A8 k-step: int8 dot + group-factored epilogue into acc.

    ``w_ref`` is either a (1, KB', NT) BlockSpec window or a (KB', NT)
    VMEM ring buffer (manual weight streaming)."""
    wt = w_ref[0] if len(w_ref.shape) == 3 else w_ref[...]
    codes = _u4_tile(wt, signed).astype(jnp.int8)  # (KB, NT)
    KB = codes.shape[-2]
    xb = xq_ref[:, pl.ds(col_off, KB)]  # (B, KB) int8
    acc = None
    for g in range(GB):
        xg = xb[:, g * gs: (g + 1) * gs]
        cg = codes[g * gs: (g + 1) * gs, :]
        dot_g = jax.lax.dot_general(
            xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1,
                       keepdims=True).astype(jnp.float32)
        sg, zg = _sz_rows(s_ref, z_ref, k, g, GB, G8, lead=(0,))
        if signed:
            zg = zg - 8.0  # s4r nibbles store code-8
        contrib = (dot_g - xsum * zg) * sg
        acc = contrib if acc is None else acc + contrib
    acc_ref[...] += acc


def _mm_step_planes(xq_ref, w_ref, s_ref, z_ref, acc_ref, k, col_off, *,
                    gs, GB, G8, bits, NP):
    """One TRUE-width sub-4-bit k-step: ``w_ref`` is a (1, KB, W) plane
    window (pack_planes_serving: 3-bit [low2|high1] concat, W = 3N/8;
    2-bit fold array, W = N/4) streamed at the real bit width. Tiles are
    FULL-N (plane p covers output columns [p*NP, (p+1)*NP), so column
    tiling would have to align to N/8 anyway); the unpack is shift/mask
    at i32 lane granularity (VPU) — the bytes-vs-unpack tradeoff against
    the free-bitcast nibble container is measured, not assumed
    (docs/perf_notes.md round 4). Epilogue matches _mm_step exactly
    (unsigned codes, so no zshift)."""
    wt = w_ref[0] if len(w_ref.shape) == 3 else w_ref[...]
    KB = wt.shape[-2]
    xb = xq_ref[:, pl.ds(col_off, KB)]  # (B, KB) int8
    w32 = wt.astype(jnp.int32)
    n_planes = 8 if bits == 3 else 4
    if bits == 3:
        lo32 = w32[:, : 2 * NP]   # (KB, N/4)
        hi32 = w32[:, 2 * NP:]    # (KB, N/8)
    for j in range(n_planes):
        if bits == 3:
            jl, half = j // 2, j % 2
            codes_i = (
                (lo32[:, half * NP:(half + 1) * NP] >> (2 * jl)) & 3
            ) | (((hi32 >> j) & 1) << 2)
        else:
            codes_i = (w32 >> (bits * j)) & ((1 << bits) - 1)
        codes = codes_i.astype(jnp.int8)  # (KB, NP)
        acc = None
        for g in range(GB):
            xg = xb[:, g * gs: (g + 1) * gs]
            cg = codes[g * gs: (g + 1) * gs, :]
            dot_g = jax.lax.dot_general(
                xg, cg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1,
                           keepdims=True).astype(jnp.float32)
            sg, zg = _sz_rows(s_ref, z_ref, k, g, GB, G8, lead=(0,))
            sgj = sg[:, j * NP:(j + 1) * NP]
            zgj = zg[:, j * NP:(j + 1) * NP]
            contrib = (dot_g - xsum * zgj) * sgj
            acc = contrib if acc is None else acc + contrib
        acc_ref[:, j * NP:(j + 1) * NP] += acc


def _layer_kernel(
    li_ref, len_ref, bt_ref,
    x_ref, an_ref, fn_ref, cosf_ref, sinf_ref,
    wq_ref, sq_ref, zq_ref, wo_ref, so_ref, zo_ref,
    w13_ref, s13_ref, z13_ref, w2_ref, s2_ref, z2_ref,
    k_hbm5, v_hbm5, ks_hbm, vs_hbm,
    o_ref, ksrows_ref, vsrows_ref, ko_hbm, vo_hbm, ks_thru, vs_thru,
    xcur, xq8, xs, qkv, aout, a8, as_, xmid, h1, g8buf, gs8,
    accq, acco, acc13, acc2,
    kslab, vslab, ks_slab, vs_slab,
    krow3, vrow3, kflat, vflat, krow1, vrow1,
    *tail, B, Hq, Hkv, D, dim, F, gs, eps, n_rep, n_groups,
    k1_t, n1_t, G81, k3_t, G83, k4_t, n4_t, G84, k5_t, G85,
    debug_out=None, prefetch_slabs=False, paged=False, sc=128,
    signed=False, stream=False, stream_ns=(2, 2, 2, 2), batched=False,
    gb=0, s_full=0, s_wmax=0, n_sb=1, wbits=4, np_t=(0, 0, 0, 0),
    _ablate="",
):
    # trailing scratch: [int8 block-diag Q + its row scales (batched
    # only)], sems, [stream ring bufs + wsem (stream only)]
    if batched:
        (qbd8, qsc), tail = tail[:2], tail[2:]
    sems, stream_scr = tail[0], tail[1:]
    # grid is (n_grid_layers, T): the leading dimension walks whole decoder
    # layers with the activation carried in VMEM scratch (xcur) — one
    # launch covers the whole backbone, so the per-launch pipeline fill
    # (~15 us: first tile of every phase + scalar prefetch) is paid once
    # per TOKEN instead of once per layer, and weight DMA streams across
    # layer boundaries.
    l = pl.program_id(0)
    s = pl.program_id(1)
    li0 = li_ref[0] + l       # weight-stack layer index
    lic = li_ref[1] + l       # CACHE layer index (differs under the
    # segmented mixed-precision scan: per-segment weight stacks walk from
    # 0 while the cache stack is whole-model)
    plane = wbits in (2, 3)

    def _mm(xq, w_ref_, s_ref_, z_ref_, acc_, k_, G8_, npx):
        """One matmul k-step: row-pair 4-bit (free bitcast) or TRUE-width
        2/3-bit plane window (_mm_step_planes)."""
        if plane:
            KBp = w_ref_.shape[-2]
            _mm_step_planes(
                xq, w_ref_, s_ref_, z_ref_, acc_, k_,
                pl.multiple_of(k_ * KBp, KBp), gs=gs, GB=KBp // gs,
                G8=G8_, bits=wbits, NP=npx)
        else:
            KBx = _kb_of(w_ref_)
            _mm_step(xq, w_ref_, s_ref_, z_ref_, acc_, k_,
                     pl.multiple_of(k_ * KBx, KBx), gs=gs, GB=KBx // gs,
                     G8=G8_, signed=signed)

    @pl.when((l == 0) & (s == 0))
    def _():
        xcur[...] = x_ref[...].astype(jnp.float32)
    # the cache length; identical to kslab.shape[-2] in both modes today
    # (kept as a kwarg so slab shapes can diverge from S again)
    S = s_full if batched else kslab.shape[-2]
    HD = Hq * D
    KVD = Hkv * D
    # FLAT read views of the 5-D caches: an HBM ref reshape is free (HBM
    # is linear), so slab loads land (sc, Hkv*D) chunks with no relayout
    # while the row WRITES below go through the 5-D refs at the untiled
    # S index (the only 1-row write shape Mosaic accepts for int8)
    k_hbm = k_hbm5.reshape(k_hbm5.shape[:-2] + (KVD,))
    v_hbm = v_hbm5.reshape(v_hbm5.shape[:-2] + (KVD,))
    T1 = n1_t * k1_t
    n_bgroups = -(-B // gb) if batched else 0
    T2 = (1 + n_bgroups) if batched else B * n_groups
    T3 = k3_t
    T4 = n4_t * k4_t
    T5 = k5_t
    hg = Hkv // n_groups

    # ---- manual weight streaming (serving row-pair layout) ------------------
    # Pallas' automatic BlockSpec pipelining issues a window's fetch gated
    # on the ONE preceding grid step, so every multi-MB first tile at a
    # phase/layer boundary only gets ~one step of overlap — measured ~20
    # us/layer of boundary stalls at 7B. Here the weights stay whole in
    # HBM and each matmul operand owns TWO VMEM tile buffers driven by a
    # global tile counter g = l * TX + t: consuming tile g immediately
    # issues the copy for tile g+2 into the buffer just freed. Within a
    # phase that is a 2-step lead; when g+2 wraps to the next layer the
    # copy is issued a WHOLE LAYER early (the ring is idle outside its
    # phase), so layer-boundary fills ride under other phases' compute.
    # The DMA engine completes copies out of order; each buffer's
    # semaphore serialises exactly its own slot.
    if stream:
        ns_wq, ns_wo, ns_w13, ns_w2 = stream_ns
        bufs_all = stream_scr[:-1]
        wsem = stream_scr[-1]
        o0, o1, o2 = ns_wq, ns_wq + ns_wo, ns_wq + ns_wo + ns_w13
        Lg = pl.num_programs(0)
        _W_OPS = {
            "wq": (wq_ref, bufs_all[:o0], 0, k1_t, T1),
            "wo": (wo_ref, bufs_all[o0:o1], 1, k3_t, T3),
            "w13": (w13_ref, bufs_all[o1:o2], 2, k4_t, T4),
            "w2": (w2_ref, bufs_all[o2:], 3, k5_t, T5),
        }

        def _w_copy(op, slot_c, lidx, t):
            hbm, bufs, oi, kt, TX = _W_OPS[op]
            KBh, NT = bufs[0].shape
            kk = t % kt
            nn = t // kt
            return pltpu.make_async_copy(
                hbm.at[lidx, pl.ds(kk * KBh, KBh), pl.ds(nn * NT, NT)],
                bufs[slot_c], wsem.at[oi, slot_c])

        def _w_issue_next(op, slot_c, t):
            # start the copy for global tile g+NS (same slot, just freed)
            # — possibly one or more layers ahead; skip past the last
            # grid layer
            bufs, TX = _W_OPS[op][1], _W_OPS[op][4]
            g2 = l * TX + t + len(bufs)
            l_t = g2 // TX
            t_t = g2 % TX

            @pl.when(l_t < Lg)
            def _():
                _w_copy(op, slot_c, li_ref[0] + l_t, t_t).start()

        def _stream_mm(op, t, xq, s_ref, z_ref, acc, k, col_off, GB, G8):
            bufs, TX = _W_OPS[op][1], _W_OPS[op][4]
            NS = len(bufs)
            g = l * TX + t
            for c_ in range(NS):
                @pl.when(g % NS == c_)
                def _(c_=c_):
                    _w_copy(op, c_, li0, t).wait()
                    _mm_step(xq, bufs[c_], s_ref, z_ref, acc, k, col_off,
                             gs=gs, GB=GB, G8=G8, signed=signed)
                    _w_issue_next(op, c_, t)

        # once-per-launch prime: global tiles 0..NS-1 of every operand
        @pl.when((l == 0) & (s == 0))
        def _():
            for op in ("wq", "wo", "w13", "w2"):
                TX = _W_OPS[op][4]
                NS = len(_W_OPS[op][1])
                for g0 in range(NS):
                    l_t, t_t = divmod(g0, TX)  # l_t > 0 only when TX < NS

                    @pl.when(l_t < Lg)
                    def _(op=op, g0=g0, l_t=l_t, t_t=t_t, NS=NS):
                        _w_copy(op, g0 % NS, li_ref[0] + l_t, t_t).start()

    # ---- phase 0: attn norm + int8 quant of x -------------------------------
    @pl.when(s == 0)
    def _():
        xf = xcur[...]
        xn = _norm_row(an_ref, li0, eps, xf)
        q, sc = _quant_rows(xn)
        xq8[...] = q
        xs[...] = sc

    # ---- phase 1: Wqkv tiles ------------------------------------------------
    @pl.when(s < T1)
    def _():
        k = s % k1_t

        @pl.when(k == 0)
        def _():
            accq[...] = jnp.zeros_like(accq)

        if stream:
            KB = _kb_of(_W_OPS["wq"][1][0])
            _stream_mm("wq", s, xq8, sq_ref, zq_ref, accq, k,
                       pl.multiple_of(k * KB, KB), KB // gs, G81)
        else:
            _mm(xq8, wq_ref, sq_ref, zq_ref, accq, k, G81, np_t[0])

        @pl.when(k == k1_t - 1)
        def _():
            n1 = s // k1_t
            NT = accq.shape[-1]
            qkv[:, pl.ds(pl.multiple_of(n1 * NT, NT), NT)] = (
                accq[...] * xs[...]
            )

    # ---- phase 2: rope + KV row quant + attention ---------------------------
    # Length-chunked slab loads (flash-decode IO): only 128-row chunks up
    # to the current context length stream from HBM, so attention traffic
    # scales with the REAL sequence, not max_seq_len (4.5 -> 1.1 MB/layer
    # at 7B with short contexts). Rows beyond the loaded chunks hold
    # stale/garbage VMEM; scores and scale columns are length-masked
    # inside _flat_attention_rows_int8, and each row's ``length`` column
    # (stale in the slab — commits happen outside the kernel) is
    # corrected there from the fresh-rows outputs.
    n_sc = S // sc

    def _slab_copies(b):
        """Chunked loads of row ``b``'s cache into the slab scratch
        (unbatched path; the batched path uses _group_copies). Flat
        layout: (sc, Hkv*D) int8 and (sc, Hkv) bf16 chunks — whole-tile
        slices at 128-aligned sublane offsets, no relayout anywhere."""
        length = len_ref[b]
        out = []
        for c in range(n_sc):
            sl = pl.ds(c * sc, sc)
            cond = (c * sc) <= length
            if paged:
                # block-table indirection: logical chunk c of row b lives
                # in physical pool block bt[b, c] (vLLM-style paged KV;
                # the index is SMEM scalar arithmetic, the DMA itself is
                # identical to the contiguous case)
                blk = bt_ref[b, c]
                srcs = (k_hbm.at[lic, blk], v_hbm.at[lic, blk],
                        ks_hbm.at[lic, blk], vs_hbm.at[lic, blk])
            else:
                srcs = (k_hbm.at[lic, b, sl], v_hbm.at[lic, b, sl],
                        ks_hbm.at[lic, b, slice(None), sl],
                        vs_hbm.at[lic, b, slice(None), sl])
            dsts = (kslab.at[sl], vslab.at[sl],
                    ks_slab.at[slice(None), sl],
                    vs_slab.at[slice(None), sl])
            for i, (src, dst) in enumerate(zip(srcs, dsts)):
                out.append((cond, pltpu.make_async_copy(
                    src, dst, sems.at[0, i])))
        return out

    def _start_copies(copies):
        for cond, cp in copies:
            @pl.when(cond)
            def _(cp=cp):
                cp.start()

    def _wait_copies(copies):
        for cond, cp in copies:
            @pl.when(cond)
            def _(cp=cp):
                cp.wait()

    # B == 1: the KV slab loads don't depend on anything this kernel
    # computes — start them at the FIRST grid step so the ~4 MB (7B)
    # streams behind the Wqkv tiles instead of serialising at the start
    # of the attention phase. (B > 1 reuses the slab scratch per batch
    # row, so loads stay at each row's first attention step. Skipped when
    # the profiling grid truncation drops phase 2 — an un-waited DMA at
    # kernel end aborts the TPU.)
    if prefetch_slabs:
        @pl.when(s == 0)
        def _():
            _start_copies(_slab_copies(0))

    # ---- batched attention (B > 1): INT8 group steps ----------------------
    # One grid step per 8-row group over full-S (gb, S, Hkv*D) FLAT
    # slabs, attention dots INT8 end-to-end
    # (_flat_attention_rows_int8): round 3's bf16 formulation paid
    # ~2.2 us per (512, 4096) int8->bf16 slab cast, and round 4's
    # head-structured slabs paid a (S, Hkv, D) -> (S, Hkv*D)
    # sublane->lane relayout per slab use (~209 us/layer at B=32,
    # exp23/exp30) — flat slabs feed the dots directly. The round-4
    # flash-chunked rework died on a toolchain property (branch-skipped
    # heavy regions still cost ~70% of their body per grid step —
    # experiments/exp24_when_branch.py), so the win comes from making
    # the per-row compute cheap UNCONDITIONALLY. Slab loads stay
    # length-chunk-gated (IO scales with the real context); group 0
    # prefetches at each layer's first grid step.
    if batched:
        selT_b = _head_sel(Hkv, hg * n_rep, 0, n_rep).T  # (hgq, Hkv)

        def _group_copies(g, bank):
            """Length-gated chunked loads of group g's rows' caches into
            slab BANK ``bank`` ((n_sb, gb, S, ...) scratch); g/bank may
            be traced scalars (banked semaphores keep concurrent groups'
            completions apart)."""
            out = []
            for jr in range(gb):
                b_idx = jnp.minimum(g * gb + jr, B - 1)
                length = len_ref[b_idx]
                for c in range(n_sc):
                    cond = (c * sc) <= length
                    if paged:
                        blk = bt_ref[b_idx, c]
                        srcs = (k_hbm.at[lic, blk], v_hbm.at[lic, blk],
                                ks_hbm.at[lic, blk], vs_hbm.at[lic, blk])
                    else:
                        slc = pl.ds(c * sc, sc)
                        srcs = (k_hbm.at[lic, b_idx, slc],
                                v_hbm.at[lic, b_idx, slc],
                                ks_hbm.at[lic, b_idx, slice(None), slc],
                                vs_hbm.at[lic, b_idx, slice(None), slc])
                    dsl = pl.ds(c * sc, sc)
                    dsts = (kslab.at[bank, jr, dsl],
                            vslab.at[bank, jr, dsl],
                            ks_slab.at[bank, jr, slice(None), dsl],
                            vs_slab.at[bank, jr, slice(None), dsl])
                    for i, (src, dst) in enumerate(zip(srcs, dsts)):
                        out.append((cond, pltpu.make_async_copy(
                            src, dst, sems.at[bank, i])))
            return out

        # the group loads depend only on scalar-prefetched lengths: start
        # them at each layer's first grid step so the whole Wqkv phase
        # covers them (no write race — the stale length column is
        # corrected from the fresh-rows scratch). With enough VMEM every
        # group gets its own slab bank and ALL loads start here —
        # otherwise (n_sb == 1, huge buckets) group g > 0 loads start at
        # its own step and serialize against the attention compute.
        if "ropeq" not in _ablate:
            @pl.when(s == 0)
            def _():
                for g0 in range(n_sb if n_sb > 1 else 1):
                    _start_copies(_group_copies(g0, g0))

        @pl.when(s == T1)
        def _():
            if "ropeq" in _ablate:  # timing-only ablation (exp22)
                return
            qkvA = qkv[...]  # (B_pad, Nq) f32
            Bp = qkvA.shape[0]

            def expand_rows(mat, H):
                # (B_pad, D) -> (B_pad*H, D): output row r = mat row
                # r // H (one-hot MXU dot; sublane gathers can't be
                # expressed as a dynamic index)
                selr = (
                    jax.lax.broadcasted_iota(jnp.int32, (Bp * H, Bp), 1)
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (Bp * H, Bp), 0) // H
                ).astype(jnp.float32)
                return jnp.dot(selr, mat,
                               preferred_element_type=jnp.float32)

            def rope_rows(rows, cosb, sinb):
                h1_, h2_ = rows[:, : D // 2], rows[:, D // 2:]
                rot = jnp.concatenate([-h2_, h1_], axis=1)
                return rows * cosb + rot * sinb

            cosA = cosf_ref[...]
            sinA = sinf_ref[...]
            q2 = rope_rows(
                qkvA[:, :HD].reshape(Bp * Hq, D),
                expand_rows(cosA, Hq), expand_rows(sinA, Hq),
            )  # (Bp*Hq, D)
            # block-diagonal INT8 Q^T operand + per-row scales, built ONCE
            # per layer: the group steps' score dots consume the int8 K
            # slabs directly (no bf16 casts — exp22/23's dominant cost)
            qs_ = jnp.maximum(
                jnp.max(jnp.abs(q2), axis=1, keepdims=True), 1e-30) / 127.0
            q8 = jnp.clip(jnp.round(q2 / qs_), -127, 127).astype(jnp.int8)
            qw = jnp.tile(q8, (1, Hkv))
            # block-diag mask from BROADCAST-shaped iotas: two full
            # (Bp*Hq, Hkv*D) int32 iotas cost 64 MB of VMEM stack at
            # B=64 and pushed the kernel over the scoped limit
            col_h = jax.lax.broadcasted_iota(
                jnp.int32, (1, Hkv * D), 1) // D
            row_h = (jax.lax.broadcasted_iota(
                jnp.int32, (Bp * Hq, 1), 0) % Hq) // n_rep
            qbd8[...] = jnp.where(col_h == row_h, qw, jnp.int8(0))
            qsc[...] = qs_
            kr = rope_rows(
                qkvA[:, HD:HD + KVD].reshape(Bp * Hkv, D),
                expand_rows(cosA, Hkv), expand_rows(sinA, Hkv))
            vr = qkvA[:, HD + KVD:HD + 2 * KVD].reshape(Bp * Hkv, D)
            # bf16-ROUNDED scales: the cache stores scales bf16, and
            # quantizing the codes against the ROUNDED value keeps
            # codes/scales self-consistent (kv_cache._quant_heads uses
            # the same rounding, so the oracle paths match exactly)
            ksc = (jnp.maximum(
                jnp.max(jnp.abs(kr), axis=1, keepdims=True), 1e-8)
                / 127.0).astype(jnp.bfloat16).astype(jnp.float32)
            vsc = (jnp.maximum(
                jnp.max(jnp.abs(vr), axis=1, keepdims=True), 1e-8)
                / 127.0).astype(jnp.bfloat16).astype(jnp.float32)
            # fresh K/V rows: the 3-D scratch feeds the per-row in-place
            # commit DMAs (untiled leading dim — free reshape), the flat
            # scratch feeds the group steps' length-column corrections
            # (one 32 KB sublane->lane relayout per layer); fresh SCALE
            # rows are emitted as small outputs for the wrapper's
            # outside scatter (no bf16 1-row write shape compiles)
            kq = jnp.clip(jnp.round(kr / ksc), -128, 127).astype(jnp.int8)
            vq = jnp.clip(jnp.round(vr / vsc), -128, 127).astype(jnp.int8)
            krow3[...] = kq.reshape(Bp, Hkv, D)
            vrow3[...] = vq.reshape(Bp, Hkv, D)
            kflat[...] = kq.reshape(Bp, KVD)
            vflat[...] = vq.reshape(Bp, KVD)
            ksrows_ref[0] = ksc.reshape(Bp, Hkv).astype(jnp.bfloat16)
            vsrows_ref[0] = vsc.reshape(Bp, Hkv).astype(jnp.bfloat16)

            writes = []
            for b in range(B):
                # clamp the WRITE index to the full cache (an idle
                # serving slot's length can run past it — dead rows,
                # but the DMA must stay in bounds)
                lw = jnp.minimum(len_ref[b], s_wmax - 1)
                if paged:
                    blk_w = bt_ref[b, lw // sc]
                    row_w = lw % sc
                writes += [
                    pltpu.make_async_copy(
                        krow3.at[b],
                        (ko_hbm.at[lic, blk_w, row_w] if paged
                         else ko_hbm.at[lic, b, lw]), sems.at[0, 4]),
                    pltpu.make_async_copy(
                        vrow3.at[b],
                        (vo_hbm.at[lic, blk_w, row_w] if paged
                         else vo_hbm.at[lic, b, lw]), sems.at[0, 5]),
                ]
            for cp in writes:
                cp.start()

        # ---- attention group steps: rows [g*gb, (g+1)*gb) per step -------
        in_p2b = (s >= T1 + 1) & (s < T1 + T2)
        hgq = hg * n_rep

        @pl.when(in_p2b)
        def _():
            if "ropeq" in _ablate:  # whole phase ablated (exp22)
                return
            g = s - T1 - 1
            bank = (g if n_sb > 1 else 0)
            rows = [jnp.minimum(g * gb + jr, B - 1) for jr in range(gb)]
            copies = _group_copies(g, bank)

            if n_sb == 1:
                @pl.when(g > 0)  # group 0 prefetched at s == 0
                def _():
                    _start_copies(copies)
            _wait_copies(copies)
            if "attn" not in _ablate:
                len_vec = jnp.stack([len_ref[b] for b in rows])
                if n_bgroups == 1:
                    Qg8 = qbd8[...][: gb * hgq]
                    qs_g = qsc[...][: gb * hgq]
                else:  # gb == 8 -> gb*hgq sublane-aligned offsets
                    off = pl.multiple_of(g * gb * hgq, gb * hgq)
                    Qg8 = qbd8[pl.ds(off, gb * hgq), :]
                    qs_g = qsc[pl.ds(off, gb * hgq), :]
                # each q row's fresh-rows index (clamped like ``rows``);
                # the slabs are stale at each row's length column — the
                # helper corrects from the fresh-rows scratch
                Bp = kflat.shape[0]
                Rg = gb * hgq
                row_jr = jax.lax.broadcasted_iota(
                    jnp.int32, (Rg, Bp), 0) // hgq
                sel_fresh = (
                    jax.lax.broadcasted_iota(jnp.int32, (Rg, Bp), 1)
                    == jnp.minimum(g * gb + row_jr, B - 1)
                )
                out_rows = _flat_attention_rows_int8(
                    [kslab.at[bank, jr] for jr in range(gb)],
                    [vslab.at[bank, jr] for jr in range(gb)],
                    Qg8, qs_g,
                    [ks_slab.at[bank, jr] for jr in range(gb)],
                    [vs_slab.at[bank, jr] for jr in range(gb)],
                    len_vec, n_rep, selT_b,
                    kflat[...], vflat[...],
                    ksrows_ref[0].astype(jnp.float32),
                    vsrows_ref[0].astype(jnp.float32), sel_fresh)
                if n_bgroups == 1:
                    aout[pl.ds(0, gb), :] = out_rows.reshape(gb, HD)
                else:
                    goff = pl.multiple_of(g * gb, gb)
                    aout[pl.ds(goff, gb), :] = out_rows.reshape(gb, HD)

            @pl.when(s == T1 + T2 - 1)
            def _():
                # the KV row writes started at the rope/quant step; all
                # attention reads correct the length column from scratch,
                # so the only ordering requirement is completion before
                # the row scratch is reused next layer
                for b in range(B):
                    lw = jnp.minimum(len_ref[b], s_wmax - 1)
                    if paged:
                        blk_w = bt_ref[b, lw // sc]
                        row_w = lw % sc
                    wr = [
                        pltpu.make_async_copy(
                            krow3.at[b],
                            (ko_hbm.at[lic, blk_w, row_w] if paged
                             else ko_hbm.at[lic, b, lw]), sems.at[0, 4]),
                        pltpu.make_async_copy(
                            vrow3.at[b],
                            (vo_hbm.at[lic, blk_w, row_w] if paged
                             else vo_hbm.at[lic, b, lw]), sems.at[0, 5]),
                    ]
                    for cp in wr:
                        cp.wait()

    in_p2 = (s >= T1) & (s < T1 + T2) & jnp.bool_(not batched)

    @pl.when(in_p2)
    def _per_row_phase2():
        if batched:
            return  # batched block above owns phase 2 (and slab shapes)
        t = s - T1
        b = t  # one step per batch row (whole-KV group, n_groups == 1)
        length = len_ref[b]
        Bp = qkv.shape[0]
        bsel = (
            jax.lax.broadcasted_iota(jnp.int32, (1, Bp), 1) == b
        ).astype(jnp.float32)  # batch-row one-hot (b is traced here)
        hgq = hg * n_rep

        # rope + per-head INT8 quant BATCHED over heads: two 16 KB
        # relayouts ((1, H*D) <-> (H, D)) replace ~2*(Hq+Hkv) serial
        # (1, D) ops — the round-2 phase profile put this section at
        # ~20 us/layer at 7B (comparable to the whole attention DMA)
        qkvb = jnp.dot(bsel, qkv[...],
                       preferred_element_type=jnp.float32)  # (1, Nq)
        cosb = jnp.dot(bsel, cosf_ref[...],
                       preferred_element_type=jnp.float32)  # (1, D)
        sinb = jnp.dot(bsel, sinf_ref[...],
                       preferred_element_type=jnp.float32)

        def rope_rows(rows, cosb, sinb):
            # rotate-half on (H, D) rows, cos/sin broadcast over rows
            h1_, h2_ = rows[:, : D // 2], rows[:, D // 2:]
            rot = jnp.concatenate([-h2_, h1_], axis=1)
            return rows * cosb + rot * sinb

        q_roped = rope_rows(qkvb[:, :HD].reshape(Hq, D), cosb, sinb)
        kr = rope_rows(
            qkvb[:, HD:HD + KVD].reshape(Hkv, D), cosb, sinb
        )  # (Hkv, D)
        vr = qkvb[:, HD + KVD:HD + 2 * KVD].reshape(Hkv, D)
        # bf16-ROUNDED scales — same rounding as the batched path and
        # kv_cache._quant_heads (codes stay consistent with the stored
        # bf16 scale)
        ksc = (jnp.maximum(
            jnp.max(jnp.abs(kr), axis=1, keepdims=True), 1e-8)
            / 127.0).astype(jnp.bfloat16).astype(jnp.float32)
        vsc = (jnp.maximum(
            jnp.max(jnp.abs(vr), axis=1, keepdims=True), 1e-8)
            / 127.0).astype(jnp.bfloat16).astype(jnp.float32)
        kq = jnp.clip(jnp.round(kr / ksc), -128, 127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(vr / vsc), -128, 127).astype(jnp.int8)
        # this row's fresh K/V + scales land in the correction operands.
        # B == 1 (the common serving fast path): no scratch RMW at all —
        # the single row's values ARE the correction operands, and the
        # scale output block is written whole (rows past B are dropped
        # by the wrapper's [:B]). B > 1 (VMEM-fallback per-row mode):
        # one-hot RMW into the (B_pad, ...) scratch (1-sublane stores at
        # a traced row index are rejected by TC; a full-array where
        # costs ~32 KB of VPU), with the first row step of each layer
        # zero-BASING the block — uninitialized bf16 garbage can be NaN,
        # and the helper's one-hot scale DOT would contract 0*NaN = NaN
        # (a where-select would discard it, a dot cannot).
        kfl = kq.reshape(1, KVD)
        vfl = vq.reshape(1, KVD)
        ksl = jnp.transpose(ksc).astype(jnp.bfloat16)  # (1, Hkv)
        vsl = jnp.transpose(vsc).astype(jnp.bfloat16)
        if B == 1:
            kf_all, vf_all = kfl, vfl
            ksf_all = jnp.transpose(ksc)  # (1, Hkv) f32
            vsf_all = jnp.transpose(vsc)
            ksrows_ref[0] = jnp.broadcast_to(ksl, (Bp, Hkv))
            vsrows_ref[0] = jnp.broadcast_to(vsl, (Bp, Hkv))
        else:
            rowsel = (
                jax.lax.broadcasted_iota(jnp.int32, (Bp, 1), 0) == b
            )
            first = t == 0
            kflat[...] = jnp.where(
                rowsel, kfl, jnp.where(first, jnp.int8(0), kflat[...]))
            vflat[...] = jnp.where(
                rowsel, vfl, jnp.where(first, jnp.int8(0), vflat[...]))
            zb = jnp.zeros((), jnp.bfloat16)
            ksrows_ref[0] = jnp.where(
                rowsel, ksl, jnp.where(first, zb, ksrows_ref[0]))
            vsrows_ref[0] = jnp.where(
                rowsel, vsl, jnp.where(first, zb, vsrows_ref[0]))
            kf_all = kflat[...]
            vf_all = vflat[...]
            ksf_all = ksrows_ref[0].astype(jnp.float32)
            vsf_all = vsrows_ref[0].astype(jnp.float32)

        # in-place K/V row commit from the dedicated (Hkv, D) scratch
        # (round-4 pattern: DMA at the untiled S index of the 5-D ref);
        # waited in-step — the next row step reuses the scratch. Write
        # index clamped to the full cache (idle-slot safety).
        krow1[...] = kq
        vrow1[...] = vq
        lw = jnp.minimum(length, s_wmax - 1)
        if paged:
            blk_w = bt_ref[b, lw // sc]
            row_w = lw % sc
        row_writes = [
            pltpu.make_async_copy(
                krow1,
                (ko_hbm.at[lic, blk_w, row_w] if paged
                 else ko_hbm.at[lic, b, lw]), sems.at[0, 4]),
            pltpu.make_async_copy(
                vrow1,
                (vo_hbm.at[lic, blk_w, row_w] if paged
                 else vo_hbm.at[lic, b, lw]), sems.at[0, 5]),
        ]
        loads = _slab_copies(b)
        for cw in row_writes:
            cw.start()
        if not prefetch_slabs:  # else started at s == 0
            _start_copies(loads)
        for cw in row_writes:
            cw.wait()
        _wait_copies(loads)

        # whole-KV-group INT8 attention over the FLAT (S, Hkv*D) slab —
        # literally the batched formulation with B == 1 (the kernel-level
        # B=1-vs-batched row-exactness contract), with this row's length
        # column corrected from the just-computed fresh rows (the slab
        # copy is stale there; the HBM commit happens outside the kernel)
        qg = q_roped  # (hgq, D) == (Hq, D)
        qs_ = jnp.maximum(
            jnp.max(jnp.abs(qg), axis=1, keepdims=True), 1e-30) / 127.0
        q8 = jnp.clip(jnp.round(qg / qs_), -127, 127).astype(jnp.int8)
        qw = jnp.tile(q8, (1, Hkv))
        col_h = jax.lax.broadcasted_iota(jnp.int32, (hgq, KVD), 1) // D
        row_h = jax.lax.broadcasted_iota(
            jnp.int32, (hgq, KVD), 0) // n_rep
        Qbd8 = jnp.where(col_h == row_h, qw, jnp.int8(0))
        selT = _head_sel(Hkv, hgq, 0, n_rep).T  # (hgq, Hkv)
        Bf = kf_all.shape[0]  # 1 (fast path) or B_pad
        sel_fresh = (
            jax.lax.broadcasted_iota(jnp.int32, (hgq, Bf), 1)
            == (0 if Bf == 1 else b)
        )
        out_g = _flat_attention_rows_int8(
            [kslab], [vslab], Qbd8, qs_, [ks_slab], [vs_slab],
            jnp.stack([length]), n_rep, selT,
            kf_all, vf_all, ksf_all, vsf_all, sel_fresh)
        orow = out_g.reshape(1, hgq * D)
        bcol = bsel.T  # (B_pad, 1)
        aout[...] = jnp.where(bcol > 0, orow, aout[...])

    # ---- phase 3: Wo tiles + residual + ffn norm ----------------------------
    in_p3 = (s >= T1 + T2) & (s < T1 + T2 + T3)

    @pl.when(in_p3)
    def _():
        k = s - T1 - T2

        @pl.when(k == 0)
        def _():
            acco[...] = jnp.zeros_like(acco)
            q, sc = _quant_rows(aout[...])
            a8[...] = q
            as_[...] = sc

        if stream:
            KB = _kb_of(_W_OPS["wo"][1][0])
            _stream_mm("wo", k, a8, so_ref, zo_ref, acco, k,
                       pl.multiple_of(k * KB, KB), KB // gs, G83)
        else:
            _mm(a8, wo_ref, so_ref, zo_ref, acco, k, G83, np_t[1])

        @pl.when(k == T3 - 1)
        def _():
            xm = xcur[...] + (acco[...] * as_[...])[:, :dim]
            xmid[...] = xm
            xn = _norm_row(fn_ref, li0, eps, xm)
            q, sc = _quant_rows(xn)
            xq8[...] = q  # reused for the W13 input
            xs[...] = sc

    # ---- phase 4: W13 tiles -------------------------------------------------
    in_p4 = (s >= T1 + T2 + T3) & (s < T1 + T2 + T3 + T4)

    @pl.when(in_p4)
    def _():
        t = s - T1 - T2 - T3
        k = t % k4_t

        @pl.when(k == 0)
        def _():
            acc13[...] = jnp.zeros_like(acc13)

        if stream:
            KB = _kb_of(_W_OPS["w13"][1][0])
            _stream_mm("w13", t, xq8, s13_ref, z13_ref, acc13, k,
                       pl.multiple_of(k * KB, KB), KB // gs, G84)
        else:
            _mm(xq8, w13_ref, s13_ref, z13_ref, acc13, k, G84, np_t[2])

        @pl.when(k == k4_t - 1)
        def _():
            n4 = t // k4_t
            NT = acc13.shape[-1]
            h1[:, pl.ds(pl.multiple_of(n4 * NT, NT), NT)] = (
                acc13[...] * xs[...]
            )

    # ---- phase 5: GLU + W2 tiles + residual ---------------------------------
    T_pre = T1 + T2 + T3 + T4

    @pl.when(s == T_pre)
    def _():
        h = h1[...]
        g_, u_ = h[:, :F], h[:, F:2 * F]  # cols past 2F: plane-mode N pad
        a = (g_ * jax.nn.sigmoid(g_)) * u_
        q, sc = _quant_rows(a)
        F_pad = g8buf.shape[-1]  # W2 may be K-padded (with_k_pad): zero
        if F_pad != F:           # codes in x make the pad rows exact 0
            q = jnp.pad(q, ((0, 0), (0, F_pad - F)))
        g8buf[...] = q
        gs8[...] = sc

    @pl.when(s >= T_pre)
    def _():
        k = s - T_pre

        @pl.when(k == 0)
        def _():
            acc2[...] = jnp.zeros_like(acc2)

        if stream:
            KB = _kb_of(_W_OPS["w2"][1][0])
            _stream_mm("w2", k, g8buf, s2_ref, z2_ref, acc2, k,
                       pl.multiple_of(k * KB, KB), KB // gs, G85)
        else:
            _mm(g8buf, w2_ref, s2_ref, z2_ref, acc2, k, G85, np_t[3])

        @pl.when(k == k5_t - 1)
        def _():
            out = xmid[...] + (acc2[...] * gs8[...])[:, :dim]
            if B != out.shape[0]:
                # zero the batch-pad rows: attention never writes them, so
                # they carry VMEM garbage (inf/nan) through the row-local
                # phases, and the next layer's one-hot batch-row dots would
                # propagate 0 x nan into the real rows
                row_ok = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) < B
                out = jnp.where(row_ok, out, 0.0)
            xcur[...] = out  # real carry even under debug_out
            if debug_out is None:
                o_ref[...] = out
            elif debug_out == "xmid":
                o_ref[...] = xmid[...]
            elif debug_out == "aout":
                o_ref[...] = aout[:, :o_ref.shape[-1]]
            elif debug_out == "qkv":
                o_ref[...] = qkv[:, :o_ref.shape[-1]]
            elif debug_out == "h1":
                o_ref[...] = h1[:, :o_ref.shape[-1]]
            elif debug_out == "acc2":
                o_ref[...] = acc2[...] * gs8[...]


def fused_layer_supported(cfg, gs, B=1, f_pad=None, s_max=None, wbits=4):
    """f_pad: W2's (possibly with_k_pad-ded) input width; defaults to
    cfg.ffn_dim. s_max: the RUNTIME cache length (engine max_len /
    k.shape[2]) — the B>8 VMEM gate sizes the KV slabs with it;
    defaults to cfg.max_seq_len (conservative when engines run shorter
    caches than the model's context limit)."""
    dim, F = cfg.dim, cfg.ffn_dim
    Fp = f_pad or F
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    Nq = (Hq + 2 * Hkv) * D
    # B cap 64 (8 int8 attention group steps; the round-3 bf16 kernel
    # crashed the Mosaic compile subprocess at B=64 — the round-4 int8
    # kernel is much smaller and compiles; B=64 needs a shrunken tile
    # budget + raised VMEM cap, see experiments/exp27_b64.py).
    if gs <= 0 or B > 64 or D % 128 or Fp < F:
        return False
    if B > 1:
        # batched int8 attention runs over full-S (gb, S, ...) FLAT slabs
        # + the int8 block-diagonal Q scratch; scale slabs are bf16
        # tight-head (VMEM-lane-padded to 128)
        S = s_max or cfg.max_seq_len
        Hvp = -(-Hkv // 128) * 128
        gb = B if B <= 8 else 8
        slab_bytes = S * Hkv * D * 2 + S * Hvp * 2 * 2
        qbd_bytes = max(8, -(-B // 8) * 8) * Hq * Hkv * D  # B_pad rows
        if gb * slab_bytes + qbd_bytes > 48 * 1024 * 1024:
            return False
    if Hkv % 4:
        # the per-token KV row commit DMAs a (Hkv, D) int8 slice; Mosaic
        # requires the sublane dim aligned to the (4, 128) int8 tiling
        return False
    if wbits in (2, 3):
        # plane mode: full-N tiles are always row-covering; the pack
        # layout guarantees the lane-padded N (pallas_n_pad), so only the
        # K/groupsize divisibility matters
        return all(K % gs == 0
                   for K in (dim, Hq * D, Fp))
    for K, N in ((dim, Nq), (Hq * D, dim), (dim, 2 * F), (Fp, dim)):
        if K % gs or N % 128:
            return False
        KB, NT = _fused_tiles(K, N, gs)
        if not (_lane_ok(KB, K) and _lane_ok(NT, N)):
            return False
    # Wo and W2 output tiles must span the full row (residual adds)
    if _fused_tiles(Hq * D, dim, gs)[1] != dim:
        return False
    if _fused_tiles(Fp, dim, gs)[1] != dim:
        return False
    return True


def fused_decoder_layer(x, pos, cos, sin, li,
                        wq, sq, zq, wo, so, zo, w13, s13, z13, w2, s2, z2,
                        attn_norm, ffn_norm, k, v, ks, vs,
                        cfg, gs, interpret=False, debug_out=None,
                        _n_phases=5, signed=False):
    """x (B, dim) f32 -> (out (B, dim) f32, k, v, ks, vs updated).

    pos (B,) int32 cache row == attended length; cos/sin (B, D) full-width
    rotate-half rope terms for this position; weight/scale stacks as in
    ffn_fused; caches in the FLAT serving layout — k/v (L, B, S, Hkv*D)
    int8, ks/vs (L, B, S, Hkv) bf16 (decode._scan_cache(flat=True)).
    signed=True reads pack_s4_rows containers (nibbles store code-8)."""
    return _fused_call(
        x, pos, cos, sin, li, wq, sq, zq, wo, so, zo, w13, s13, z13,
        w2, s2, z2, attn_norm, ffn_norm, k, v, ks, vs, cfg, gs,
        interpret=interpret, debug_out=debug_out, _n_phases=_n_phases,
        n_grid_layers=1, signed=signed,
    )


def fused_decoder_layers(x, pos, cos, sin,
                         wq, sq, zq, wo, so, zo, w13, s13, z13, w2, s2, z2,
                         attn_norm, ffn_norm, k, v, ks, vs,
                         cfg, gs, interpret=False, bt=None, signed=False,
                         wbits=4, li_cache=0, s_active=None):
    """The WHOLE backbone in one launch: grid (n_layers, T) walks every
    decoder layer's five phases with the activation row carried in VMEM
    scratch between layers. vs. one launch per layer this saves the
    per-launch pipeline fill (~15 us/layer measured at 7B) and the
    inter-launch dispatch gap, and lets the weight stream run into the
    next layer while the current one finishes.

    x (B, dim) f32 -> (out (B, dim) f32 post-last-layer (pre final norm),
    k, v, ks, vs updated). Weight/scale stacks are (L, ...).

    Caches in the FLAT serving layout: contiguous k/v (L, B, S, Hkv*D)
    int8 + ks/vs (L, B, S, Hkv) bf16 when bt is None, else PAGED pools
    (L, n_blocks, block, Hkv*D) / (L, n_blocks, block, Hkv) with bt
    (B, n_chunks) int32 mapping row b's logical chunk c to its physical
    pool block (vLLM-style block table; llm/kv_cache.PagedKVCache + the
    serving engine's allocator own the tables).

    s_active: STATIC context bucket (multiple of the chunk size) — the
    attention slabs, dots and length-gated loads cover only the first
    s_active cache rows instead of the full max_seq_len, the bucketed-
    serving dispatch (every pos must satisfy pos < s_active; the caller
    picks the bucket from host-known lengths). At 7B/B=32 with ~100-row
    contexts this is the difference between 512-wide and 128-wide
    attention dots — the dots' cost is context-INDEPENDENT otherwise
    (exp24: branch-skipping dead compute doesn't pay on this toolchain,
    so the width must shrink statically)."""
    return _fused_call(
        x, pos, cos, sin, jnp.int32(0), wq, sq, zq, wo, so, zo,
        w13, s13, z13, w2, s2, z2, attn_norm, ffn_norm, k, v, ks, vs,
        cfg, gs, interpret=interpret, debug_out=None, _n_phases=5,
        n_grid_layers=attn_norm.shape[0], bt=bt, signed=signed,
        wbits=wbits, li_cache=jnp.int32(li_cache), s_active=s_active,
    )


def _fused_call(x, pos, cos, sin, li,
                wq, sq, zq, wo, so, zo, w13, s13, z13, w2, s2, z2,
                attn_norm, ffn_norm, k, v, ks, vs,
                cfg, gs, interpret=False, debug_out=None,
                _n_phases=5, n_grid_layers=1, bt=None, signed=False,
                wbits=4, li_cache=None, s_active=None, _ablate=""):
    B, dim = x.shape
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    F = cfg.ffn_dim
    plane = wbits in (2, 3)  # TRUE-width sub-4-bit plane windows
    rowpair = wq.dtype == jnp.uint8 and not plane  # pack_u4_rows layout
    assert all(w.dtype == jnp.uint8 for w in (wo, w13, w2)) or not rowpair
    # each phase's scale/zero pair shares one BlockSpec window size, which
    # is picked from the SCALE dtype — the pair must match
    assert all(s.dtype == z.dtype for s, z in
               ((sq, zq), (so, zo), (s13, z13), (s2, z2)))
    kdiv = 2 if rowpair else 1
    Fp = w2.shape[-2] * kdiv  # >= F when W2 is with_k_pad-ded
    Nq = (Hq + 2 * Hkv) * D
    HD = Hq * D
    paged = bt is not None
    if paged:
        # k/v/ks/vs are physical POOLS (L, n_blocks, block, ...); the
        # logical sequence view is bt's n_chunks x block rows
        SC = k.shape[2]
        S = bt.shape[1] * SC
        bt_arr = bt.astype(jnp.int32)
    else:
        S = k.shape[2]
        SC = 128 if S % 128 == 0 else S
        bt_arr = jnp.zeros((1, 1), jnp.int32)  # unused
    S_cache = S  # full cache rows (write-index clamp bound)
    if s_active is not None and SC != S:
        # STATIC context bucket (bucketed serving dispatch): slabs, dots
        # and chunked loads cover rows [0, s_active) only — the caller
        # guarantees every pos < s_active
        assert s_active % SC == 0 and 0 < s_active <= S, (s_active, SC, S)
        S = s_active
    # round-5 serving cache: k/v 5-D head-structured (the kernel reshapes
    # the HBM refs flat for the slab reads and writes rows 5-D); scale
    # slabs bf16 TRANSPOSED (.., Hkv, S) — tight heads with tile-aligned
    # lane chunks (decode._scan_cache(flat=True) /
    # kv_cache.init_paged_kv_cache produce this; Mosaic rejects DMA
    # slices whose lane dim is a sub-128 Hkv, so heads live on sublanes)
    KVD = Hkv * D
    assert k.shape[-2:] == (Hkv, D) and v.shape[-2:] == (Hkv, D), (
        "megakernel caches must be (.., S, Hkv, D); got {}".format(k.shape))
    assert ks.shape[-2] == Hkv and vs.shape[-2] == Hkv, (
        "scale slabs must be TRANSPOSED (.., Hkv, S); got {}".format(
            ks.shape))
    assert ks.shape[-1] == k.shape[-3] and vs.shape[-1] == k.shape[-3]
    assert ks.dtype == jnp.bfloat16 and vs.dtype == jnp.bfloat16, (
        "serving cache scale slabs are bf16 (tight-head layout)")
    Lx = k.shape[0]
    n_rep = Hq // Hkv
    # ONE head group: the whole-KV block-diagonal dot pair beats 4x
    # (Hkv//8)-head groups by 18 us/layer at 7B (fewer slab casts,
    # relayouts and softmaxes; measured 2026-08-17: attention marginal
    # 26.8 -> 8.6 us/layer). The grouped machinery stays (n_groups > 1
    # still correct) for VMEM-constrained future shapes.
    n_groups = 1

    # batched attention: rope/quant (B*H, D)-vectorized at one step, then
    # ONE grid step per 8-row group over full-S (gb, S, ...) slabs with
    # INT8 dots end-to-end (the flash-chunked variant was measured and
    # reverted — exp24: branch-skipped heavy regions still cost ~70% of
    # their body per grid step on this toolchain). B up to 64 rides the
    # same megakernel instead of falling to per-matmul kernels (which
    # re-stream weights per launch: 885 tok/s at B=32).
    # gb must be 8 (sublane-aligned group offsets) or the whole batch
    gb = B if B <= 8 else 8
    n_bgroups = -(-B // gb)
    # VMEM slab footprint: flat int8 k/v + transposed bf16 (Hkv, S) scale
    # slabs (sublane-padded to the bf16 16-row tile)
    Hvp = -(-Hkv // 16) * 16
    slab_bytes = S * KVD * 2 + S * Hvp * 2 * 2
    qbd_bytes = max(8, -(-B // 8) * 8) * Hq * Hkv * D  # int8, B_pad rows
    batched = (
        B > 1
        and n_groups == 1
        and _n_phases >= 2
        and gb * slab_bytes + qbd_bytes <= 48 * 1024 * 1024
    )
    # slab BANKS: with enough VMEM every 8-row group gets its own slab
    # bank so ALL groups' loads start at each layer's first grid step
    # (covered by the Wqkv phase) instead of serializing against the
    # attention compute group by group
    n_sb = 1
    if batched and n_bgroups > 1 and (
            n_bgroups * gb * slab_bytes + qbd_bytes <= 48 * 1024 * 1024):
        n_sb = n_bgroups
    slab_lead = (n_sb, gb) if batched else ()

    if plane:
        # TRUE-width 2/3-bit: FULL-N tiles, k-only steps (a plane covers
        # output columns [p*NP, (p+1)*NP) — column tiling would have to
        # align to N/8). Logical (possibly lane-padded) N per operand
        # rides the scale arrays' trailing dim.
        def _tiles_p(K, N):
            ng = K // gs
            d = ng
            while d > 1 and (d * gs * N > _FUSED_TILE_BUDGET
                             or d * gs > _FUSED_K_CAP or (ng % d)):
                d -= 1
            return d * gs, N

        Nq_s, N13_s = sq.shape[-1], s13.shape[-1]
        KB1, NT1 = _tiles_p(dim, Nq_s)
        KB3, NT3 = _tiles_p(HD, so.shape[-1])
        KB4, NT4 = _tiles_p(dim, N13_s)
        KB5, NT5 = _tiles_p(Fp, s2.shape[-1])
    else:
        Nq_s, N13_s = Nq, 2 * F
        KB1, NT1 = _fused_tiles(dim, Nq, gs)
        KB3, NT3 = _fused_tiles(HD, dim, gs)
        KB4, NT4 = _fused_tiles(dim, 2 * F, gs)
        KB5, NT5 = _fused_tiles(Fp, dim, gs)
    k1_t, n1_t = dim // KB1, Nq_s // NT1
    k3_t = HD // KB3
    k4_t, n4_t = dim // KB4, N13_s // NT4
    k5_t = Fp // KB5
    n_planes = {3: 8, 2: 4}.get(wbits, 1)
    np_t = ((NT1 // n_planes, NT3 // n_planes,
             NT4 // n_planes, NT5 // n_planes) if plane else (0, 0, 0, 0))
    G81 = _sz_layout(dim // gs, KB1 // gs, sq.dtype)
    G83 = _sz_layout(HD // gs, KB3 // gs, so.dtype)
    G84 = _sz_layout(dim // gs, KB4 // gs, s13.dtype)
    G85 = _sz_layout(Fp // gs, KB5 // gs, s2.dtype)
    T1 = n1_t * k1_t
    # batched: 1 rope/quant step + one step per 8-row group
    T2 = (1 + n_bgroups) if batched else B * n_groups
    T3 = k3_t
    T4, T5 = n4_t * k4_t, k5_t
    T = T1 + T2 + T3 + T4 + T5
    # _n_phases < 5 truncates the grid after that phase — timing-only knob
    # for per-phase profiling (outputs are garbage unless _n_phases == 5)
    T_grid = [T1, T1 + T2, T1 + T2 + T3, T1 + T2 + T3 + T4, T][_n_phases - 1]
    # norm-stack window rows follow the WEIGHT stack depth (differs from
    # the cache depth Lx under the segmented mixed-precision scan)
    Ln = attn_norm.shape[0]
    Wn = 8 if Ln >= 8 else Ln

    # manual weight streaming (ring buffers + explicit DMA — see the
    # kernel comment) only covers the u8 row-pair serving layout; the grid
    # truncation knob would leave un-waited copies at kernel end.
    # B == 1 ONLY: streaming is the single-token HBM-bound optimisation
    # (188.2 -> 195.0 tok/s at 7B). At B >= 8 it is neutral (measured
    # B=8: 7.79 ms/step unstreamed vs 7.83 streamed; B=16: 11.01 vs
    # 11.12) and at B = 32 it is catastrophic (36.7 vs 17.1 ms/step —
    # the ring schedule serialises against the 4-group attention phase),
    # so batched steps use Pallas' BlockSpec pipelining instead.
    stream = (
        rowpair
        and (B == 1
             # B<=8 opt-in, measured NEGATIVE (round-4 exp28: 1,129
             # tok/s streamed vs 1,225 BlockSpec at B=8 even with the
             # short int8 attention phase) — knob kept for hardware
             # sweeps only
             or (B <= 8
                 and _os.environ.get("SBT_FUSED_STREAM_B8") == "1"))
        and _n_phases == 5
        and _os.environ.get("SBT_FUSED_STREAM", "1") == "1"
    )

    B_pad = max(8, ((B + 7) // 8) * 8)
    if B_pad != B:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))
        cos = jnp.pad(cos, ((0, B_pad - B), (0, 0)))
        sin = jnp.pad(sin, ((0, B_pad - B), (0, 0)))

    def pin(lo, hi, kt):
        # phase-local k index, clamped outside [lo, hi) so the block index
        # freezes (unchanged index -> no DMA)
        return lambda sidx: jnp.clip(sidx - lo, 0, hi - lo - 1) % kt

    p1 = pin(0, T1, k1_t)
    p3 = pin(T1 + T2, T1 + T2 + T3, k3_t)
    p4 = pin(T1 + T2 + T3, T1 + T2 + T3 + T4, k4_t)
    p5 = pin(T1 + T2 + T3 + T4, T, k5_t)

    def n1_of(sidx):
        return jnp.clip(sidx, 0, T1 - 1) // k1_t

    def n4_of(sidx):
        return jnp.clip(sidx - (T1 + T2 + T3), 0, T4 - 1) // k4_t

    GB1, GB3, GB4, GB5 = KB1 // gs, KB3 // gs, KB4 // gs, KB5 // gs

    # ---- phase-aligned layer switching (multi-layer grid) -------------------
    # Naively adding the layer axis made EVERY phase's block index jump to
    # layer l at step (l, 0): Pallas then fetched first tiles of ALL FOUR
    # matmuls (~16 MB) before step 0 could run — a measured ~13 us stall
    # per layer (phase-1 marginal 47.9 vs ~35 us of useful DMA). Instead,
    # each operand holds layer l-1's LAST block (resident -> no DMA)
    # until the phase BEFORE it is consumed, so its first-tile fetch
    # overlaps the preceding phase's compute/DMA:
    #   wo   switches at S1 (attention phase covers the 2 MB tile),
    #   w13  switches at S2 (Wo phase covers 5.6 MB),
    #   w2   switches at S3 (W13 phase covers 5.5 MB),
    #   wqkv prefetches layer l+1's first tile from S3 (W13+W2 cover it).
    # l == 0 keeps plain current-layer maps (the once-per-launch fill).
    Lg = n_grid_layers
    S1, S2, S3 = T1, T1 + T2, T1 + T2 + T3

    def wq_maps():
        # switch two steps after w2's (a fetch gates the step whose index
        # changed, overlapped only with the ONE preceding step — don't
        # stack both multi-MB fetches on the same step)
        S3b = S3 + min(2, max(T4 - 1, 0))

        def w(l, s, li_r, len_r, bt_r):
            cur = li_r[0] + l
            nxt = (s >= S3b) & (l + 1 < Lg)
            return (jnp.where(nxt, cur + 1, cur),
                    jnp.where(nxt, 0, p1(s)),
                    jnp.where(nxt, 0, n1_of(s)))

        def sz(l, s, li_r, len_r, bt_r):
            cur = li_r[0] + l
            nxt = (s >= S3b) & (l + 1 < Lg)
            return (jnp.where(nxt, cur + 1, cur),
                    jnp.where(nxt, 0, (p1(s) * GB1) // G81),
                    jnp.where(nxt, 0, n1_of(s)))

        return w, sz

    def _prev_maps(switch_at, pk, kt, GB, G8, n_of=None, last_n=0):
        def w(l, s, li_r, len_r, bt_r):
            cur = li_r[0] + l
            prev = (s < switch_at) & (l > 0)
            n = n_of(s) if n_of else 0
            return (jnp.where(prev, cur - 1, cur),
                    jnp.where(prev, kt - 1, pk(s)),
                    jnp.where(prev, last_n, n))

        def sz(l, s, li_r, len_r, bt_r):
            cur = li_r[0] + l
            prev = (s < switch_at) & (l > 0)
            n = n_of(s) if n_of else 0
            return (jnp.where(prev, cur - 1, cur),
                    jnp.where(prev, ((kt - 1) * GB) // G8,
                              (pk(s) * GB) // G8),
                    jnp.where(prev, last_n, n))

        return w, sz

    wq_w, wq_sz = wq_maps()
    # (measured, kept OFF: staggering w13/w2's switch points into the
    # batched attention phase — so their first tiles stream under the
    # attention compute — read as a win on paper but measured B=8 1,176
    # vs 1,225 tok/s and B=32 2,144 vs 2,126: the stacked fetches gate
    # the rope/group steps harder than they relieve the matmul phases.)
    wo_w, wo_sz = _prev_maps(S1, p3, k3_t, GB3, G83)
    w13_w, w13_sz = _prev_maps(S2, p4, k4_t, GB4, G84,
                               n_of=n4_of, last_n=n4_t - 1)
    w2_w, w2_sz = _prev_maps(S3, p5, k5_t, GB5, G85)

    if stream:
        # weights stay whole in HBM; the kernel DMAs tiles into its own
        # ring buffers (manual streaming — see the kernel comment)
        wq_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        wo_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        w13_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        w2_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    elif plane:
        # packed plane windows: 3N/8 (3-bit) or N/4 (2-bit) columns
        def _wcols(NT):
            return 3 * NT // 8 if wbits == 3 else NT // 4

        wq_spec = pl.BlockSpec((1, KB1, _wcols(NT1)), wq_w)
        wo_spec = pl.BlockSpec((1, KB3, _wcols(NT3)), wo_w)
        w13_spec = pl.BlockSpec((1, KB4, _wcols(NT4)), w13_w)
        w2_spec = pl.BlockSpec((1, KB5, _wcols(NT5)), w2_w)
    else:
        wq_spec = pl.BlockSpec((1, KB1 // kdiv, NT1), wq_w)
        wo_spec = pl.BlockSpec((1, KB3 // kdiv, NT3), wo_w)
        w13_spec = pl.BlockSpec((1, KB4 // kdiv, NT4), w13_w)
        w2_spec = pl.BlockSpec((1, KB5 // kdiv, NT5), w2_w)

    stream_scratch = []
    stream_ns = (2, 2, 2, 2)
    if stream:
        # ring depth per operand (wq, wo, w13, w2): deeper rings hold a
        # larger standing DMA backlog, bridging the compute-only
        # attention/wo window — sweep knob SBT_FUSED_NS="2,2,3,3"
        ns_env = _os.environ.get("SBT_FUSED_NS")
        if ns_env:
            stream_ns = tuple(int(v) for v in ns_env.split(","))
        for ns, (KBx, NTx) in zip(
                stream_ns, ((KB1, NT1), (KB3, NT3), (KB4, NT4), (KB5, NT5))):
            buf = pltpu.VMEM((KBx // kdiv, NTx), jnp.uint8)
            stream_scratch += [buf] * ns
        stream_scratch.append(
            pltpu.SemaphoreType.DMA((4, max(stream_ns))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_grid_layers, T_grid),
        in_specs=[
            pl.BlockSpec((B_pad, dim), lambda l, s, li_r, len_r, bt_r: (0, 0)),  # x
            pl.BlockSpec(
                (Wn, dim), lambda l, s, li_r, len_r, bt_r: ((li_r[0] + l) // Wn, 0)
            ),
            pl.BlockSpec(
                (Wn, dim), lambda l, s, li_r, len_r, bt_r: ((li_r[0] + l) // Wn, 0)
            ),
            pl.BlockSpec((B_pad, D), lambda l, s, li_r, len_r, bt_r: (0, 0)),  # cos
            pl.BlockSpec((B_pad, D), lambda l, s, li_r, len_r, bt_r: (0, 0)),  # sin
            wq_spec,
            pl.BlockSpec((1, G81, NT1), wq_sz),
            pl.BlockSpec((1, G81, NT1), wq_sz),
            wo_spec,
            pl.BlockSpec((1, G83, NT3), wo_sz),
            pl.BlockSpec((1, G83, NT3), wo_sz),
            w13_spec,
            pl.BlockSpec((1, G84, NT4), w13_sz),
            pl.BlockSpec((1, G84, NT4), w13_sz),
            w2_spec,
            pl.BlockSpec((1, G85, NT5), w2_sz),
            pl.BlockSpec((1, G85, NT5), w2_sz),
            pl.BlockSpec(memory_space=pltpu.HBM),  # k
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
            pl.BlockSpec(memory_space=pltpu.HBM),  # ks
            pl.BlockSpec(memory_space=pltpu.HBM),  # vs
        ],
        out_specs=[
            pl.BlockSpec((B_pad, dim), lambda l, s, li_r, len_r, bt_r: (0, 0)),
            # fresh bf16 scale rows, one block per grid layer (committed
            # OUTSIDE the kernel — no bf16 1-row write shape compiles)
            pl.BlockSpec((1, B_pad, Hkv),
                         lambda l, s, li_r, len_r, bt_r: (l, 0, 0)),
            pl.BlockSpec((1, B_pad, Hkv),
                         lambda l, s, li_r, len_r, bt_r: (l, 0, 0)),
            # k/v: ALIASED outputs written in-kernel (per-row (Hkv, D)
            # DMA at the untiled S index — the round-4 commit pattern)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            # scale pass-throughs (never written in-kernel): the outside
            # scatter runs on THESE, whose only consumer it is — XLA
            # then updates in place; scattering on the kernel's *input*
            # buffers made copy-insertion duplicate them per step
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B_pad, dim), jnp.float32),  # xcur (carried act row)
            pltpu.VMEM((B_pad, dim), jnp.int8),    # xq8
            pltpu.VMEM((B_pad, 1), jnp.float32),   # xs
            pltpu.VMEM((B_pad, Nq_s), jnp.float32),  # qkv (plane: N-pad)
            pltpu.VMEM((B_pad, HD), jnp.float32),  # attn out
            pltpu.VMEM((B_pad, HD), jnp.int8),     # a8 (wo input)
            pltpu.VMEM((B_pad, 1), jnp.float32),   # as_
            pltpu.VMEM((B_pad, dim), jnp.float32),  # xmid
            pltpu.VMEM((B_pad, N13_s), jnp.float32),  # h1 (plane: N-pad)
            pltpu.VMEM((B_pad, Fp), jnp.int8),     # g8 (w2 input; K-padded)
            pltpu.VMEM((B_pad, 1), jnp.float32),   # gs8
            pltpu.VMEM((B_pad, NT1), jnp.float32),  # accq
            pltpu.VMEM((B_pad, NT3), jnp.float32),  # acco
            pltpu.VMEM((B_pad, NT4), jnp.float32),  # acc13
            pltpu.VMEM((B_pad, NT5), jnp.float32),  # acc2
            # FLAT slabs: (S, Hkv*D) int8 + TRANSPOSED (Hkv, S) bf16 —
            # the dots consume them directly, no (S, Hkv, D) ->
            # (S, Hkv*D) sublane->lane relayout (exp23/exp30's B=32
            # residual)
            pltpu.VMEM(slab_lead + (S, KVD), jnp.int8),     # k slab
            pltpu.VMEM(slab_lead + (S, KVD), jnp.int8),     # v slab
            pltpu.VMEM(slab_lead + (Hkv, S), jnp.bfloat16),  # ks slab
            pltpu.VMEM(slab_lead + (Hkv, S), jnp.bfloat16),  # vs slab
            # fresh rows: 3-D (untiled leading dim) for the commit DMAs,
            # flat for the corrections; (Hkv, D) singles for the per-row
            # path's traced-row DMA source
            pltpu.VMEM((B_pad, Hkv, D), jnp.int8),          # krow3
            pltpu.VMEM((B_pad, Hkv, D), jnp.int8),          # vrow3
            pltpu.VMEM((B_pad, KVD), jnp.int8),             # kflat
            pltpu.VMEM((B_pad, KVD), jnp.int8),             # vflat
            pltpu.VMEM((Hkv, D), jnp.int8),                 # krow1
            pltpu.VMEM((Hkv, D), jnp.int8),                 # vrow1
        ] + ([
            # batched int8 attention operands: block-diagonal q8 + its
            # per-row quantization scales (built once per layer at the
            # rope step)
            pltpu.VMEM((B_pad * Hq, Hkv * D), jnp.int8),      # qbd8
            pltpu.VMEM((B_pad * Hq, 1), jnp.float32),         # qsc
        ] if batched else [])
        + [pltpu.SemaphoreType.DMA((max(n_sb, 1), 8))] + stream_scratch,
    )
    out, ksrows, vsrows, k2, v2, ks_t, vs_t = pl.pallas_call(
        functools.partial(
            _layer_kernel, B=B, Hq=Hq, Hkv=Hkv, D=D, dim=dim, F=F, gs=gs,
            eps=cfg.rms_eps, n_rep=n_rep, n_groups=n_groups,
            k1_t=k1_t, n1_t=n1_t, G81=G81, k3_t=k3_t, G83=G83,
            k4_t=k4_t, n4_t=n4_t, G84=G84, k5_t=k5_t, G85=G85,
            debug_out=debug_out,
            prefetch_slabs=(B == 1 and _n_phases >= 2 and not batched),
            paged=paged, sc=SC, signed=signed, stream=stream,
            stream_ns=stream_ns, batched=batched, gb=gb, s_full=S,
            s_wmax=S_cache, n_sb=n_sb, wbits=wbits, np_t=np_t,
            _ablate=_ablate,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B_pad, dim), jnp.float32),
            jax.ShapeDtypeStruct((Lg, B_pad, Hkv), jnp.bfloat16),
            jax.ShapeDtypeStruct((Lg, B_pad, Hkv), jnp.bfloat16),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        # caches alias through (inputs 20..23 -> outputs 3..6, after 3
        # scalar-prefetch + 17 tensor args): k/v rows are written
        # in-kernel; the scale pair passes through untouched so the
        # commit below scatters on single-consumer buffers
        input_output_aliases={20: 3, 21: 4, 22: 5, 23: 6},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # five phases' tiles + KV slabs + activation scratch exceed the
            # 16 MB default scoped-VMEM budget; v5e has far more physical
            # VMEM — raise the cap rather than shrink tiles
            vmem_limit_bytes=int(_os.environ.get(
                "SBT_FUSED_VMEM", 100 * 1024 * 1024)),
        ),
        interpret=interpret,
    )(jnp.stack([jnp.reshape(li, ()).astype(jnp.int32),
                 jnp.reshape(li if li_cache is None else li_cache,
                             ()).astype(jnp.int32)]),
      pos.astype(jnp.int32),
      bt_arr,
      x, attn_norm, ffn_norm, cos, sin,
      wq, sq, zq, wo, so, zo, w13, s13, z13, w2, s2, z2, k, v, ks, vs)

    # ---- commit the fresh SCALE rows OUTSIDE the kernel ---------------------
    # (k/v rows were written in-kernel through the aliased outputs.) One
    # advanced-index scatter per scale buffer: the TPU scatter lowering
    # copies its operand, but these buffers are Hkv*2 bytes/row — ~100x
    # smaller than k/v — so the copy is noise (~0.04 ms at B=8/7B). The
    # profiling grid truncation (_n_phases < 5) still commits — rows are
    # garbage then, matching the knob's outputs-are-garbage contract.
    pos_i = jnp.minimum(pos.astype(jnp.int32), S_cache - 1)  # idle clamp
    rows_ks = ksrows[:, :B]
    rows_vs = vsrows[:, :B]
    if paged:
        # scale rows land at [l, bt[b, pos // block], :, pos % block];
        # the non-adjacent advanced indices move the batch dim to the
        # front, so the value arrives (B, Lg, Hkv)
        blk = jnp.take_along_axis(bt_arr, (pos_i // SC)[:, None], 1)[:, 0]
        rw = pos_i % SC
        ks2 = ks_t.at[:, blk, :, rw].set(jnp.swapaxes(rows_ks, 0, 1))
        vs2 = vs_t.at[:, blk, :, rw].set(jnp.swapaxes(rows_vs, 0, 1))
    else:
        li_c0 = jnp.reshape(li if li_cache is None else li_cache,
                            ()).astype(jnp.int32)
        if B == 1:
            # one provably-in-place DUS per buffer (no scatter op cost —
            # it showed up as ~0.1 ms/step on the B=1 headline)
            ks2 = jax.lax.dynamic_update_slice(
                ks_t, rows_ks[:, :, :, None],
                (li_c0, jnp.int32(0), jnp.int32(0), pos_i[0]))
            vs2 = jax.lax.dynamic_update_slice(
                vs_t, rows_vs[:, :, :, None],
                (li_c0, jnp.int32(0), jnp.int32(0), pos_i[0]))
        elif B <= 16:
            # advanced-index scatter: one op per buffer; its functional
            # operand copy is cheap at these sizes (~0.04 ms at B=8/7B)
            li_idx = (li_c0 + jnp.arange(Lg, dtype=jnp.int32))[:, None]
            b_idx = jnp.arange(B, dtype=jnp.int32)[None, :]
            ks2 = ks_t.at[li_idx, b_idx, :, pos_i[None, :]].set(rows_ks)
            vs2 = vs_t.at[li_idx, b_idx, :, pos_i[None, :]].set(rows_vs)
        else:
            # unrolled per-row DUS chain: at B=32 the scatter's operand
            # copies cost ~0.95 ms/step (4 x 33.5 MB buffers round-trip);
            # 2 parallel chains of B in-place DUS ops are cheaper
            ks2, vs2 = ks_t, vs_t
            for b in range(B):
                ks2 = jax.lax.dynamic_update_slice(
                    ks2, rows_ks[:, b][:, None, :, None],
                    (li_c0, jnp.int32(b), jnp.int32(0), pos_i[b]))
                vs2 = jax.lax.dynamic_update_slice(
                    vs2, rows_vs[:, b][:, None, :, None],
                    (li_c0, jnp.int32(b), jnp.int32(0), pos_i[b]))
    return out[:B], k2, v2, ks2, vs2
