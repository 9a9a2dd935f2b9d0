"""Fused single-token decode attention over the (INT8) KV cache.

The XLA decode-attention path costs ~10 device events per layer (dequant
fusions, repeat_kv slices, two matmul fusions, softmax fusions) and on this
fabric every dependent event pays a fixed turnaround — the measured gap
between summed event time and the decode step's device span is ~1.5 ms/tok
at 7B (docs/perf_notes.md). This kernel folds dequant + scores + mask +
softmax + value-mix into ONE Pallas launch per layer.

Formulation (B = batch, S = cache rows, Hkv = kv heads, R = q heads per kv
head, D = head dim): grid (B, Hkv); each step dequants one (S, D) K/V
slab (~256 KB f32 — a whole-cache f32 temporary blows the scoped-VMEM
budget at 7B sizes) and runs two MXU dots:

    scores = Kf @ q_groupᵀ            (S, D) x (D, R)
    p      = softmax_S(scores masked to s <= length[b])
    out    = pᵀ @ Vf                  (R, S) x (S, D)

The per-(token, head) cache scales ride along; ``length`` arrives via
scalar prefetch. Cache UPDATE stays outside (one tiny XLA
dynamic-update-slice per buffer): aliasing the whole slab through the
kernel would write 2 MB back per layer for a 1-row change.

Reference: HF eager attention re-reads full fp16 K/V (llama_wrapper.py);
this is the INT8-cache, one-launch TPU replacement.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _head_sel(Hsrc, hgq, base_kv, n_rep, dtype=jnp.float32):
    """(Hsrc, hgq) one-hot matrix mapping q-column j -> kv head
    base_kv + j // n_rep; a dot against it gathers per-head scale columns
    for a whole head group in ONE MXU op (lane-dim head indexing cannot be
    dynamically sliced)."""
    src = jax.lax.broadcasted_iota(jnp.int32, (Hsrc, hgq), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Hsrc, hgq), 1) // n_rep
    return (src == base_kv + col).astype(dtype)


def _group_attention(k8g, v8g, qg, ks_cols, vs_cols, length, n_rep,
                     f32_dots=False):
    """Masked-softmax attention for a whole head GROUP in TWO MXU dots.

    k8g/v8g (S, hg, D) int8 (or float when f32_dots); qg (hgq, D) f32 with
    hgq = hg * n_rep; ks_cols/vs_cols (S, hgq) per-Q-COLUMN cache row
    scales (pass ones for float caches); length scalar int32 (rows
    [0, length] attend). Returns (hgq, D) f32.

    The round-2 phase profile showed the per-head matvec loop dominating
    the fused kernels (37.8 us vs ~6 us of slab DMA per layer at 7B): 2*hg
    serial (S, D) x (D, n_rep) dots under-feed the MXU. Here scores for
    every head ride ONE (S, hg*D) x (hg*D, hgq) dot against a BLOCK-
    DIAGONAL q matrix (off-head rows zeroed, so cross-head terms vanish),
    and the value mix is ONE (hgq, S) x (S, hg*D) dot from which each
    row's own head block is extracted with an iota mask + sublane reduce.
    The wasted hg x lanes are free — the MXU was idle either way — and
    the bf16-mul/f32-acc precision matches the per-head formulation
    exactly."""
    S, hg, D = k8g.shape
    hgq = qg.shape[0]
    dt = jnp.float32 if f32_dots else jnp.bfloat16
    prec = jax.lax.Precision.HIGHEST if f32_dots else None
    K2 = k8g.reshape(S, hg * D).astype(dt)
    V2 = v8g.reshape(S, hg * D).astype(dt)
    qT = qg.T.astype(dt)  # (D, hgq) — 4 KB relayout
    Vq = jnp.concatenate([qT] * hg, axis=0)  # (hg*D, hgq)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hg * D, hgq), 0) // D
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hg * D, hgq), 1) // n_rep
    Qbd = jnp.where(row_h == col_h, Vq, jnp.zeros((), dt))
    scores = jnp.dot(K2, Qbd, preferred_element_type=jnp.float32,
                     precision=prec)  # (S, hgq)
    scores = scores * ks_cols * (1.0 / (D ** 0.5))
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (S, hgq), 0)
    scores = jnp.where(s_idx <= length, scores, -1e30)
    m = jnp.max(scores, axis=0, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=0, keepdims=True)  # (1, hgq)
    p2 = (p * vs_cols).astype(dt)  # V's row scales fold into p
    # contract S with S directly (no materialized (hgq, S) transpose)
    outs = jax.lax.dot_general(
        p2, V2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (hgq, hg*D)
    o3 = outs.reshape(hgq, hg, D)
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (hgq, hg, 1), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (hgq, hg, 1), 0) // n_rep
    )
    out = jnp.sum(jnp.where(own, o3, 0.0), axis=1)  # (hgq, D)
    return out / denom.reshape(-1, 1)


def _group_attention_t(k8g, v8g, qg, ks_colsT, vs_colsT, length, n_rep):
    """TRANSPOSED-score variant of _group_attention for the batched
    megakernel: scores live (hgq, S) instead of (S, hgq).

    Why: the (S, hg*D) x (hg*D, hgq) score dot puts hgq (32 at 7B) on the
    MXU's 128-lane output dim — 25% lane utilisation, and with S on
    sublanes it costs (S/8)*(K/128) passes = 2048 at 7B shapes. Computing
    scores^T = Qbd^T (hgq, hg*D) x K2^T via a lane-lane contraction puts
    S (512) on lanes: (hgq/8)*(S/128)*(K/128) = 512 passes — 4x fewer.
    The softmax then reduces over LANES (cheap VPU) and the value mix is
    the same (hgq, S) x (S, hg*D) dot as before. exp22: the per-row
    attention loop drops ~2x at B=8. ks_colsT/vs_colsT are (hgq, S)."""
    S, hg, D = k8g.shape
    hgq = qg.shape[0]
    dt = jnp.bfloat16
    K2 = k8g.reshape(S, hg * D).astype(dt)
    V2 = v8g.reshape(S, hg * D).astype(dt)
    q_wide = jnp.tile(qg.astype(dt), (1, hg))  # (hgq, hg*D)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hgq, hg * D), 1) // D
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hgq, hg * D), 0) // n_rep
    QbdT = jnp.where(col_h == row_h, q_wide, jnp.zeros((), dt))
    scoresT = jax.lax.dot_general(
        QbdT, K2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (hgq, S)
    scoresT = scoresT * ks_colsT * (1.0 / (D ** 0.5))
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (hgq, S), 1)
    scoresT = jnp.where(s_idx <= length, scoresT, -1e30)
    m = jnp.max(scoresT, axis=1, keepdims=True)
    p = jnp.exp(scoresT - m)
    denom = jnp.sum(p, axis=1, keepdims=True)  # (hgq, 1)
    p2 = (p * vs_colsT).astype(dt)
    outs = jax.lax.dot_general(
        p2, V2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (hgq, hg*D)
    o3 = outs.reshape(hgq, hg, D)
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (hgq, hg, 1), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (hgq, hg, 1), 0) // n_rep
    )
    out = jnp.sum(jnp.where(own, o3, 0.0), axis=1)  # (hgq, D)
    return out / denom


def _group_attention_rows(kslab, vslab, q_all, ks_slab, vs_slab, len_vec,
                          n_rep, selT):
    """Batched-row attention for the megakernel's batched phase: per-row
    MXU dots (each row has its OWN K/V slab — they cannot share a dot),
    but ALL elementwise/VPU work — Qbd^T construction, scale-column
    gathers' masks, softmax, value-scale fold, own-head extract — runs
    ONCE on (B*hgq, ...) shapes instead of B unrolled copies (exp22: the
    per-row glue, not the dots, dominated the 50 us/layer phase cost).

    kslab/vslab (B, S, hg, D) int8; q_all (B, hgq, D) f32; ks_slab/vs_slab
    (B, S, Hp) f32; len_vec (B,) int32; selT (hgq, Hp) head-gather.
    Returns (B, hgq, D) f32."""
    B, S, hg, D = kslab.shape
    hgq = q_all.shape[1]
    dt = jnp.bfloat16
    q2 = q_all.reshape(B * hgq, D).astype(dt)
    q_wide = jnp.tile(q2, (1, hg))  # (B*hgq, hg*D)
    col_h = jax.lax.broadcasted_iota(jnp.int32, (B * hgq, hg * D), 1) // D
    row_h = (
        jax.lax.broadcasted_iota(jnp.int32, (B * hgq, hg * D), 0) % hgq
    ) // n_rep
    QbdT = jnp.where(col_h == row_h, q_wide, jnp.zeros((), dt))

    scores_parts, ks_parts, vs_parts = [], [], []
    for b in range(B):
        K2 = kslab[b].reshape(S, hg * D).astype(dt)
        scores_parts.append(jax.lax.dot_general(
            QbdT[b * hgq:(b + 1) * hgq], K2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # (hgq, S)
        ks_parts.append(jax.lax.dot_general(
            selT, ks_slab[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        vs_parts.append(jax.lax.dot_general(
            selT, vs_slab[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    scoresT = jnp.concatenate(scores_parts, axis=0)  # (B*hgq, S)
    ksT = jnp.concatenate(ks_parts, axis=0)
    vsT = jnp.concatenate(vs_parts, axis=0)

    # per-row lengths via a one-hot f32 dot (jnp.repeat lowers to scatter
    # and a (B, hgq)->(B*hgq, 1) reshape is an unsupported Mosaic shape
    # cast — neither compiles on TC)
    sel_b = (
        jax.lax.broadcasted_iota(jnp.int32, (B * hgq, B), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (B * hgq, B), 0) // hgq
    ).astype(jnp.float32)
    len_rows = jnp.dot(sel_b, len_vec.astype(jnp.float32)[:, None],
                       preferred_element_type=jnp.float32)  # (B*hgq, 1)
    s_cols = jax.lax.broadcasted_iota(jnp.int32, (B * hgq, S), 1).astype(
        jnp.float32)
    valid = s_cols <= len_rows
    scoresT = jnp.where(
        valid, scoresT * ksT * (1.0 / (D ** 0.5)), -1e30)
    m = jnp.max(scoresT, axis=1, keepdims=True)
    p = jnp.exp(scoresT - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p2 = (p * jnp.where(valid, vsT, 0.0)).astype(dt)

    out_parts = []
    for b in range(B):
        V2 = vslab[b].reshape(S, hg * D).astype(dt)
        out_parts.append(jax.lax.dot_general(
            p2[b * hgq:(b + 1) * hgq], V2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # (hgq, hg*D)
    outs = jnp.concatenate(out_parts, axis=0)  # (B*hgq, hg*D)
    o3 = outs.reshape(B * hgq, hg, D)
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (B * hgq, hg, 1), 1)
        == (jax.lax.broadcasted_iota(jnp.int32, (B * hgq, hg, 1), 0) % hgq)
        // n_rep
    )
    out = jnp.sum(jnp.where(own, o3, 0.0), axis=1)  # (B*hgq, D)
    return (out / denom).reshape(B, hgq, D)


def _group_attention_rows_int8(kslab, vslab, q8_rows, qsc, ks_slab,
                               vs_slab, len_vec, n_rep, selT):
    """Batched-row attention with INT8 MXU dots end-to-end — the round-4
    batched megakernel formulation. The bf16 variant's cost was the
    int8->bf16 slab casts (~2.2 us per (512, 4096) slab, x2 slabs x8 rows
    ~ 35 us/layer at B=8; exp22/23): here the score dot consumes the int8
    K slab directly against a per-row-quantized block-diagonal q8, and
    the value mix quantizes the scale-folded probabilities to int8 per
    row — both noise terms sit at the same ~1/254 relative level as the
    INT8 KV cache itself.

    kslab/vslab (B, S, hg, D) int8; q8_rows (B*hgq, hg*D) int8
    block-diagonal (off-head columns zero); qsc (B*hgq, 1) f32 per-row q
    scales; ks_slab/vs_slab (B, S, Hp) f32; len_vec (B,) int32; selT
    (hgq, Hp). Returns (B, hgq, D) f32."""
    B, S, hg, D = kslab.shape
    hgq = q8_rows.shape[0] // B

    scores_parts, ks_parts, vs_parts = [], [], []
    for b in range(B):
        K2 = kslab[b].reshape(S, hg * D)  # int8, no cast
        scores_parts.append(jax.lax.dot_general(
            q8_rows[b * hgq:(b + 1) * hgq], K2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ))  # (hgq, S) int32 — exact
        ks_parts.append(jax.lax.dot_general(
            selT, ks_slab[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        vs_parts.append(jax.lax.dot_general(
            selT, vs_slab[b], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    scoresT = jnp.concatenate(scores_parts, axis=0).astype(jnp.float32)
    scoresT = scoresT * qsc  # fold the per-row q quantization scale back
    ksT = jnp.concatenate(ks_parts, axis=0)
    vsT = jnp.concatenate(vs_parts, axis=0)

    sel_b = (
        jax.lax.broadcasted_iota(jnp.int32, (B * hgq, B), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (B * hgq, B), 0) // hgq
    ).astype(jnp.float32)
    len_rows = jnp.dot(sel_b, len_vec.astype(jnp.float32)[:, None],
                       preferred_element_type=jnp.float32)
    s_cols = jax.lax.broadcasted_iota(jnp.int32, (B * hgq, S), 1).astype(
        jnp.float32)
    valid = s_cols <= len_rows
    scoresT = jnp.where(
        valid, scoresT * ksT * (1.0 / (D ** 0.5)), -1e30)
    m = jnp.max(scoresT, axis=1, keepdims=True)
    p = jnp.exp(scoresT - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p2 = p * jnp.where(valid, vsT, 0.0)  # f32, >= 0
    psc = jnp.maximum(jnp.max(p2, axis=1, keepdims=True), 1e-30) / 127.0
    p8 = jnp.clip(jnp.round(p2 / psc), 0, 127).astype(jnp.int8)

    out_parts = []
    for b in range(B):
        V2 = vslab[b].reshape(S, hg * D)  # int8, no cast
        out_parts.append(jax.lax.dot_general(
            p8[b * hgq:(b + 1) * hgq], V2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ))  # (hgq, hg*D) int32
    outs = jnp.concatenate(out_parts, axis=0).astype(jnp.float32) * psc
    o3 = outs.reshape(B * hgq, hg, D)
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (B * hgq, hg, 1), 1)
        == (jax.lax.broadcasted_iota(jnp.int32, (B * hgq, hg, 1), 0) % hgq)
        // n_rep
    )
    out = jnp.sum(jnp.where(own, o3, 0.0), axis=1)  # (B*hgq, D)
    return (out / denom).reshape(B, hgq, D)


def _flat_attention_rows_int8(kslabs, vslabs, q8_rows, qsc, ks_slabs,
                              vs_slabs, len_vec, n_rep, selT, kf_all,
                              vf_all, ksf_all, vsf_all, sel_fresh):
    """INT8 attention over FLAT (S, Hkv*D) slabs — the round-5 batched
    megakernel formulation. The flat cache layout kills the
    (S, Hkv, D) -> (S, Hkv*D) sublane->lane relayout that dominated the
    batched phase (exp23/exp30: ~209 us/layer at B=32), but the slab can
    no longer be PATCHED with the current token's row in VMEM (1-row
    dynamic-sublane stores are rejected — probe_toolchain
    vmem_row_store_dyn/vmem_row_dma_dyn), so each row's ``length`` column
    is CORRECTED instead: the score at that column is recomputed against
    the fresh rows buffer, the scale columns are overwritten with the
    fresh scales, and the value mix splits into (stale-slab dot with the
    fresh column's probability zeroed) + (that probability times the
    fresh V row). All int32 arithmetic is identical to a patched-slab
    formulation, so results are BIT-EXACT to one — and the B=1 path calls
    this same function with B == 1, preserving the kernel-level
    B=1-vs-batched row-exactness contract (round 4).

    kslabs/vslabs: length-B sequence of (S, KVD) int8 slabs (values or
    refs indexable per row) — STALE at each row's length column;
    q8_rows (B*hgq, KVD) int8 block-diagonal; qsc (B*hgq, 1) f32 per-row
    q scales; ks_slabs/vs_slabs: length-B sequence of (Hkv, S) bf16
    TRANSPOSED scale slabs (tight heads, 8x fewer bytes than the f32
    Hp=128 lane-padded slabs — VERDICT r4 #2; heads on sublanes because
    Mosaic rejects DMA slices whose lane dim is a sub-128 Hkv, while
    128-row lane chunks of (Hkv, S) are tile-aligned by construction);
    len_vec (B,) int32; selT (hgq, Hkv) one-hot head gather;
    kf_all/vf_all (B_pad, KVD) int8 fresh rows; ksf_all/vsf_all
    (B_pad, Hkv) f32 fresh scale rows; sel_fresh (B*hgq, B_pad) {0,1}
    mapping each q row to its fresh-rows index.
    Returns (B, hgq, D) f32.
    """
    B = len(kslabs)
    S, KVD = kslabs[0].shape[-2], kslabs[0].shape[-1]
    hgq = q8_rows.shape[0] // B
    Hkv = ks_slabs[0].shape[-2]
    D = KVD // Hkv
    R = B * hgq
    selT_b = selT.astype(jnp.bfloat16)  # exact one-hot in bf16

    scores_parts, ks_parts, vs_parts = [], [], []
    for b in range(B):
        K2 = kslabs[b][...]  # (S, KVD) int8 — already flat, no relayout
        scores_parts.append(jax.lax.dot_general(
            q8_rows[b * hgq:(b + 1) * hgq], K2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ))  # (hgq, S) int32 — exact
        ks_parts.append(jax.lax.dot_general(
            selT_b, ks_slabs[b][...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))  # (hgq, S)
        vs_parts.append(jax.lax.dot_general(
            selT_b, vs_slabs[b][...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    scoresT_i = jnp.concatenate(scores_parts, axis=0)  # (R, S) int32
    ksT = jnp.concatenate(ks_parts, axis=0)
    vsT = jnp.concatenate(vs_parts, axis=0)

    # fresh-row corrections: raw scores vs ALL fresh rows, own col picked
    # by sel_fresh (int arithmetic == a patched slab's column exactly).
    # A single fresh row (the B=1 fast path) uses exact elementwise
    # forms — Mosaic rejects K=1/N=1 int32 dots, and the one-hot selects
    # degenerate to broadcasts anyway.
    single = kf_all.shape[0] == 1
    if single:
        fresh_own = jnp.sum(
            q8_rows.astype(jnp.int32) * kf_all.astype(jnp.int32),
            axis=1, keepdims=True)  # (R, 1) — exact, == the dot
        ks_rows_f = jnp.broadcast_to(ksf_all, (R, Hkv))
        vs_rows_f = jnp.broadcast_to(vsf_all, (R, Hkv))
    else:
        fresh_all = jax.lax.dot_general(
            q8_rows, kf_all, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)  # (R, B_pad)
        sel_i = sel_fresh.astype(jnp.int32)
        fresh_own = jnp.sum(
            jnp.where(sel_i > 0, fresh_all, 0), axis=1, keepdims=True)
        # fresh scale per q row: its fresh row's scales, own head picked
        sel_f = sel_fresh.astype(jnp.float32)
        ks_rows_f = jnp.dot(sel_f, ksf_all,
                            preferred_element_type=jnp.float32)  # (R, Hkv)
        vs_rows_f = jnp.dot(sel_f, vsf_all,
                            preferred_element_type=jnp.float32)
    head_own = (
        jax.lax.broadcasted_iota(jnp.int32, (R, Hkv), 1)
        == (jax.lax.broadcasted_iota(jnp.int32, (R, Hkv), 0) % hgq)
        // n_rep
    )
    ks_fresh = jnp.sum(jnp.where(head_own, ks_rows_f, 0.0), axis=1,
                       keepdims=True)  # (R, 1)
    vs_fresh = jnp.sum(jnp.where(head_own, vs_rows_f, 0.0), axis=1,
                       keepdims=True)

    # per-row lengths via a one-hot f32 dot (jnp.repeat lowers to scatter
    # and a (B, hgq)->(B*hgq, 1) reshape is an unsupported Mosaic shape
    # cast — neither compiles on TC)
    sel_b = (
        jax.lax.broadcasted_iota(jnp.int32, (R, B), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (R, B), 0) // hgq
    ).astype(jnp.float32)
    len_rows = jnp.dot(sel_b, len_vec.astype(jnp.float32)[:, None],
                       preferred_element_type=jnp.float32)  # (R, 1)
    s_cols = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1).astype(
        jnp.float32)
    is_new = s_cols == len_rows
    scoresT = jnp.where(is_new, fresh_own, scoresT_i).astype(
        jnp.float32) * qsc  # fold the per-row q quantization scale back
    ksT = jnp.where(is_new, ks_fresh, ksT)
    vsT = jnp.where(is_new, vs_fresh, vsT)
    valid = s_cols <= len_rows
    scoresT = jnp.where(
        valid, scoresT * ksT * (1.0 / (D ** 0.5)), -1e30)
    m = jnp.max(scoresT, axis=1, keepdims=True)
    p = jnp.exp(scoresT - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p2 = p * jnp.where(valid, vsT, 0.0)  # f32, >= 0
    psc = jnp.maximum(jnp.max(p2, axis=1, keepdims=True), 1e-30) / 127.0
    p8 = jnp.clip(jnp.round(p2 / psc), 0, 127).astype(jnp.int8)
    p8_i = p8.astype(jnp.int32)
    pval = jnp.sum(jnp.where(is_new, p8_i, 0), axis=1,
                   keepdims=True)  # (R, 1) int32
    p8m = jnp.where(is_new, jnp.int8(0), p8)

    out_parts = []
    for b in range(B):
        V2 = vslabs[b][...]  # (S, KVD) int8, flat
        out_parts.append(jax.lax.dot_general(
            p8m[b * hgq:(b + 1) * hgq], V2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ))  # (hgq, KVD) int32
    outs_i = jnp.concatenate(out_parts, axis=0)
    # rank-1 fresh-V term: pval * own fresh row (int32, exact — max
    # magnitude 127*127 per element)
    if single:
        v_fresh_rows = jnp.broadcast_to(
            vf_all.astype(jnp.int32), (R, KVD))
    else:
        v_fresh_rows = jax.lax.dot_general(
            sel_fresh.astype(jnp.int8), vf_all,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (R, KVD)
    outs = (outs_i + pval * v_fresh_rows).astype(jnp.float32) * psc
    o3 = outs.reshape(R, Hkv, D)
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (R, Hkv, 1), 1)
        == (jax.lax.broadcasted_iota(jnp.int32, (R, Hkv, 1), 0) % hgq)
        // n_rep
    )
    out = jnp.sum(jnp.where(own, o3, 0.0), axis=1)  # (R, D)
    return (out / denom).reshape(B, hgq, D)


def _group_attention_t_int8(k8g, v8g, qg, ks_colsT, vs_colsT, length,
                            n_rep):
    """Single-row INT8 variant of _group_attention_t (the B=1 megakernel
    attention phase): per-head int8 q against the int8 K slab, int8
    probability mix against the int8 V slab — numerically IDENTICAL to
    one row of _group_attention_rows_int8, so B=1 decode and batched
    decode agree exactly (the serving engines' cross-path token-parity
    contract). k8g/v8g (S, hg, D) int8; qg (hgq, D) f32;
    ks_colsT/vs_colsT (hgq, S) f32."""
    S, hg, D = k8g.shape
    hgq = qg.shape[0]
    qs = jnp.maximum(
        jnp.max(jnp.abs(qg), axis=1, keepdims=True), 1e-30) / 127.0
    q8 = jnp.clip(jnp.round(qg / qs), -127, 127).astype(jnp.int8)
    q_wide = jnp.tile(q8, (1, hg))  # (hgq, hg*D) int8
    col_h = jax.lax.broadcasted_iota(jnp.int32, (hgq, hg * D), 1) // D
    row_h = jax.lax.broadcasted_iota(jnp.int32, (hgq, hg * D), 0) // n_rep
    Qbd8 = jnp.where(col_h == row_h, q_wide, jnp.int8(0))
    K2 = k8g.reshape(S, hg * D)  # int8, no cast
    scoresT = jax.lax.dot_general(
        Qbd8, K2, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * qs  # (hgq, S)
    scoresT = scoresT * ks_colsT * (1.0 / (D ** 0.5))
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (hgq, S), 1)
    scoresT = jnp.where(s_idx <= length, scoresT, -1e30)
    m = jnp.max(scoresT, axis=1, keepdims=True)
    p = jnp.exp(scoresT - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p2 = p * jnp.where(s_idx <= length, vs_colsT, 0.0)
    psc = jnp.maximum(jnp.max(p2, axis=1, keepdims=True), 1e-30) / 127.0
    p8 = jnp.clip(jnp.round(p2 / psc), 0, 127).astype(jnp.int8)
    V2 = v8g.reshape(S, hg * D)
    outs = jax.lax.dot_general(
        p8, V2, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * psc  # (hgq, hg*D)
    o3 = outs.reshape(hgq, hg, D)
    own = (
        jax.lax.broadcasted_iota(jnp.int32, (hgq, hg, 1), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (hgq, hg, 1), 0) // n_rep
    )
    out = jnp.sum(jnp.where(own, o3, 0.0), axis=1)  # (hgq, D)
    return out / denom


def _decode_attn_kernel(*refs, n_rep, quantized, stacked=False):
    if stacked:
        # stacked variant: scalar-prefetched layer index selects the K/V
        # blocks via the BlockSpec index maps; the kernel body only sees
        # one extra leading unit dim on the cache refs
        li_ref, len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref = refs
    else:
        len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref = refs
    lead = (0, 0) if stacked else (0,)
    S = k_ref.shape[-3]
    Hkv = k_ref.shape[-2]
    D = k_ref.shape[-1]
    b = pl.program_id(0)
    length = len_ref[b]

    # Head-GROUP per grid step (hg heads): two constraints shape this.
    # (1) Stack budget: a fully unrolled in-kernel head loop makes the
    #     stack allocator SUM every head's f32 dequant temporaries (no
    #     cross-iteration reuse) and blows the 16 MB scoped-VMEM limit at
    #     7B sizes — so heads must be swept by the grid, which reuses the
    #     stack between steps.
    # (2) Mosaic requires dynamic sublane (dim-2) offsets to be provably
    #     8-aligned — so the grid step picks a GROUP of 8 heads (offset
    #     g*8) and a static loop walks the group. Hkv < 8 (or not a
    #     multiple) degenerates to one group with a static 0 offset.
    n_groups = pl.num_programs(1)
    hg = Hkv // n_groups
    if n_groups == 1:
        base_kv, base_q = 0, 0  # static — no alignment proof needed
    else:
        g = pl.program_id(1)
        base_kv = pl.multiple_of(g * hg, hg)
        base_q = pl.multiple_of(g * hg * n_rep, hg * n_rep)
    sl = slice(None)
    hgq = hg * n_rep
    S_ = k_ref.shape[-3]
    k8g = k_ref[lead + (sl, pl.ds(base_kv, hg), sl)]  # (S, hg, D) int8/float
    v8g = v_ref[lead + (sl, pl.ds(base_kv, hg), sl)]
    qg = q_ref[0, pl.ds(base_q, hgq), :]  # (hgq, D)
    if quantized:
        # Scale slabs put Hkv on the LANE dim, where dynamic slices must be
        # 128-aligned — gather the group's per-head columns with ONE
        # one-hot dot instead of per-head mask+reduce.
        sel = _head_sel(Hkv, hgq, base_kv, n_rep)
        ks_cols = jnp.dot(ks_ref[lead], sel)  # (S, hgq)
        vs_cols = jnp.dot(vs_ref[lead], sel)
    else:
        ks_cols = vs_cols = jnp.ones((S_, hgq), jnp.float32)
    # f32 HIGHEST dots: this is the generic "exact" decode-attention API
    # (2e-4 oracle tests); the serving-path update/megakernel variants use
    # the bf16-mul/f32-acc formulation instead (XLA's own MXU default).
    out = _group_attention(
        k8g, v8g, qg.astype(jnp.float32), ks_cols, vs_cols, length, n_rep,
        f32_dots=True,
    )
    o_ref[0, pl.ds(base_q, hgq), :] = out


def decode_attention(q, k, v, k_scale, v_scale, length, n_heads,
                     interpret=False):
    """q (B, H, D); k/v (B, S, Hkv, D) int8 or float; scales (B, S, Hkv)
    f32 (ignored for float caches); length (B,) int32 — rows [0, length]
    inclusive attend (the current token's row is already written at
    position ``length``). Returns (B, H, D) f32."""
    B, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    n_rep = H // Hkv
    quantized = jnp.issubdtype(k.dtype, jnp.integer)
    if not quantized:
        # placeholders keep the operand list static (never read)
        k_scale = jnp.zeros((B, S, Hkv), jnp.float32)
        v_scale = jnp.zeros((B, S, Hkv), jnp.float32)

    # 8-head groups per grid step: dynamic sublane offsets must be provably
    # 8-aligned for Mosaic, so offsets are g*8; Hkv not a multiple of 8
    # degenerates to a single group with a static 0 offset.
    n_groups = Hkv // 8 if Hkv % 8 == 0 else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_groups),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, h, len_ref: (b, 0, 0)),
            pl.BlockSpec((1, S, Hkv, D), lambda b, h, len_ref: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, Hkv, D), lambda b, h, len_ref: (b, 0, 0, 0)),
            pl.BlockSpec((1, S, Hkv), lambda b, h, len_ref: (b, 0, 0)),
            pl.BlockSpec((1, S, Hkv), lambda b, h, len_ref: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, h, len_ref: (b, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _decode_attn_kernel, n_rep=n_rep, quantized=bool(quantized)
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(length.astype(jnp.int32), q, k, v, k_scale, v_scale)


def decode_attention_stacked(q, k, v, k_scale, v_scale, li, length, n_heads,
                             interpret=False):
    """Cache-resident variant for the scan-over-layers decode: k/v are the
    FULL layer-stacked caches (L, B, S, Hkv, D) (scales (L, B, S, Hkv)) and
    the scalar-prefetched layer index ``li`` selects the layer inside the
    BlockSpec index maps — the stack is indexed in place in HBM, never
    sliced into a fresh buffer. This is the same fix the stacked
    quant_matmul kernels apply to the packed weights; without it XLA's
    slice-out/write-back of the carried cache copies the whole stack every
    layer step (measured ~4.6 ms/tok at 7B — the round-1 scan regression).
    """
    B, H, D = q.shape
    Lx, S, Hkv = k.shape[0], k.shape[2], k.shape[3]
    n_rep = H // Hkv
    quantized = jnp.issubdtype(k.dtype, jnp.integer)
    if not quantized:
        k_scale = jnp.zeros((1, B, S, Hkv), jnp.float32)
        v_scale = jnp.zeros((1, B, S, Hkv), jnp.float32)

    n_groups = Hkv // 8 if Hkv % 8 == 0 else 1
    li_arr = jnp.reshape(li, (1,)).astype(jnp.int32)
    sc_L = k_scale.shape[0]  # 1 when float placeholders

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # (layer index, lengths)
        grid=(B, n_groups),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, h, li_r, len_r: (b, 0, 0)),
            pl.BlockSpec(
                (1, 1, S, Hkv, D),
                lambda b, h, li_r, len_r: (li_r[0], b, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, S, Hkv, D),
                lambda b, h, li_r, len_r: (li_r[0], b, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, S, Hkv),
                lambda b, h, li_r, len_r: (jnp.minimum(li_r[0], sc_L - 1), b, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, S, Hkv),
                lambda b, h, li_r, len_r: (jnp.minimum(li_r[0], sc_L - 1), b, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, H, D), lambda b, h, li_r, len_r: (b, 0, 0)),
    )
    return pl.pallas_call(
        functools.partial(
            _decode_attn_kernel, n_rep=n_rep, quantized=bool(quantized),
            stacked=True,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(li_arr, length.astype(jnp.int32), q, k, v, k_scale, v_scale)


def _attn_update_kernel(li_ref, len_ref, q_ref, kn_ref, vn_ref,
                        k_hbm, v_hbm, ks_hbm, vs_hbm,
                        o_ref, ko_hbm, vo_hbm, kso_hbm, vso_hbm,
                        kslab, vslab, ks_slab, vs_slab,
                        krow, vrow, ksrow, vsrow, sems,
                        *, n_rep):
    """Fused KV-quant + cache row update + decode attention, in-place.

    The cache stacks (L, B, S, Hkv, D) stay in HBM (memory_space=ANY) and
    are ALIASED input->output, so the row update is a true in-place write —
    XLA-level scatter/dynamic-update-slice of a carried cache forces a copy
    of the whole ~64 MB stack per layer step around the opaque kernel call
    (measured 4.6 ms/tok at 7B; the round-2 scan bottleneck). Per (b, g=0)
    step: quantize the new K/V rows per head, DMA them into the cache row
    [li, b, len_b], DMA the (S, Hkv, *) slabs into VMEM, and patch the new
    row into the VMEM slab (the slab read races the row write, so the
    patch — not the HBM write — is what attention sees). Head groups then
    run the same masked-softmax attention as _decode_attn_kernel."""
    S, Hkv, D = kslab.shape
    b = pl.program_id(0)
    g = pl.program_id(1)
    n_groups = pl.num_programs(1)
    hg = Hkv // n_groups
    li0 = li_ref[0]
    length = len_ref[b]

    Hp = ks_slab.shape[-1]  # Hkv lane-padded to 128 (sub-tile slices of
    # the scale stacks are not expressible as DMA sources/targets)

    @pl.when(g == 0)
    def _load_and_update():
        # per-head int8 quantization of the new rows (kv_cache._quant_heads)
        kn = kn_ref[0].astype(jnp.float32)  # (Hkv, D)
        vn = vn_ref[0].astype(jnp.float32)
        kmax = jnp.max(jnp.abs(kn), axis=1, keepdims=True)  # (Hkv, 1)
        vmax = jnp.max(jnp.abs(vn), axis=1, keepdims=True)
        # bf16-ROUNDED scales — matches kv_cache._quant_heads (the flat
        # serving cache stores scales bf16; rounding here keeps every
        # int8-KV path on identical codes/scales)
        ksc = (jnp.maximum(kmax, 1e-8) / 127.0).astype(
            jnp.bfloat16).astype(jnp.float32)
        vsc = (jnp.maximum(vmax, 1e-8) / 127.0).astype(
            jnp.bfloat16).astype(jnp.float32)
        # clip range matches kv_cache._quant_heads exactly
        krow[...] = jnp.clip(jnp.round(kn / ksc), -128, 127).astype(jnp.int8)
        vrow[...] = jnp.clip(jnp.round(vn / vsc), -128, 127).astype(jnp.int8)
        # scales live sublane-oriented ((Hkv, 1) from the lane reduction);
        # the cache row wants them on LANES, zero-padded to Hp
        ksc_t = jnp.transpose(ksc)  # (1, Hkv)
        vsc_t = jnp.transpose(vsc)
        if Hp == Hkv:
            ksrow[...] = ksc_t
            vsrow[...] = vsc_t
        else:
            pad = jnp.zeros((1, Hp - Hkv), jnp.float32)
            ksrow[...] = jnp.concatenate([ksc_t, pad], axis=1)
            vsrow[...] = jnp.concatenate([vsc_t, pad], axis=1)

        copies = [
            # persist the new row into the cache stack (aliased outputs)
            pltpu.make_async_copy(
                krow, ko_hbm.at[li0, b, length], sems.at[0]),
            pltpu.make_async_copy(
                vrow, vo_hbm.at[li0, b, length], sems.at[1]),
            pltpu.make_async_copy(
                ksrow, kso_hbm.at[li0, b, pl.ds(length, 1)], sems.at[2]),
            pltpu.make_async_copy(
                vsrow, vso_hbm.at[li0, b, pl.ds(length, 1)], sems.at[3]),
            # pull this (layer, batch)'s slabs into VMEM
            pltpu.make_async_copy(k_hbm.at[li0, b], kslab, sems.at[4]),
            pltpu.make_async_copy(v_hbm.at[li0, b], vslab, sems.at[5]),
            pltpu.make_async_copy(ks_hbm.at[li0, b], ks_slab, sems.at[6]),
            pltpu.make_async_copy(vs_hbm.at[li0, b], vs_slab, sems.at[7]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        # patch the new row into the VMEM slabs (dynamic index on the
        # untiled leading S dim — no alignment constraint)
        kslab[length, :, :] = krow[...]
        vslab[length, :, :] = vrow[...]
        # scale slabs have S on the SUBLANE dim; patched via masks below

    if n_groups == 1:
        base_kv, base_q = 0, 0
    else:
        base_kv = pl.multiple_of(g * hg, hg)
        base_q = pl.multiple_of(g * hg * n_rep, hg * n_rep)
    sl = slice(None)
    hgq = hg * n_rep
    k8g = kslab[sl, pl.ds(base_kv, hg), sl]  # (S, hg, D) int8
    v8g = vslab[sl, pl.ds(base_kv, hg), sl]
    qg = q_ref[0, pl.ds(base_q, hgq), :]
    row_is_new = (
        jax.lax.broadcasted_iota(jnp.int32, (S, hgq), 0) == length
    )

    # Scale columns for the whole group in ONE one-hot dot (lane-dim head
    # indexing is not dynamically sliceable), with the new row's scale —
    # stale in the slab copy — masked in; then the batched two-MXU-dot
    # group attention (see _group_attention: the round-2 phase profile
    # showed the per-head matvec loop at ~6x the slab-DMA cost).
    sel = _head_sel(Hp, hgq, base_kv, n_rep)
    ks_cols = jnp.dot(ks_slab[...], sel)  # (S, hgq)
    vs_cols = jnp.dot(vs_slab[...], sel)
    ks_new = jnp.dot(ksrow[...], sel)  # (1, hgq)
    vs_new = jnp.dot(vsrow[...], sel)
    ks_cols = jnp.where(row_is_new, ks_new, ks_cols)
    vs_cols = jnp.where(row_is_new, vs_new, vs_cols)
    out = _group_attention(
        k8g, v8g, qg.astype(jnp.float32), ks_cols, vs_cols, length, n_rep
    )
    o_ref[0, pl.ds(base_q, hgq), :] = out


def decode_attention_update(q, k_new, v_new, k, v, ks, vs, li, length,
                            interpret=False):
    """One launch per layer: per-head INT8 quantization of the new K/V
    rows, in-place cache row update (aliased HBM outputs), and decode
    attention over the updated cache.

    q (B, H, D) f32; k_new/v_new (B, Hkv, D) f32 (post-rope);
    k/v (L, B, S, Hkv, D) int8; ks/vs (L, B, S, Hp) f32 where Hp is Hkv
    LANE-PADDED to a multiple of 128 (columns [Hkv:] ignored/zeroed) —
    sub-128-lane row slices of the scale stacks are not expressible as
    DMA targets; li () int32; length (B,) int32 (the new row index ==
    attended length). Unstacked (per-layer) caches may be passed 4-D
    (B, S, Hkv, D) with li=0 — viewed as L=1 stacks (a bitcast; aliasing
    passes through).
    Returns (out (B, H, D) f32, k, v, ks, vs) with cache shapes as given.
    """
    squeeze = k.ndim == 4
    if squeeze:
        k, v = k[None], v[None]
        ks, vs = ks[None], vs[None]
    B, H, D = q.shape
    S, Hkv = k.shape[2], k.shape[3]
    Hp = ks.shape[-1]
    assert Hp % 128 == 0 and Hp >= Hkv, (Hp, Hkv)
    n_rep = H // Hkv
    n_groups = Hkv // 8 if Hkv % 8 == 0 else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_groups),
        in_specs=[
            pl.BlockSpec((1, H, D), lambda b, h, li_r, len_r: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, h, li_r, len_r: (b, 0, 0)),
            pl.BlockSpec((1, Hkv, D), lambda b, h, li_r, len_r: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # k stack
            pl.BlockSpec(memory_space=pltpu.HBM),  # v stack
            pl.BlockSpec(memory_space=pltpu.HBM),  # ks stack
            pl.BlockSpec(memory_space=pltpu.HBM),  # vs stack
        ],
        out_specs=[
            pl.BlockSpec((1, H, D), lambda b, h, li_r, len_r: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, Hkv, D), jnp.int8),    # k slab
            pltpu.VMEM((S, Hkv, D), jnp.int8),    # v slab
            pltpu.VMEM((S, Hp), jnp.float32),     # ks slab
            pltpu.VMEM((S, Hp), jnp.float32),     # vs slab
            pltpu.VMEM((Hkv, D), jnp.int8),       # k row
            pltpu.VMEM((Hkv, D), jnp.int8),       # v row
            pltpu.VMEM((1, Hp), jnp.float32),     # k scale row
            pltpu.VMEM((1, Hp), jnp.float32),     # v scale row
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    out, k2, v2, ks2, vs2 = pl.pallas_call(
        functools.partial(_attn_update_kernel, n_rep=n_rep),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D), jnp.float32),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        # cache stacks update in place: inputs (after the 2 scalar-prefetch
        # operands and q/k_new/v_new) alias outputs 1..4
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.reshape(li, (1,)).astype(jnp.int32), length.astype(jnp.int32),
      q, k_new, v_new, k, v, ks, vs)
    if squeeze:
        k2, v2, ks2, vs2 = k2[0], v2[0], ks2[0], vs2[0]
    return out, k2, v2, ks2, vs2


def decode_attention_supported(q_shape, k_shape, quantized,
                               n_kv_heads=None):
    """Kernel constraints: one token per step (q has no seq axis here),
    int8/float cache (int4-packed uses the XLA path), lane-aligned
    head_dim, and sublane-aligned KV heads — the update kernel DMAs an
    (Hkv, D) row slice into the HBM cache stack, so Hkv must be a
    multiple of the dtype's sublane tile (4 for int8, 8 for f32);
    Mosaic rejects the memref_slice otherwise."""
    D = q_shape[-1]
    if quantized not in (False, "int8") or D % 128:
        return False
    if n_kv_heads is not None:
        tile = 4 if quantized == "int8" else 8
        if n_kv_heads % tile:
            return False
    return True
