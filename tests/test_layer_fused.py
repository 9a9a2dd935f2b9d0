"""Whole-decoder-layer megakernel vs the unfused W4A8 + int8-cache oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.kv_cache import _dequant_heads, _quant_heads
from sparsebit_tpu.llm.quant import QuantLinear
from sparsebit_tpu.ops.layer_fused import (
    fused_decoder_layer,
    fused_layer_supported,
)
from sparsebit_tpu.ops.quant_matmul import codes_to_u4, quant_matmul_a8


def _rms(x, w, eps):
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def _mk_cfg():
    # head_dim = dim / n_heads = 128 (lane-aligned — the megakernel's one
    # hard shape constraint; the old Hkv % 4 row-DMA constraint is gone
    # in the round-5 flat layout, fresh rows commit outside the kernel).
    return L.llama_tiny(
        dim=512, n_heads=4, n_kv_heads=4, ffn_dim=384, max_seq_len=64
    )


def _flat(k8, v8, kssc, vssc, Hkv):
    """Head-structured test caches -> the megakernel's round-5 serving
    layout: k/v unchanged (the kernel reshapes its HBM refs flat for
    reads), scales TRANSPOSED (..., Hkv, S) bf16 (the f32->bf16 cast is
    lossless when scales are bf16-rounded)."""
    return (k8, v8,
            jnp.swapaxes(kssc[..., :Hkv], -1, -2).astype(jnp.bfloat16),
            jnp.swapaxes(vssc[..., :Hkv], -1, -2).astype(jnp.bfloat16))


def _bf16r(x):
    """bf16-round f32 values (so flat-layout casts are lossless)."""
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def _build(cfg, gs, key):
    ks = jax.random.split(key, 6)
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    Nq = (Hq + 2 * Hkv) * D
    mats = {
        "wqkv": jax.random.normal(ks[0], (cfg.dim, Nq)) * 0.05,
        "wo": jax.random.normal(ks[1], (Hq * D, cfg.dim)) * 0.05,
        "w13": jax.random.normal(ks[2], (cfg.dim, 2 * cfg.ffn_dim)) * 0.05,
        "w2": jax.random.normal(ks[3], (cfg.ffn_dim, cfg.dim)) * 0.05,
    }
    q = {k: QuantLinear.from_dense(w, bits=4, groupsize=gs)
         for k, w in mats.items()}
    an = 1.0 + 0.1 * jax.random.normal(ks[4], (cfg.dim,))
    fn = 1.0 + 0.1 * jax.random.normal(ks[5], (cfg.dim,))
    return q, an, fn


def test_scanned_decode_with_layer_kernel_matches_unrolled():
    """decode_step_scanned with the whole-layer megakernel forced
    (interpret) matches the unrolled XLA path step by step.

    Teacher-forced: both paths consume the SAME token each step so a
    bf16 argmax tie (the paths differ by a few ulps from different
    accumulation orders) can't cascade into divergent sequences. Logits
    must agree within bf16 noise; greedy tokens must agree wherever the
    top-2 margin exceeds that noise."""
    from sparsebit_tpu.llm import decode as Dmod
    from sparsebit_tpu.llm.decode import (
        decode_step, decode_step_scanned, prefill, prefill_scanned,
        stack_layers)
    from sparsebit_tpu.llm.kv_cache import init_kv_cache

    cfg = _mk_cfg()
    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    params = L.fuse_llama_params(params)
    qparams = L.quantize_llama_params(
        params,
        lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=4, groupsize=64
        ),
    )
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, cfg.vocab_size)

    ATOL = 0.1  # bf16 ulp noise at |logit|~1-2 across 2 layers

    old = Dmod.FORCE_LAYER_KERNEL
    try:
        cache_u = init_kv_cache(cfg, 2, 32, quantized=True)
        logits, cache_u = prefill(qparams, prompt, cache_u, cfg)

        Dmod.FORCE_LAYER_KERNEL = True
        stacked = stack_layers(qparams)
        cache_s = init_kv_cache(cfg, 2, 32, quantized=True)
        logits_s, cache_s = prefill_scanned(stacked, prompt, cache_s, cfg)
        np.testing.assert_allclose(
            np.asarray(logits_s, np.float32),
            np.asarray(logits, np.float32), atol=ATOL)

        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(5):
            lg_u, cache_u = decode_step(qparams, tok, cache_u, cfg)
            lg_s, cache_s = decode_step_scanned(stacked, tok, cache_s, cfg)
            lu = np.asarray(lg_u, np.float32)
            ls = np.asarray(lg_s, np.float32)
            np.testing.assert_allclose(ls, lu, atol=ATOL)
            top2 = np.sort(lu, -1)[:, -2:]
            margin = top2[:, 1] - top2[:, 0]
            decisive = margin > 2 * ATOL
            au, as_ = lu.argmax(-1), ls.argmax(-1)
            np.testing.assert_array_equal(au[decisive], as_[decisive])
            tok = jnp.asarray(au, jnp.int32)
    finally:
        Dmod.FORCE_LAYER_KERNEL = old


@pytest.mark.parametrize("layout", ["u4", "u4r", "s4r", "s4r-bf16"])
def test_fused_decoder_layers_matches_sequential(layout):
    """Whole-backbone launch (grid (L, T), activation carried in VMEM
    scratch) == one fused_decoder_layer launch per layer. B=2 exercises
    the batch-pad-row masking of the carried activation. layout=u4r runs
    the u8 row-pair serving weights (kernel-side bitcast unpack); s4r the
    signed row-pairs (int4 bitcast + zero-8 epilogue); s4r-bf16 streams
    bf16 scales/zeros (the full serving layout — 16-sublane qparam
    windows, in-kernel f32 upcast)."""
    from sparsebit_tpu.ops.layer_fused import fused_decoder_layers
    from sparsebit_tpu.ops.packing import (
        pack_s4_rows, pack_u4_rows, unpack_columns)

    cfg = _mk_cfg()
    gs = 64
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    B, S, Lx = 2, 32, 2
    keys = jax.random.split(jax.random.PRNGKey(0), Lx)
    built = [_build(cfg, gs, k) for k in keys]
    names = ("wqkv", "wo", "w13", "w2")

    def _warr(lin):
        if layout.startswith("s4r"):
            return pack_s4_rows(unpack_columns(lin.packed, 4, lin.n_padded))
        if layout == "u4r":
            return pack_u4_rows(unpack_columns(lin.packed, 4, lin.n_padded))
        return codes_to_u4(lin.packed, 4, lin.out_features)

    szdt = jnp.bfloat16 if layout.endswith("bf16") else jnp.float32
    u4s = {n: jnp.stack([_warr(b[0][n]) for b in built]) for n in names}
    scs = {n: jnp.stack([b[0][n].scales.astype(szdt) for b in built])
           for n in names}
    zrs = {n: jnp.stack([b[0][n].zeros.astype(szdt) for b in built])
           for n in names}
    ans = jnp.stack([b[1] for b in built])
    fns = jnp.stack([b[2] for b in built])
    kk, kv, kx = jax.random.split(jax.random.PRNGKey(1), 3)
    k8 = jax.random.randint(kk, (Lx, B, S, Hkv, D), -127, 127,
                            jnp.int32).astype(jnp.int8)
    v8 = jax.random.randint(kv, (Lx, B, S, Hkv, D), -127, 127,
                            jnp.int32).astype(jnp.int8)
    kssc = _bf16r(jax.random.uniform(
        kk, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    vssc = _bf16r(jax.random.uniform(
        kv, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    kf, vf, ksf, vsf = _flat(k8, v8, kssc, vssc, Hkv)
    x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
    pos = jnp.asarray([5, 9], jnp.int32)
    inv_freq = L.rope_frequencies(cfg)
    angles = pos[:, None].astype(jnp.float32) * inv_freq
    cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
    sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)
    args = (u4s["wqkv"], scs["wqkv"], zrs["wqkv"],
            u4s["wo"], scs["wo"], zrs["wo"],
            u4s["w13"], scs["w13"], zrs["w13"],
            u4s["w2"], scs["w2"], zrs["w2"], ans, fns)

    sgn = layout.startswith("s4r")

    @jax.jit
    def seq():
        st = (x, kf, vf, ksf, vsf)
        for li in range(Lx):
            st = fused_decoder_layer(
                st[0], pos, cosf, sinf, jnp.int32(li), *args,
                *st[1:], cfg, gs, interpret=True, signed=sgn)
        return st

    @jax.jit
    def multi():
        return fused_decoder_layers(
            x, pos, cosf, sinf, *args, kf, vf, ksf, vsf, cfg, gs,
            interpret=True, signed=sgn)

    o1, o2 = seq(), multi()
    for a, b in zip(o1, o2):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "B,k_pad,sz_bf16,S",
    [(1, None, False, 64), (2, None, False, 64), (1, 256, False, 64),
     (1, None, True, 64),
     # B=12: MULTI-GROUP batched attention (two 8-row group steps with
     # clamped pad rows in the second — the B>8 megakernel regime)
     (12, None, False, 64),
     # S=256: multi-chunk slab IO (2 length-gated 128-row load chunks
     # per row) — S=64 is a single chunk and never exercises the chunked
     # DMA gating
     (2, None, False, 256), (12, None, False, 256)],
)
def test_fused_decoder_layer_matches_oracle(B, k_pad, sz_bf16, S):
    cfg = _mk_cfg()
    gs = 64
    assert fused_layer_supported(cfg, gs, B)
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    key = jax.random.PRNGKey(0)
    q, an, fn = _build(cfg, gs, key)
    if sz_bf16:
        # the serving qparam layout: bf16 scales/zeros feed BOTH the
        # oracle (dequant upcasts to f32) and the kernel (in-kernel
        # upcast) — the two must stay exactly consistent
        q = {k2: v2.with_sz_dtype() for k2, v2 in q.items()}
    kx, kk, kv, kp = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
    kcache = jax.random.normal(kk, (B, S, Hkv, D), jnp.float32)
    vcache = jax.random.normal(kv, (B, S, Hkv, D), jnp.float32)
    pos = jnp.asarray(
        np.random.default_rng(3).integers(1, S - 1, B), jnp.int32
    )
    k8, kssc = _quant_heads(kcache)
    v8, vssc = _quant_heads(vcache)

    inv_freq = L.rope_frequencies(cfg)
    angles = pos[:, None].astype(jnp.float32) * inv_freq  # (B, D/2)
    cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)  # (B, D)
    sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)

    # ---- oracle: unfused chain ------------------------------------------
    def a8(lin, xx):
        return quant_matmul_a8(
            xx, lin.packed, lin.scales, lin.zeros, 4, gs, lin.out_features
        )

    eps = cfg.rms_eps
    xn = _rms(x, an, eps)
    qkv = a8(q["wqkv"], xn)
    nq = Hq * D
    nkv = Hkv * D
    qh = qkv[:, None, :nq].reshape(B, 1, Hq, D)
    kh = qkv[:, None, nq:nq + nkv].reshape(B, 1, Hkv, D)
    vh = qkv[:, None, nq + nkv:].reshape(B, 1, Hkv, D)
    qh = L.apply_rope(qh, pos[:, None], inv_freq)
    kh = L.apply_rope(kh, pos[:, None], inv_freq)
    krow8, krs = _quant_heads(kh)
    vrow8, vrs = _quant_heads(vh)
    bidx = jnp.arange(B)
    k8_u = k8.at[bidx, pos].set(krow8[:, 0])
    v8_u = v8.at[bidx, pos].set(vrow8[:, 0])
    ks_u = kssc.at[bidx, pos].set(krs[:, 0])
    vs_u = vssc.at[bidx, pos].set(vrs[:, 0])
    k_or = _dequant_heads(k8_u, ks_u, jnp.float32)
    v_or = _dequant_heads(v8_u, vs_u, jnp.float32)
    valid = jnp.arange(S)[None, :] <= pos[:, None]
    mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    n_rep = Hq // Hkv
    attn = L.attention_scores(
        qh, L.repeat_kv(k_or, n_rep), L.repeat_kv(v_or, n_rep), mask
    ).reshape(B, Hq * D)
    x1 = x + a8(q["wo"], attn)
    h = a8(q["w13"], _rms(x1, fn, eps))
    g_, u_ = jnp.split(h, 2, axis=-1)
    expected = x1 + a8(q["w2"], jax.nn.silu(g_) * u_)

    # ---- fused kernel ----------------------------------------------------
    if k_pad:
        # K-padded W2 (with_k_pad): pad rows are exact zeros; the kernel's
        # padded g8 scratch must reproduce the unpadded oracle
        q["w2"] = q["w2"].with_k_pad(k_pad)
        assert q["w2"].k_padded == 512
        assert fused_layer_supported(cfg, gs, B, f_pad=512)
    kfl, vfl, ksfl, vsfl = _flat(k8, v8, kssc, vssc, Hkv)

    @jax.jit
    def fused():
        u4 = {k2: codes_to_u4(v2.packed, 4, v2.out_features)[None]
              for k2, v2 in q.items()}
        out, k2, v2, ks2, vs2 = fused_decoder_layer(
            x, pos, cosf, sinf, jnp.int32(0),
            u4["wqkv"], q["wqkv"].scales[None], q["wqkv"].zeros[None],
            u4["wo"], q["wo"].scales[None], q["wo"].zeros[None],
            u4["w13"], q["w13"].scales[None], q["w13"].zeros[None],
            u4["w2"], q["w2"].scales[None], q["w2"].zeros[None],
            an[None], fn[None],
            kfl[None], vfl[None], ksfl[None], vsfl[None],
            cfg, gs, interpret=True,
        )
        return out, k2, v2, ks2, vs2

    out, k2, v2, ks2, vs2 = fused()

    # cache rows updated like _quant_heads; ±1 code tolerated — the
    # (B_pad*H, D)-vectorized rope/quant's f32 associativity can flip a
    # value sitting exactly on a rounding tie (observed 1/393216 at B=12)
    np.testing.assert_allclose(
        np.asarray(k2[0], np.int32), np.asarray(k8_u, np.int32), atol=1)
    np.testing.assert_allclose(
        np.asarray(v2[0], np.int32), np.asarray(v8_u, np.int32), atol=1)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(ks2[0], 1, 2).astype(jnp.float32)),
        np.asarray(ks_u), rtol=1e-5
    )
    # output: attention runs INT8 end-to-end inside the kernel (per-row
    # q quantization + 7-bit scale-folded probability mix, round 4) vs
    # the f32 oracle; the tolerance absorbs that int8 formulation noise
    # (~1/254 relative per dot, compounded over the two attention dots on
    # O(1-3) activations -> ~0.05 abs on a few elements at dim=512, ~0.08
    # when a KV code sits on a rounding tie — the B=12 case above)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=2e-2, atol=9e-2
    )


def test_fused_decoder_layers_paged_matches_contiguous():
    """Paged pools + scrambled block table == contiguous caches: same
    output row, and the pool rows gather back to the contiguous result.
    pos spans two 128-row chunks (row 1 writes into its second block)."""
    from sparsebit_tpu.ops.layer_fused import fused_decoder_layers
    from sparsebit_tpu.ops.packing import pack_u4_rows, unpack_columns

    cfg = _mk_cfg()
    gs = 64
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    B, S, Lx, SC = 2, 256, 2, 128
    n_sc = S // SC
    keys = jax.random.split(jax.random.PRNGKey(7), Lx)
    built = [_build(cfg, gs, k) for k in keys]
    names = ("wqkv", "wo", "w13", "w2")
    u4s = {n: jnp.stack([
        pack_u4_rows(unpack_columns(b[0][n].packed, 4, b[0][n].n_padded))
        for b in built]) for n in names}
    scs = {n: jnp.stack([b[0][n].scales for b in built]) for n in names}
    zrs = {n: jnp.stack([b[0][n].zeros for b in built]) for n in names}
    ans = jnp.stack([b[1] for b in built])
    fns = jnp.stack([b[2] for b in built])
    kk, kv, kx = jax.random.split(jax.random.PRNGKey(8), 3)
    k8h = jax.random.randint(kk, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    v8h = jax.random.randint(kv, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    ksh = _bf16r(jax.random.uniform(
        kk, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    vsh = _bf16r(jax.random.uniform(
        kv, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    k8, v8, kssc, vssc = _flat(k8h, v8h, ksh, vsh, Hkv)
    x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
    pos = jnp.asarray([5, 130], jnp.int32)  # row 1 -> second chunk
    inv_freq = L.rope_frequencies(cfg)
    angles = pos[:, None].astype(jnp.float32) * inv_freq
    cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
    sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)
    args = (u4s["wqkv"], scs["wqkv"], zrs["wqkv"],
            u4s["wo"], scs["wo"], zrs["wo"],
            u4s["w13"], scs["w13"], zrs["w13"],
            u4s["w2"], scs["w2"], zrs["w2"], ans, fns)

    @jax.jit
    def contiguous():
        return fused_decoder_layers(
            x, pos, cosf, sinf, *args, k8, v8, kssc, vssc, cfg, gs,
            interpret=True)

    # scrambled block table over a 6-block pool (2 spare garbage blocks)
    NBLK = B * n_sc + 2
    bt = jnp.asarray([[5, 2], [0, 3]], jnp.int32)

    def to_pool(cache, fill):
        pool = jnp.full((Lx, NBLK, SC) + cache.shape[3:], fill, cache.dtype)
        for b in range(B):
            for c in range(n_sc):
                pool = pool.at[:, int(bt[b, c])].set(
                    cache[:, b, c * SC:(c + 1) * SC])
        return pool

    def to_pool_sc(cache, fill):
        # transposed scale layout: (Lx, B, Hkv, S) -> (Lx, NBLK, Hkv, SC)
        pool = jnp.full((Lx, NBLK, cache.shape[2], SC), fill, cache.dtype)
        for b in range(B):
            for c in range(n_sc):
                pool = pool.at[:, int(bt[b, c])].set(
                    cache[:, b, :, c * SC:(c + 1) * SC])
        return pool

    kp, vp = to_pool(k8, 0), to_pool(v8, 0)
    ksp, vsp = to_pool_sc(kssc, jnp.nan), to_pool_sc(vssc, jnp.nan)

    @jax.jit
    def paged(kp, vp, ksp, vsp):
        return fused_decoder_layers(
            x, pos, cosf, sinf, *args, kp, vp, ksp, vsp, cfg, gs,
            interpret=True, bt=bt)

    o_ref, k_r, v_r, ks_r, vs_r = contiguous()
    o_p, kp2, vp2, ksp2, vsp2 = paged(kp, vp, ksp, vsp)
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_ref),
                               rtol=1e-5, atol=1e-5)

    def from_pool(pool, axis=1):
        rows = [jnp.concatenate(
            [pool[:, int(bt[b, c])] for c in range(n_sc)], axis=axis)
            for b in range(B)]
        return jnp.stack(rows, axis=1)

    for got, want in ((from_pool(kp2), k_r), (from_pool(vp2), v_r),
                      (from_pool(ksp2, axis=2), ks_r),
                      (from_pool(vsp2, axis=2), vs_r)):
        np.testing.assert_allclose(np.asarray(got, np.float64),
                                   np.asarray(want, np.float64),
                                   rtol=1e-6, atol=1e-6)


def test_mixed_precision_megakernel_matches_unrolled():
    """VERDICT r2 #2: an int4/3/2 MIXED GPTQ-style checkpoint serves
    through the single-launch backbone. Sub-4-bit layers ride the signed
    nibble container re-tagged bits=4 (QuantLinear.with_nibble_serving) —
    dequantization is bit-free, so the megakernel scanned decode must
    match the unrolled per-matmul oracle on the ORIGINAL mixed containers
    step by step (teacher-forced, same tolerance discipline as
    test_scanned_decode_with_layer_kernel_matches_unrolled)."""
    from sparsebit_tpu.llm import decode as Dmod
    from sparsebit_tpu.llm.decode import (
        decode_step, decode_step_scanned, prefill, prefill_scanned,
        prepare_params_host, stack_layers)
    from sparsebit_tpu.llm.kv_cache import init_kv_cache

    cfg = L.llama_tiny(
        dim=512, n_heads=4, n_kv_heads=4, ffn_dim=384, max_seq_len=64,
        n_layers=3,
    )
    params = L.init_llama_params(cfg, jax.random.PRNGKey(2))
    params = L.fuse_llama_params(params)
    layer_bits = {0: 4, 1: 3, 2: 2}

    def quantize(path, lin):
        bits = layer_bits[int(path.split(".")[1])]
        return QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=bits, groupsize=64
        )

    qparams = L.quantize_llama_params(params, quantize)
    assert qparams["layers"][1]["wqkv"].bits == 3
    assert qparams["layers"][2]["w2"].bits == 2

    # serving prep: every layer lands in the s4r container, bits-tag 4
    sparams = prepare_params_host(qparams)
    assert all(lyr["wqkv"].bits == 4 and "s4r" in lyr["wqkv"].packed
               for lyr in sparams["layers"])
    # nibble repack is dequant-exact
    np.testing.assert_allclose(
        np.asarray(sparams["layers"][1]["w13"].dequantize()),
        np.asarray(qparams["layers"][1]["w13"].dequantize()),
        rtol=0, atol=2e-3)  # bf16 qparam store, upcast on read

    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 0,
                                cfg.vocab_size)
    ATOL = 0.1

    old = Dmod.FORCE_LAYER_KERNEL
    try:
        cache_u = init_kv_cache(cfg, 2, 32, quantized=True)
        logits, cache_u = prefill(sparams, prompt, cache_u, cfg)

        Dmod.FORCE_LAYER_KERNEL = True
        stacked = stack_layers(sparams)
        assert Dmod._scan_uses_layer_kernel(
            1, stacked["layers"], "int8", cfg, 2)
        cache_s = init_kv_cache(cfg, 2, 32, quantized=True)
        logits_s, cache_s = prefill_scanned(stacked, prompt, cache_s, cfg)
        np.testing.assert_allclose(
            np.asarray(logits_s, np.float32),
            np.asarray(logits, np.float32), atol=ATOL)

        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(4):
            lg_u, cache_u = decode_step(sparams, tok, cache_u, cfg)
            lg_s, cache_s = decode_step_scanned(stacked, tok, cache_s, cfg)
            lu = np.asarray(lg_u, np.float32)
            ls = np.asarray(lg_s, np.float32)
            np.testing.assert_allclose(ls, lu, atol=ATOL)
            top2 = np.sort(lu, -1)[:, -2:]
            margin = top2[:, 1] - top2[:, 0]
            decisive = margin > 2 * ATOL
            np.testing.assert_array_equal(
                lu.argmax(-1)[decisive], ls.argmax(-1)[decisive])
            tok = jnp.asarray(lu.argmax(-1), jnp.int32)
    finally:
        Dmod.FORCE_LAYER_KERNEL = old


@pytest.mark.parametrize("wbits,B", [(3, 1), (3, 2), (2, 1)])
def test_plane_megakernel_matches_nibble_container(wbits, B):
    """TRUE-width 2/3-bit plane streaming (round-4 VERDICT #3): the plane
    megakernel (pack_planes_serving windows, in-kernel shift/mask unpack)
    must reproduce the same checkpoint served through the 4-bit nibble
    container bit-for-bit in the int8 dot inputs — outputs match to f32
    rounding. Reference: cuda_kernel_3bit.cu true 3-bit stream."""
    from sparsebit_tpu.ops.layer_fused import _fused_call

    cfg = _mk_cfg()
    gs = 64
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    S, Lx = 64, 2
    keys = jax.random.split(jax.random.PRNGKey(11), Lx)
    built = []
    for kkey in keys:
        q4, an, fn = _build(cfg, gs, kkey)
        # re-quantize each linear at wbits via RTN on the dequantized f32
        qn = {n: QuantLinear.from_dense(
            lin.dequantize(), bits=wbits, groupsize=gs)
            for n, lin in q4.items()}
        built.append((qn, an, fn))

    def stacked(serving):
        names = ("wqkv", "wo", "w13", "w2")
        conv = {
            "nibble": lambda lin: lin.with_nibble_serving(),
            "plane": lambda lin: lin.with_plane_serving(),
        }[serving]
        lin = {n: [conv(b[0][n]) for b in built] for n in names}
        out = {}
        for n in names:
            out[n] = (
                jnp.stack([ln.packed["s4r" if serving == "nibble" else "pl"]
                           for ln in lin[n]]),
                jnp.stack([ln.scales for ln in lin[n]]),
                jnp.stack([ln.zeros for ln in lin[n]]),
            )
        return out

    ans = jnp.stack([b[1] for b in built])
    fns = jnp.stack([b[2] for b in built])
    kk, kv, kx = jax.random.split(jax.random.PRNGKey(12), 3)
    k8h = jax.random.randint(kk, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    v8h = jax.random.randint(kv, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    ksh = _bf16r(jax.random.uniform(
        kk, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    vsh = _bf16r(jax.random.uniform(
        kv, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    k8, v8, kssc, vssc = _flat(k8h, v8h, ksh, vsh, Hkv)
    x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
    pos = jnp.asarray(np.arange(5, 5 + B), jnp.int32)
    inv_freq = L.rope_frequencies(cfg)
    angles = pos[:, None].astype(jnp.float32) * inv_freq
    cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
    sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)

    def run(serving, wb):
        st = stacked(serving)
        args = (st["wqkv"] + st["wo"] + st["w13"] + st["w2"])
        return _fused_call(
            x, pos, cosf, sinf, jnp.int32(0), *args, ans, fns,
            k8, v8, kssc, vssc, cfg, gs, interpret=True,
            n_grid_layers=Lx, signed=(serving == "nibble"),
            wbits=(4 if serving == "nibble" else wb),
        )

    o_nib, kn, vn, ksn, vsn = run("nibble", wbits)
    o_pl, kp, vp, ksp, vsp = run("plane", wbits)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_nib),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(kp), np.asarray(kn))
    np.testing.assert_allclose(np.asarray(ksp), np.asarray(ksn), rtol=1e-6)


def test_plane_megakernel_segmented_mixed_stack():
    """Mixed int4/int3 checkpoint as TWO segment launches (4-bit rows then
    3-bit rows) with li_cache offsets against one homogeneous nibble
    launch — the segmented scan decode path's kernel contract."""
    from sparsebit_tpu.ops.layer_fused import _fused_call

    cfg = _mk_cfg()
    gs, B, S, Lx = 64, 1, 64, 2
    keys = jax.random.split(jax.random.PRNGKey(21), Lx)
    layer_bits = [4, 3]
    built = []
    for kkey, wb in zip(keys, layer_bits):
        q4, an, fn = _build(cfg, gs, kkey)
        if wb != 4:
            q4 = {n: QuantLinear.from_dense(
                lin.dequantize(), bits=wb, groupsize=gs)
                for n, lin in q4.items()}
        built.append((q4, an, fn))

    names = ("wqkv", "wo", "w13", "w2")
    D, Hkv = cfg.head_dim, cfg.n_kv_heads
    kk, kv, kx = jax.random.split(jax.random.PRNGKey(22), 3)
    k8h = jax.random.randint(kk, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    v8h = jax.random.randint(kv, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    ksh = _bf16r(jax.random.uniform(
        kk, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    vsh = _bf16r(jax.random.uniform(
        kv, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    k8, v8, kssc, vssc = _flat(k8h, v8h, ksh, vsh, Hkv)
    x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
    pos = jnp.asarray([9], jnp.int32)
    inv_freq = L.rope_frequencies(cfg)
    angles = pos[:, None].astype(jnp.float32) * inv_freq
    cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
    sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)

    def seg_args(idx, serving):
        b = built[idx]
        if serving == "nibble":
            lin = {n: b[0][n].with_nibble_serving() for n in names}
            key = "s4r"
        else:
            lin = {n: b[0][n].with_plane_serving() for n in names}
            key = "pl"
        out = []
        for n in names:
            out += [lin[n].packed[key][None], lin[n].scales[None],
                    lin[n].zeros[None]]
        return out + [b[1][None], b[2][None]]

    # homogeneous nibble reference over both layers
    nib = [seg_args(0, "nibble"), seg_args(1, "nibble")]
    args2 = [jnp.concatenate([a[i] for a in nib], axis=0)
             for i in range(14)]
    o_ref, kr, vr, ksr, vsr = _fused_call(
        x, pos, cosf, sinf, jnp.int32(0), *args2, k8, v8, kssc, vssc,
        cfg, gs, interpret=True, n_grid_layers=Lx, signed=True)

    # segmented: layer 0 (4-bit, signed nibble) then layer 1 (3-bit plane)
    out = x
    caches = (k8, v8, kssc, vssc)
    for idx, wb in enumerate(layer_bits):
        serving = "nibble" if wb == 4 else "plane"
        a = seg_args(idx, serving)
        out, *caches = _fused_call(
            out, pos, cosf, sinf, jnp.int32(0), *a, *caches,
            cfg, gs, interpret=True, n_grid_layers=1,
            signed=(serving == "nibble"),
            wbits=(4 if serving == "nibble" else wb),
            li_cache=jnp.int32(idx))
        out = out  # (B, dim) f32 activation carries between segments

    np.testing.assert_allclose(np.asarray(out), np.asarray(o_ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(caches[0]), np.asarray(kr))


def test_uniform_int3_planes_scanned_decode_matches_nibble():
    """End-to-end: a UNIFORM int3 checkpoint served with
    prepare_params_host(sub4="planes") — the megakernel streaming TRUE
    3-bit plane windows — must produce the same scanned-decode logits as
    the nibble-container serving of the same checkpoint."""
    from sparsebit_tpu.llm import decode as Dmod
    from sparsebit_tpu.llm.decode import (
        decode_step_scanned, prefill_scanned, prepare_params_host,
        stack_layers)
    from sparsebit_tpu.llm.kv_cache import init_kv_cache

    cfg = L.llama_tiny(
        dim=512, n_heads=4, n_kv_heads=4, ffn_dim=384, max_seq_len=64,
        n_layers=2,
    )
    params = L.init_llama_params(cfg, jax.random.PRNGKey(5))
    params = L.fuse_llama_params(params)
    qparams = L.quantize_llama_params(
        params, lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=3, groupsize=64))

    prompt = jax.random.randint(jax.random.PRNGKey(6), (2, 5), 0,
                                cfg.vocab_size)
    old = Dmod.FORCE_LAYER_KERNEL
    try:
        Dmod.FORCE_LAYER_KERNEL = True
        outs = {}
        for sub4 in ("nibble", "planes"):
            sp = stack_layers(prepare_params_host(qparams, sub4=sub4))
            assert Dmod._scan_uses_layer_kernel(
                1, sp["layers"], "int8", cfg, 2), sub4
            if sub4 == "planes":
                assert sp["layers"]["wqkv"].bits == 3
                assert "pl" in sp["layers"]["wqkv"].packed
                # the serving stack really is 3 bits/weight: 3N/8 bytes
                w = sp["layers"]["wqkv"].packed["pl"]
                assert w.shape[-1] * 8 == 3 * sp["layers"]["wqkv"].n_padded
            cache = init_kv_cache(cfg, 2, 32, quantized=True)
            logits, cache = prefill_scanned(sp, prompt, cache, cfg)
            toks = [jnp.argmax(logits, -1).astype(jnp.int32)]
            for _ in range(4):
                lg, cache = decode_step_scanned(sp, toks[-1], cache, cfg)
                toks.append(jnp.asarray(np.asarray(lg).argmax(-1),
                                        jnp.int32))
            outs[sub4] = (logits, toks)
        np.testing.assert_allclose(
            np.asarray(outs["planes"][0], np.float32),
            np.asarray(outs["nibble"][0], np.float32), atol=0.05)
        for a, b in zip(outs["planes"][1], outs["nibble"][1]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        Dmod.FORCE_LAYER_KERNEL = old


def test_b1_and_batched_int8_attention_row_exact():
    """The serving engines' cross-path contract (round 4): decoding a
    request at B=1 and decoding it as row 0 of a padded batched step must
    produce BIT-IDENTICAL outputs — both phase-2 implementations run the
    same flat INT8 formulation (_flat_attention_rows_int8, incl. the
    fresh-row length-column corrections) and the matmul phases are
    B_pad-invariant. Guards against any future divergence between the
    two phase-2 implementations."""
    from sparsebit_tpu.ops.layer_fused import fused_decoder_layers

    cfg = _mk_cfg()
    gs = 64
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    S, Lx = 64, 2
    keys = jax.random.split(jax.random.PRNGKey(31), Lx)
    built = [_build(cfg, gs, k) for k in keys]
    from sparsebit_tpu.ops.packing import pack_s4_rows, unpack_columns

    names = ("wqkv", "wo", "w13", "w2")
    s4 = {n: jnp.stack([
        pack_s4_rows(unpack_columns(b[0][n].packed, 4, b[0][n].n_padded))
        for b in built]) for n in names}
    scs = {n: jnp.stack([b[0][n].scales for b in built]) for n in names}
    zrs = {n: jnp.stack([b[0][n].zeros for b in built]) for n in names}
    ans = jnp.stack([b[1] for b in built])
    fns = jnp.stack([b[2] for b in built])
    args = (s4["wqkv"], scs["wqkv"], zrs["wqkv"],
            s4["wo"], scs["wo"], zrs["wo"],
            s4["w13"], scs["w13"], zrs["w13"],
            s4["w2"], scs["w2"], zrs["w2"], ans, fns)

    kk, kv, kx = jax.random.split(jax.random.PRNGKey(32), 3)
    B = 3
    k8h = jax.random.randint(kk, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    v8h = jax.random.randint(kv, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    ksh = _bf16r(jax.random.uniform(
        kk, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    vsh = _bf16r(jax.random.uniform(
        kv, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    k8, v8, kssc, vssc = _flat(k8h, v8h, ksh, vsh, Hkv)
    x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
    pos = jnp.asarray([7, 21, 40], jnp.int32)
    inv_freq = L.rope_frequencies(cfg)

    def run(xx, pp, kc, vc, ksc, vsc):
        angles = pp[:, None].astype(jnp.float32) * inv_freq
        cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
        sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)
        return fused_decoder_layers(
            xx, pp, cosf, sinf, *args, kc, vc, ksc, vsc, cfg, gs,
            interpret=True, signed=True)

    out_b, kb, vb, ksb, vsb = run(x, pos, k8, v8, kssc, vssc)
    out_1, k1, v1, ks1, vs1 = run(
        x[:1], pos[:1], k8[:, :1], v8[:, :1], kssc[:, :1], vssc[:, :1])
    np.testing.assert_array_equal(np.asarray(out_1[0]),
                                  np.asarray(out_b[0]))
    np.testing.assert_array_equal(np.asarray(k1[:, 0]),
                                  np.asarray(kb[:, 0]))
    np.testing.assert_array_equal(np.asarray(ks1[:, 0]),
                                  np.asarray(ksb[:, 0]))


def test_s_active_bucket_matches_full_width():
    """The STATIC s_active context bucket (bucketed-serving dispatch,
    round 5) must be a pure optimization: with every position inside
    the bucket, outputs and committed cache rows are IDENTICAL to the
    full-width launch (slabs/dots/loads cover fewer rows, the math
    doesn't change)."""
    from sparsebit_tpu.ops.layer_fused import fused_decoder_layers
    from sparsebit_tpu.ops.packing import pack_s4_rows, unpack_columns

    cfg = _mk_cfg()
    gs = 64
    D, Hq, Hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    B, S, Lx = 3, 256, 2
    keys = jax.random.split(jax.random.PRNGKey(41), Lx)
    built = [_build(cfg, gs, k) for k in keys]
    names = ("wqkv", "wo", "w13", "w2")
    s4 = {n: jnp.stack([
        pack_s4_rows(unpack_columns(b[0][n].packed, 4, b[0][n].n_padded))
        for b in built]) for n in names}
    scs = {n: jnp.stack([b[0][n].scales for b in built]) for n in names}
    zrs = {n: jnp.stack([b[0][n].zeros for b in built]) for n in names}
    args = (s4["wqkv"], scs["wqkv"], zrs["wqkv"],
            s4["wo"], scs["wo"], zrs["wo"],
            s4["w13"], scs["w13"], zrs["w13"],
            s4["w2"], scs["w2"], zrs["w2"],
            jnp.stack([b[1] for b in built]),
            jnp.stack([b[2] for b in built]))
    kk, kv, kx = jax.random.split(jax.random.PRNGKey(42), 3)
    k8h = jax.random.randint(kk, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    v8h = jax.random.randint(kv, (Lx, B, S, Hkv, D), -127, 127,
                             jnp.int32).astype(jnp.int8)
    ksh = _bf16r(jax.random.uniform(
        kk, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    vsh = _bf16r(jax.random.uniform(
        kv, (Lx, B, S, Hkv), jnp.float32, 0.001, 0.01))
    k8, v8, kssc, vssc = _flat(k8h, v8h, ksh, vsh, Hkv)
    x = jax.random.normal(kx, (B, cfg.dim), jnp.float32)
    pos = jnp.asarray([5, 90, 126], jnp.int32)  # all inside bucket 128
    inv_freq = L.rope_frequencies(cfg)
    angles = pos[:, None].astype(jnp.float32) * inv_freq
    cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
    sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)

    def run(s_act):
        return fused_decoder_layers(
            x, pos, cosf, sinf, *args, k8, v8, kssc, vssc, cfg, gs,
            interpret=True, signed=True, s_active=s_act)

    o_full, kf_, vf_, ksf_, vsf_ = run(None)
    o_b, kb_, vb_, ksb_, vsb_ = run(128)
    np.testing.assert_array_equal(np.asarray(o_b), np.asarray(o_full))
    np.testing.assert_array_equal(np.asarray(kb_), np.asarray(kf_))
    np.testing.assert_array_equal(np.asarray(ksb_), np.asarray(ksf_))
    np.testing.assert_array_equal(np.asarray(vsb_), np.asarray(vsf_))
