"""Fused FFN-block kernel vs the unfused W4A8 pipeline oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.llm.quant import QuantLinear
from sparsebit_tpu.ops.ffn_fused import ffn_block_fused, ffn_block_supported
from sparsebit_tpu.ops.quant_matmul import codes_to_u4, quant_matmul_a8


def _rms_norm(x, w, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return x.astype(jnp.float32) * jax.lax.rsqrt(var + eps) * w


@pytest.mark.parametrize("dim,F,gs,B", [(256, 384, 64, 1), (256, 512, 128, 3)])
def test_ffn_fused_matches_unfused_a8(dim, F, gs, B):
    assert ffn_block_supported(dim, F, gs, B)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w13 = jax.random.normal(k1, (dim, 2 * F)) * 0.05
    w2 = jax.random.normal(k2, (F, dim)) * 0.05
    norm_w = 1.0 + 0.1 * jax.random.normal(k3, (dim,))
    x = jax.random.normal(k4, (B, dim))
    eps = 1e-5

    q13 = QuantLinear.from_dense(w13, bits=4, groupsize=gs)
    q2 = QuantLinear.from_dense(w2, bits=4, groupsize=gs)

    @jax.jit
    def ref(x):
        xn = _rms_norm(x, norm_w, eps)
        h = quant_matmul_a8(
            xn, q13.packed, q13.scales, q13.zeros, 4, gs, 2 * F
        )
        g, u = jnp.split(h, 2, axis=-1)
        a = jax.nn.silu(g) * u
        return x + quant_matmul_a8(a, q2.packed, q2.scales, q2.zeros, 4, gs, dim)

    @jax.jit
    def fused(x):
        u13 = codes_to_u4(q13.packed, 4, 2 * F)[None]
        u2 = codes_to_u4(q2.packed, 4, dim)[None]
        return ffn_block_fused(
            x, u13, q13.scales[None], q13.zeros[None],
            u2, q2.scales[None], q2.zeros[None], norm_w[None],
            jnp.int32(0), gs, eps, interpret=True,
        )

    out_ref = np.asarray(ref(x))
    out_fused = np.asarray(fused(x))
    np.testing.assert_allclose(out_fused, out_ref, rtol=2e-4, atol=2e-4)


def test_scanned_decode_with_fused_kernels_matches_unrolled():
    """Scanned decode with BOTH fused kernels forced (attention
    quant+update+attend and the FFN megakernel, interpret mode) matches
    the unrolled XLA decode path step by step.

    Teacher-forced with a margin gate (same discipline as the
    layer-kernel test): the two paths are DIFFERENT attention
    formulations (bf16-mul group attention in the update kernel vs the
    f32 XLA oracle, ~0.04 logit noise at this size), so greedy tokens
    are only required to agree where the top-2 margin exceeds that
    noise — a free-running exact-sequence comparison would hinge on
    near-tie luck."""
    from sparsebit_tpu.llm import decode as D
    from sparsebit_tpu.llm import llama as L
    from sparsebit_tpu.llm.decode import (
        decode_step, decode_step_scanned, prefill, prefill_scanned,
        stack_layers)
    from sparsebit_tpu.llm.kv_cache import init_kv_cache

    cfg = L.llama_tiny(dim=512)  # head_dim 128 for the attention kernel
    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    params = L.fuse_llama_params(params)  # wqkv/w13 fused layout
    qparams = L.quantize_llama_params(
        params,
        lambda p, lin: QuantLinear.from_dense(
            lin.w.astype(jnp.float32), bits=4, groupsize=64
        ),
    )
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size)
    ATOL = 0.1

    cache = init_kv_cache(cfg, 1, 32, quantized=True)
    logits, cache_u = prefill(qparams, prompt, cache, cfg)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)

    old_attn, old_ffn = D.FORCE_ATTN_KERNEL, D.FORCE_FFN_KERNEL
    try:
        D.FORCE_ATTN_KERNEL = True
        D.FORCE_FFN_KERNEL = True
        stacked = stack_layers(qparams)
        cache = init_kv_cache(cfg, 1, 32, quantized=True)
        logits_s, cache_s = prefill_scanned(stacked, prompt, cache, cfg)
        np.testing.assert_allclose(
            np.asarray(logits_s, np.float32),
            np.asarray(logits, np.float32), atol=ATOL)
        for _ in range(6):
            lg_u, cache_u = decode_step(qparams, tok, cache_u, cfg)
            lg_s, cache_s = decode_step_scanned(stacked, tok, cache_s, cfg)
            lu = np.asarray(lg_u, np.float32)
            ls = np.asarray(lg_s, np.float32)
            np.testing.assert_allclose(ls, lu, atol=ATOL)
            top2 = np.sort(lu, -1)[:, -2:]
            decisive = (top2[:, 1] - top2[:, 0]) > 2 * ATOL
            np.testing.assert_array_equal(
                lu.argmax(-1)[decisive], ls.argmax(-1)[decisive])
            tok = jnp.asarray(lu.argmax(-1), jnp.int32)
    finally:
        D.FORCE_ATTN_KERNEL, D.FORCE_FFN_KERNEL = old_attn, old_ffn


def test_ffn_fused_stacked_layer_select():
    """The scalar-prefetched layer index picks the right layer's weights."""
    dim, F, gs, L = 256, 384, 64, 3
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 2 * L + 2)
    w13s = [jax.random.normal(ks[i], (dim, 2 * F)) * 0.05 for i in range(L)]
    w2s = [jax.random.normal(ks[L + i], (F, dim)) * 0.05 for i in range(L)]
    norm_w = jnp.ones((L, dim))
    x = jax.random.normal(ks[-1], (2, dim))
    eps = 1e-5

    q13s = [QuantLinear.from_dense(w, bits=4, groupsize=gs) for w in w13s]
    q2s = [QuantLinear.from_dense(w, bits=4, groupsize=gs) for w in w2s]

    @jax.jit
    def fused(x, li):
        u13 = jnp.stack([codes_to_u4(q.packed, 4, 2 * F) for q in q13s])
        u2 = jnp.stack([codes_to_u4(q.packed, 4, dim) for q in q2s])
        return ffn_block_fused(
            x, u13, jnp.stack([q.scales for q in q13s]),
            jnp.stack([q.zeros for q in q13s]),
            u2, jnp.stack([q.scales for q in q2s]),
            jnp.stack([q.zeros for q in q2s]), norm_w,
            li, gs, eps, interpret=True,
        )

    def ref(x, i):
        xn = _rms_norm(x, norm_w[i], eps)
        q13, q2 = q13s[i], q2s[i]
        h = quant_matmul_a8(xn, q13.packed, q13.scales, q13.zeros, 4, gs, 2 * F)
        g, u = jnp.split(h, 2, axis=-1)
        a = jax.nn.silu(g) * u
        return x + quant_matmul_a8(a, q2.packed, q2.scales, q2.zeros, 4, gs, dim)

    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(fused(x, jnp.int32(i))), np.asarray(ref(x, i)),
            rtol=2e-4, atol=2e-4, err_msg=f"layer {i}",
        )
