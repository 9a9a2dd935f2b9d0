"""Fused decode-attention kernel vs the XLA attention oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.kv_cache import _dequant_heads, _quant_heads
from sparsebit_tpu.ops.attention import decode_attention


@pytest.mark.parametrize("quantized", [True, False])
@pytest.mark.parametrize("n_rep", [1, 4])
def test_decode_attention_matches_oracle(quantized, n_rep):
    B, S, Hkv, D = 2, 64, 4, 128
    H = Hkv * n_rep
    key = jax.random.PRNGKey(80)
    kq, kk, kv, kl = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, Hkv, D), jnp.float32)
    length = jnp.asarray([13, 40], jnp.int32)  # rows [0, length] attend

    if quantized:
        k8, ks = _quant_heads(k)
        v8, vs = _quant_heads(v)
        k_or = _dequant_heads(k8, ks, jnp.float32)
        v_or = _dequant_heads(v8, vs, jnp.float32)
    else:
        k8, v8, ks, vs = k, v, None, None
        k_or, v_or = k, v

    # oracle: decode_step-style mask (valid cols <= length)
    valid = jnp.arange(S)[None, :] <= length[:, None]
    mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    ref = L.attention_scores(
        q[:, None], L.repeat_kv(k_or, n_rep), L.repeat_kv(v_or, n_rep), mask
    )[:, 0]

    out = decode_attention(q, k8, v8, ks, vs, length, H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("n_rep", [1, 4])
def test_decode_attention_update_matches_oracle(n_rep):
    """Fused quant+row-update+attention kernel: the returned cache carries
    exactly _quant_heads of the new rows at position ``length``, and the
    attention output matches the XLA oracle over the updated cache."""
    from sparsebit_tpu.ops.attention import decode_attention_update

    B, S, Hkv, D = 2, 64, 4, 128
    H = Hkv * n_rep
    key = jax.random.PRNGKey(81)
    kq, kk, kv, kn_, vn_ = jax.random.split(key, 5)
    q = jax.random.normal(kq, (B, H, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, Hkv, D), jnp.float32)
    k_new = jax.random.normal(kn_, (B, Hkv, D), jnp.float32)
    v_new = jax.random.normal(vn_, (B, Hkv, D), jnp.float32)
    length = jnp.asarray([13, 40], jnp.int32)  # new row position

    k8, ks = _quant_heads(k)
    v8, vs = _quant_heads(v)

    # scale stacks lane-padded to 128 (the kernel's row-DMA contract)
    pad = ((0, 0), (0, 0), (0, 128 - Hkv))
    out, k2, v2, ks2p, vs2p = decode_attention_update(
        q, k_new, v_new, k8, v8, jnp.pad(ks, pad), jnp.pad(vs, pad),
        jnp.int32(0), length, interpret=True,
    )
    ks2, vs2 = ks2p[..., :Hkv], vs2p[..., :Hkv]

    # oracle: write quantized rows, dequant, attend over rows [0, length]
    kr8, krs = _quant_heads(k_new[:, None])
    vr8, vrs = _quant_heads(v_new[:, None])
    bidx = jnp.arange(B)
    k8_ref = k8.at[bidx, length].set(kr8[:, 0])
    v8_ref = v8.at[bidx, length].set(vr8[:, 0])
    ks_ref = ks.at[bidx, length].set(krs[:, 0])
    vs_ref = vs.at[bidx, length].set(vrs[:, 0])
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k8_ref))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v8_ref))
    np.testing.assert_allclose(np.asarray(ks2), np.asarray(ks_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_ref), rtol=1e-6)

    k_or = _dequant_heads(k8_ref, ks_ref, jnp.float32)
    v_or = _dequant_heads(v8_ref, vs_ref, jnp.float32)
    valid = jnp.arange(S)[None, :] <= length[:, None]
    mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    ref = L.attention_scores(
        q[:, None], L.repeat_kv(k_or, n_rep), L.repeat_kv(v_or, n_rep), mask
    )[:, 0]
    # kernel runs K/V/q dots in bf16 (f32 accumulate) like the XLA path
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-2, atol=1e-2
    )


@pytest.mark.parametrize("kv_quantized", [False, True])
def test_decode_step_with_kernel_matches_xla_path(kv_quantized):
    """The decode.py integration (FORCE_ATTN_KERNEL) produces the same
    logits as the XLA attention path — both the eager decode_step and the
    scanned decode."""
    from sparsebit_tpu.llm import decode as D
    from sparsebit_tpu.llm.decode import decode_step, prefill
    from sparsebit_tpu.llm.kv_cache import init_kv_cache

    cfg = L.llama_tiny(dim=512)  # head_dim 128: the kernel's lane width
    assert cfg.head_dim % 128 == 0, "kernel needs lane-aligned head_dim"
    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)

    def run():
        cache = init_kv_cache(cfg, 2, 32, quantized=kv_quantized)
        logits, cache = prefill(params, prompt, cache, cfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        step, _ = decode_step(params, tok, cache, cfg)
        return np.asarray(step)

    def run_scanned():
        from sparsebit_tpu.llm.decode import (
            decode_step_scanned, prefill_scanned, stack_layers)

        stacked = stack_layers(params)
        cache = init_kv_cache(cfg, 2, 32, quantized=kv_quantized)
        logits, cache = prefill_scanned(stacked, prompt, cache, cfg)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        step, _ = decode_step_scanned(stacked, tok, cache, cfg)
        return np.asarray(step)

    old = D.FORCE_ATTN_KERNEL
    try:
        D.FORCE_ATTN_KERNEL = False
        ref = run()
        D.FORCE_ATTN_KERNEL = True
        out = run()
        out_scanned = run_scanned()  # cache-resident stacked kernel path
    finally:
        D.FORCE_ATTN_KERNEL = old
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
    # scanned path reassociates bf16 accumulations (scan vs unrolled);
    # logits agree to ~2 bf16 ulps
    np.testing.assert_allclose(out_scanned, ref, rtol=2e-2, atol=1.6e-2)
