"""Decode engine: prefill + single-token step + generation loop.

Replaces the reference's LLaMAClass.greedy_search/sample overrides
(llama_wrapper.py:27-657) with two jitted pure functions:

- ``prefill``: run the prompt once, fill the KV cache, return last logits.
- ``decode_step``: one token per sequence against the (INT8) cache, with
  per-sequence positions — this is the continuous-batching primitive:
  sequences at different depths share one compiled step, and a finished
  slot can be re-primed with a new prompt without recompiling.

Sampling (greedy / temperature / top-k / top-p) is computed on device;
the Python loop only carries tokens.
"""

from functools import partial

import jax
import jax.numpy as jnp

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.kv_cache import KVCache, cache_read, cache_update, init_kv_cache


def _layer_with_cache(layer, x, cfg, inv_freq, positions, mask, cache, li):
    """Decoder layer writing/reading the cache. positions (B, S)."""
    h_in = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    B, S, _ = x.shape
    hd = cfg.head_dim
    q, k, v = L.qkv_proj(layer, h_in, cfg)
    q = L.apply_rope(q, positions, inv_freq)
    k = L.apply_rope(k, positions, inv_freq)

    upd = cache_update(cache, li, k, v, positions[:, 0])
    new_k, new_v = upd[0], upd[1]
    tmp_cache = _replace_layer(cache, li, upd)
    k_all, v_all = cache_read(tmp_cache, li, x.dtype)

    n_rep = cfg.n_heads // cfg.n_kv_heads
    out = L.attention_scores(
        q, L.repeat_kv(k_all, n_rep), L.repeat_kv(v_all, n_rep), mask
    )
    out = out.reshape(B, S, cfg.n_heads * hd)
    x = x + layer["wo"](out)
    x = x + L._ffn_block(layer, L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps))
    return x, upd


def _replace_layer(cache, li, upd):
    k = list(cache.k)
    v = list(cache.v)
    ks = list(cache.k_scale)
    vs = list(cache.v_scale)
    k[li], v[li] = upd[0], upd[1]
    if cache.quantized:
        ks[li], vs[li] = upd[2], upd[3]
    return KVCache(k, v, ks, vs, cache.length, cache.quantized)


def _forward_with_cache(params, tokens, positions, mask, cache, cfg):
    x = params["tok_embed"][tokens]
    inv_freq = L.rope_frequencies(cfg)
    for li, layer in enumerate(params["layers"]):
        x, upd = _layer_with_cache(
            layer, x, cfg, inv_freq, positions, mask, cache, li
        )
        cache = _replace_layer(cache, li, upd)
    x = L.rms_norm(x, params["norm"], cfg.rms_eps)
    logits = params["lm_head"](x).astype(jnp.float32)
    return logits, cache


@partial(jax.jit, static_argnames=("cfg",))
def prefill(params, tokens, cache, cfg):
    """tokens (B, S_prompt) -> (last_logits (B, V), cache)."""
    B, S = tokens.shape
    S_max = cache.k[0].shape[1]
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    # causal over the prompt; nothing beyond it is filled yet
    causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
    mask = jnp.pad(causal, ((0, 0), (0, S_max - S)), constant_values=-1e9)[None, None]
    logits, cache = _forward_with_cache(params, tokens, positions, mask, cache, cfg)
    cache = KVCache(
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        cache.length + S, cache.quantized,
    )
    return logits[:, -1], cache


@partial(jax.jit, static_argnames=("cfg",))
def decode_step(params, tokens, cache, cfg):
    """tokens (B,) int32 -> (logits (B, V), cache). Position = cache.length
    per sequence (continuous batching: lengths may differ)."""
    B = tokens.shape[0]
    S_max = cache.k[0].shape[1]
    positions = cache.length[:, None]  # (B, 1)
    valid = jnp.arange(S_max, dtype=jnp.int32)[None, :] <= positions  # (B, S_max)
    mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]  # (B,1,1,S_max)
    logits, cache = _forward_with_cache(
        params, tokens[:, None], positions, mask, cache, cfg
    )
    cache = KVCache(
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        cache.length + 1, cache.quantized,
    )
    return logits[:, 0], cache


@partial(jax.jit, static_argnames=("cfg", "n_tokens"))
def decode_tokens(params, tok0, cache, cfg, n_tokens):
    """Greedy-decode n_tokens entirely on device (lax.scan over
    decode steps) — the serving inner loop: one dispatch, no host
    round-trip per token. Returns (tokens (B, n_tokens), cache)."""

    def body(carry, _):
        tok, cache = carry
        logits, cache = decode_step(params, tok, cache, cfg)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (tok, cache), tok

    (tok, cache), toks = jax.lax.scan(body, (tok0, cache), None, length=n_tokens)
    return jnp.swapaxes(toks, 0, 1), cache


# ---- sampling ---------------------------------------------------------------


@partial(jax.jit, static_argnames=("temperature", "top_k", "top_p"))
def sample_logits(logits, key, temperature=1.0, top_k=0, top_p=1.0):
    """(B, V) -> (B,) int32. temperature<=0 means greedy."""
    if top_k and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    scaled = logits / jnp.maximum(temperature, 1e-6)
    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # first idx exceeding top_p
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def generate(
    params,
    prompt_tokens,
    cfg,
    max_new_tokens=32,
    temperature=0.0,
    top_k=0,
    top_p=1.0,
    kv_quantized=True,
    max_len=None,
    key=None,
    eos_id=None,
):
    """Host generation loop (reference inference.py:50-77).

    prompt_tokens: (B, S) int32. Returns (B, max_new_tokens) int32.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    B, S = prompt_tokens.shape
    S_max = max_len or min(cfg.max_seq_len, S + max_new_tokens)
    cache = init_kv_cache(cfg, B, S_max, kv_quantized)
    logits, cache = prefill(params, prompt_tokens, cache, cfg)
    outs = []
    done = jnp.zeros((B,), bool)
    tok = None
    for _ in range(max_new_tokens):
        key, sub = jax.random.split(key)
        tok = sample_logits(logits, sub, temperature, top_k, top_p)
        if eos_id is not None:
            done = done | (tok == eos_id)
            tok = jnp.where(done, eos_id, tok)
        outs.append(tok)
        logits, cache = decode_step(params, tok, cache, cfg)
        if eos_id is not None and bool(jnp.all(done)):
            break
    return jnp.stack(outs, axis=1)
