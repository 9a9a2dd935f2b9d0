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


def stack_layers(params):
    """Stack the per-layer pytrees on a leading axis so decode can
    lax.scan over depth: one compiled layer body (and ONE Pallas kernel
    instance per matmul) instead of n_layers copies — ~n_layers x faster
    compiles.

    RUNTIME CAVEAT (measured on v5e, 7B): XLA's scan dynamic-slices the
    stacked weights per iteration, i.e. it COPIES every layer's packed
    weights each token (140 -> 73 tok/s). Use for compile-bound workflows
    (experiments, CI); serve with the unrolled functions.

    Requires homogeneous layers (same linear kinds/bits/impl); mixed-
    precision GPTQ models with per-layer bits must use the unrolled path.
    """
    out = dict(params)
    out["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    return out


def _scan_cache(cache):
    k = jnp.stack(cache.k)
    v = jnp.stack(cache.v)
    ks = jnp.stack(cache.k_scale) if cache.quantized else jnp.zeros((len(cache.k),))
    vs = jnp.stack(cache.v_scale) if cache.quantized else jnp.zeros((len(cache.k),))
    return k, v, ks, vs


def _unscan_cache(cache, stacked):
    k, v, ks, vs = stacked
    n = k.shape[0]
    return KVCache(
        [k[i] for i in range(n)],
        [v[i] for i in range(n)],
        [ks[i] for i in range(n)] if cache.quantized else [],
        [vs[i] for i in range(n)] if cache.quantized else [],
        cache.length,
        cache.quantized,
    )


def _forward_with_cache_scanned(params, tokens, positions, mask, cache, cfg):
    from sparsebit_tpu.llm.kv_cache import _dequant_heads, _quant_heads

    x = params["tok_embed"][tokens]
    inv_freq = L.rope_frequencies(cfg)
    quant_mode = cache.quantized
    pos0 = positions[:, 0]

    def body(x, layer_and_cache):
        layer, k_l, v_l, ks_l, vs_l = layer_and_cache
        h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        B, S, _ = x.shape
        hd = cfg.head_dim
        q, k, v = L.qkv_proj(layer, h, cfg)
        q = L.apply_rope(q, positions, inv_freq)
        k = L.apply_rope(k, positions, inv_freq)

        def upd(buf, val):
            def one(b, vv, p):
                return jax.lax.dynamic_update_slice(
                    b, vv, (p,) + (0,) * (b.ndim - 1)
                )
            return jax.vmap(one)(buf, val, pos0)

        if quant_mode:
            kq, ksc = _quant_heads(k, quant_mode)
            vq, vsc = _quant_heads(v, quant_mode)
            k_l, v_l = upd(k_l, kq), upd(v_l, vq)
            ks_l, vs_l = upd(ks_l, ksc), upd(vs_l, vsc)
            k_all = _dequant_heads(k_l, ks_l, x.dtype, quant_mode)
            v_all = _dequant_heads(v_l, vs_l, x.dtype, quant_mode)
        else:
            k_l = upd(k_l, k.astype(k_l.dtype))
            v_l = upd(v_l, v.astype(v_l.dtype))
            k_all, v_all = k_l.astype(x.dtype), v_l.astype(x.dtype)

        n_rep = cfg.n_heads // cfg.n_kv_heads
        out = L.attention_scores(
            q, L.repeat_kv(k_all, n_rep), L.repeat_kv(v_all, n_rep), mask
        ).reshape(B, S, cfg.n_heads * hd)
        x = x + layer["wo"](out)
        x = x + L._ffn_block(layer, L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps))
        return x, (k_l, v_l, ks_l, vs_l)

    k, v, ks, vs = _scan_cache(cache)
    layers = {k2: v2 for k2, v2 in params["layers"].items()}
    x, new_stacked = jax.lax.scan(
        lambda xx, lc: body(xx, (lc[0], lc[1], lc[2], lc[3], lc[4])),
        x,
        (layers, k, v, ks, vs),
    )
    cache = _unscan_cache(cache, new_stacked)
    x = L.rms_norm(x, params["norm"], cfg.rms_eps)
    logits = params["lm_head"](x).astype(jnp.float32)
    return logits, cache


@partial(jax.jit, static_argnames=("cfg",))
def prefill_scanned(params_stacked, tokens, cache, cfg):
    """prefill over stacked layers (see stack_layers)."""
    B, S = tokens.shape
    S_max = cache.k[0].shape[1]
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
    mask = jnp.pad(causal, ((0, 0), (0, S_max - S)), constant_values=-1e9)[None, None]
    logits, cache = _forward_with_cache_scanned(
        params_stacked, tokens, positions, mask, cache, cfg
    )
    cache = KVCache(
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        cache.length + S, cache.quantized,
    )
    return logits[:, -1], cache


@partial(jax.jit, static_argnames=("cfg",))
def decode_step_scanned(params_stacked, tokens, cache, cfg):
    """decode_step over stacked layers (see stack_layers)."""
    B = tokens.shape[0]
    S_max = cache.k[0].shape[1]
    positions = cache.length[:, None]
    valid = jnp.arange(S_max, dtype=jnp.int32)[None, :] <= positions
    mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    logits, cache = _forward_with_cache_scanned(
        params_stacked, tokens[:, None], positions, mask, cache, cfg
    )
    cache = KVCache(
        cache.k, cache.v, cache.k_scale, cache.v_scale,
        cache.length + 1, cache.quantized,
    )
    return logits[:, 0], cache


@partial(jax.jit, static_argnames=("cfg", "n_tokens"))
def decode_tokens_scanned(params_stacked, tok0, cache, cfg, n_tokens):
    """Greedy multi-token decode with BOTH loops as lax.scan (layers and
    tokens): compile cost is O(1) in depth and token count."""

    def body(carry, _):
        tok, cache = carry
        logits, cache = decode_step_scanned(params_stacked, tok, cache, cfg)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (tok, cache), tok

    (tok, cache), toks = jax.lax.scan(body, (tok0, cache), None, length=n_tokens)
    return jnp.swapaxes(toks, 0, 1), cache


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
