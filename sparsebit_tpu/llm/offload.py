"""Host-offload weight streaming: models larger than HBM on one chip.

Reference: single_device_mode (llama_wrapper.py:846-926) — three CUDA
streams prefetch the next decoder layer's packed weights host->device while
the current layer computes, then restore. TPU-native equivalent:

- layer params live in host RAM (numpy/jax CPU arrays);
- ``jax.device_put`` is asynchronous: issuing the transfer for layer i+1
  before dispatching layer i's compute overlaps PCIe/DCN copy with TPU
  compute (same double-buffering, no explicit streams needed);
- one jitted per-layer function is reused for every layer (identical
  shapes), so compile cost is O(1) in depth;
- the KV cache stays resident on device (it is small next to the weights).

This serves the reference's LLaMA-65B-on-one-GPU use case: 65B INT4-g128
is ~33 GB packed; two layers in flight are ~1 GB on a 16 GB chip.
"""

from functools import partial

import jax
import jax.numpy as jnp

from sparsebit_tpu.llm import llama as L


def offload_llama_params(params):
    """Move per-layer weights to host memory; keep embed/norm/head on device
    (they are needed every token and are comparatively small)."""
    cpu = jax.devices("cpu")[0]
    out = dict(params)
    out["layers"] = [
        jax.tree.map(lambda a: jax.device_put(a, cpu), layer)
        for layer in params["layers"]
    ]
    return out


@partial(jax.jit, static_argnames=("cfg",), donate_argnums=(3, 4, 5, 6))
def _layer_step(layer, x, rope_mask, k_l, v_l, ks_l, vs_l, positions, cfg):
    """One decoder layer against its cache slice. rope_mask = (inv_freq,
    mask) packed to keep the signature short."""
    inv_freq, mask = rope_mask
    h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    B, S, _ = x.shape
    hd = cfg.head_dim
    q, k, v = L.qkv_proj(layer, h, cfg)
    q = L.apply_rope(q, positions, inv_freq)
    k = L.apply_rope(k, positions, inv_freq)

    from sparsebit_tpu.llm.kv_cache import _dequant_heads, _quant_heads

    quantized = k_l.dtype == jnp.int8

    def upd(buf, val):
        def one(b, v, p):
            return jax.lax.dynamic_update_slice(b, v, (p,) + (0,) * (b.ndim - 1))

        return jax.vmap(one)(buf, val, positions[:, 0])

    if quantized:
        kq, ks = _quant_heads(k)
        vq, vs = _quant_heads(v)
        k_l, v_l = upd(k_l, kq), upd(v_l, vq)
        ks_l, vs_l = upd(ks_l, ks), upd(vs_l, vs)
        k_all = _dequant_heads(k_l, ks_l, x.dtype)
        v_all = _dequant_heads(v_l, vs_l, x.dtype)
    else:
        k_l, v_l = upd(k_l, k.astype(k_l.dtype)), upd(v_l, v.astype(v_l.dtype))
        k_all, v_all = k_l.astype(x.dtype), v_l.astype(x.dtype)

    n_rep = cfg.n_heads // cfg.n_kv_heads
    out = L.attention_scores(
        q, L.repeat_kv(k_all, n_rep), L.repeat_kv(v_all, n_rep), mask
    ).reshape(B, S, cfg.n_heads * hd)
    x = x + layer["wo"](out)
    x = x + L._ffn_block(layer, L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps))
    return x, k_l, v_l, ks_l, vs_l


class StreamingLlama:
    """Decode/forward driver with layer-wise weight streaming."""

    def __init__(self, params_host, cfg, prefetch=2):
        dev = jax.devices()[0]
        self.dev = dev
        self.cfg = cfg
        self.layers_host = params_host["layers"]
        self.resident = {
            k: jax.device_put(v, dev)
            for k, v in params_host.items()
            if k != "layers"
        }
        self.prefetch = max(1, prefetch)
        self.inv_freq = L.rope_frequencies(cfg)

    def _fetch(self, i):
        return jax.tree.map(
            lambda a: jax.device_put(a, self.dev), self.layers_host[i]
        )

    def _run_layers(self, x, positions, mask, cache):
        n = len(self.layers_host)
        buf = {i: self._fetch(i) for i in range(min(self.prefetch, n))}
        for i in range(n):
            nxt = i + self.prefetch
            if nxt < n:
                buf[nxt] = self._fetch(nxt)  # async H2D, overlaps compute
            layer = buf.pop(i)
            x, k_l, v_l, ks_l, vs_l = _layer_step(
                layer,
                x,
                (self.inv_freq, mask),
                cache.k[i],
                cache.v[i],
                cache.k_scale[i] if cache.quantized else jnp.zeros((0,)),
                cache.v_scale[i] if cache.quantized else jnp.zeros((0,)),
                positions,
                self.cfg,
            )
            cache.k[i], cache.v[i] = k_l, v_l
            if cache.quantized:
                cache.k_scale[i], cache.v_scale[i] = ks_l, vs_l
            del layer
        return x, cache

    def prefill(self, tokens, cache):
        assert cache.quantized != "int4", (
            "StreamingLlama supports bf16/int8 caches (int4 pending)"
        )
        B, S = tokens.shape
        S_max = cache.k[0].shape[1]
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
        causal = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)
        mask = jnp.pad(causal, ((0, 0), (0, S_max - S)), constant_values=-1e9)[
            None, None
        ]
        x = self.resident["tok_embed"][tokens]
        x, cache = self._run_layers(x, positions, mask, cache)
        x = L.rms_norm(x, self.resident["norm"], self.cfg.rms_eps)
        logits = self.resident["lm_head"](x).astype(jnp.float32)
        cache.length = cache.length + S
        return logits[:, -1], cache

    def decode_step(self, tokens, cache):
        B = tokens.shape[0]
        S_max = cache.k[0].shape[1]
        positions = cache.length[:, None]
        valid = jnp.arange(S_max, dtype=jnp.int32)[None, :] <= positions
        mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
        x = self.resident["tok_embed"][tokens[:, None]]
        x, cache = self._run_layers(x, positions, mask, cache)
        x = L.rms_norm(x, self.resident["norm"], self.cfg.rms_eps)
        logits = self.resident["lm_head"](x).astype(jnp.float32)
        cache.length = cache.length + 1
        return logits[:, 0], cache
