"""Functional LLaMA for TPU (RoPE, GQA, RMSNorm, SwiGLU).

Replaces the reference's HF-wrapped LLaMA (llama_wrapper.py) with a pure
pytree-of-params model designed for pjit sharding:

- every linear is a ``DenseLinear`` or packed ``QuantLinear`` (llm/quant.py)
  — quantized inference needs no module surgery, just a params transform;
- prefill and decode are separate pure functions; decode consumes a
  KV cache pytree (fp or INT8, llm/kv_cache.py);
- no data-dependent Python control flow: jit-safe end to end.

Shape conventions: activations (B, S, D); attention weights (D, H*hd);
decode positions are explicit int32 operands so one compiled step serves
the whole generation loop.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from sparsebit_tpu.llm.quant import DenseLinear


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    ffn_dim: int = 11008
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    dtype: str = "bfloat16"

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


def llama_7b():
    return LlamaConfig()


def llama_13b():
    return LlamaConfig(dim=5120, n_layers=40, n_heads=40, n_kv_heads=40, ffn_dim=13824)


def llama_tiny(**kw):
    """Test-scale config."""
    d = dict(
        vocab_size=512, dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=512, max_seq_len=256,
    )
    d.update(kw)
    return LlamaConfig(**d)


def init_llama_params(cfg, key=None, scale=0.02):
    key = key if key is not None else jax.random.PRNGKey(0)
    dt = cfg.jnp_dtype
    n_kv = cfg.n_kv_heads
    hd = cfg.head_dim

    def lin(key, k, n):
        return DenseLinear((jax.random.normal(key, (k, n), jnp.float32) * scale).astype(dt))

    keys = jax.random.split(key, cfg.n_layers + 3)
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append(
            {
                "attn_norm": jnp.ones((cfg.dim,), dt),
                "wq": lin(ks[0], cfg.dim, cfg.n_heads * hd),
                "wk": lin(ks[1], cfg.dim, n_kv * hd),
                "wv": lin(ks[2], cfg.dim, n_kv * hd),
                "wo": lin(ks[3], cfg.n_heads * hd, cfg.dim),
                "ffn_norm": jnp.ones((cfg.dim,), dt),
                "w1": lin(ks[4], cfg.dim, cfg.ffn_dim),
                "w3": lin(ks[5], cfg.dim, cfg.ffn_dim),
                "w2": lin(ks[6], cfg.ffn_dim, cfg.dim),
            }
        )
    return {
        "tok_embed": (
            jax.random.normal(keys[-3], (cfg.vocab_size, cfg.dim), jnp.float32) * scale
        ).astype(dt),
        "layers": layers,
        "norm": jnp.ones((cfg.dim,), dt),
        "lm_head": lin(keys[-2], cfg.dim, cfg.vocab_size),
    }


# ---- building blocks --------------------------------------------------------


def rms_norm(x, weight, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def rope_frequencies(cfg):
    hd = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    return inv  # (hd/2,)


def apply_rope(x, positions, inv_freq):
    """x: (B, S, H, hd); positions: (B, S) int32."""
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B,S,hd/2)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def repeat_kv(x, n_rep):
    """(B, S, n_kv, hd) -> (B, S, n_kv*n_rep, hd)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.repeat(x, n_rep, axis=2)


def attention_scores(q, k, v, mask):
    """q (B,Sq,H,hd), k/v (B,Sk,H,hd), mask broadcastable (B,1,Sq,Sk)."""
    hd = q.shape[-1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) / jnp.sqrt(hd).astype(jnp.float32)
    scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _flash_ok(q):
    B, S, H, hd = q.shape
    return (
        jax.default_backend() == "tpu"
        and S % 128 == 0
        and S >= 128
        and hd in (64, 128, 256)
    )


def causal_attention(q, k, v):
    """Causal self-attention for prefill/scoring: Pallas flash attention on
    TPU (online-softmax tiling — never materialises the (S, S) score
    matrix), einsum+mask fallback elsewhere."""
    B, S, H, hd = q.shape
    if _flash_ok(q):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        # bf16 models keep bf16 flash OPERANDS (the kernel's softmax/accum
        # math is f32 regardless): halves the QK^T/AV MXU passes — ~2x the
        # attention phase of the 2048-token prefill. f32 models stay f32.
        dt = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        out = flash_attention(
            jnp.swapaxes(q, 1, 2).astype(dt),
            jnp.swapaxes(k, 1, 2).astype(dt),
            jnp.swapaxes(v, 1, 2).astype(dt),
            causal=True,
            sm_scale=float(hd) ** -0.5,
        )
        return jnp.swapaxes(out, 1, 2).astype(q.dtype)
    mask = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
    return attention_scores(q, k, v, mask)


def qkv_proj(layer, x, cfg):
    """(q, k, v) heads from either separate wq/wk/wv or a fused wqkv
    (one kernel launch instead of three — see fuse_llama_params)."""
    B, S, _ = x.shape
    hd = cfg.head_dim
    nq = cfg.n_heads * hd
    nkv = cfg.n_kv_heads * hd
    if "wqkv" in layer:
        qkv = layer["wqkv"](x)
        q = qkv[..., :nq].reshape(B, S, cfg.n_heads, hd)
        k = qkv[..., nq : nq + nkv].reshape(B, S, cfg.n_kv_heads, hd)
        v = qkv[..., nq + nkv :].reshape(B, S, cfg.n_kv_heads, hd)
    else:
        q = layer["wq"](x).reshape(B, S, cfg.n_heads, hd)
        k = layer["wk"](x).reshape(B, S, cfg.n_kv_heads, hd)
        v = layer["wv"](x).reshape(B, S, cfg.n_kv_heads, hd)
    return q, k, v


def _attn_block(layer, x, cfg, inv_freq, positions, mask, kv=None):
    """Returns (attn_out, (k, v) for cache)."""
    B, S, _ = x.shape
    hd = cfg.head_dim
    q, k, v = qkv_proj(layer, x, cfg)
    q = apply_rope(q, positions, inv_freq)
    k = apply_rope(k, positions, inv_freq)
    if kv is not None:
        k_all, v_all = kv
    else:
        k_all, v_all = k, v
    n_rep = cfg.n_heads // cfg.n_kv_heads
    if kv is None and mask is None:
        out = causal_attention(
            q, repeat_kv(k_all, n_rep), repeat_kv(v_all, n_rep)
        )
    else:
        out = attention_scores(
            q, repeat_kv(k_all, n_rep), repeat_kv(v_all, n_rep), mask
        )
    out = out.reshape(B, S, cfg.n_heads * hd)
    return layer["wo"](out), (k, v)


def _ffn_block(layer, x):
    if "w13" in layer:
        h = layer["w13"](x)
        g, u = jnp.split(h, 2, axis=-1)
        return layer["w2"](jax.nn.silu(g) * u)
    return layer["w2"](jax.nn.silu(layer["w1"](x)) * layer["w3"](x))


def decoder_layer(layer, x, cfg, inv_freq, positions, mask, kv=None):
    h, new_kv = _attn_block(
        layer, rms_norm(x, layer["attn_norm"], cfg.rms_eps),
        cfg, inv_freq, positions, mask, kv,
    )
    x = x + h
    x = x + _ffn_block(layer, rms_norm(x, layer["ffn_norm"], cfg.rms_eps))
    return x, new_kv


# ---- full forward (prefill / scoring) ---------------------------------------


def llama_backbone(params, tokens, cfg, return_kv=False):
    """tokens (B, S) int32 -> final-norm hidden states (B, S, D). Causal,
    no cache; mask=None selects the flash-attention path on TPU. Split
    from llama_forward so evaluation can apply the lm_head in sequence
    chunks (eval._window_nll_chunked) instead of materialising the full
    (B, S, V) logits."""
    B, S = tokens.shape
    x = params["tok_embed"][tokens]
    inv_freq = rope_frequencies(cfg)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    kvs = []
    for layer in params["layers"]:
        x, kv = decoder_layer(layer, x, cfg, inv_freq, positions, None)
        if return_kv:
            kvs.append(kv)
    x = rms_norm(x, params["norm"], cfg.rms_eps)
    if return_kv:
        return x, kvs
    return x


def llama_forward(params, tokens, cfg, return_kv=False):
    """tokens (B, S) int32 -> logits (B, S, V). Causal, no cache."""
    if return_kv:
        x, kvs = llama_backbone(params, tokens, cfg, return_kv=True)
        return params["lm_head"](x).astype(jnp.float32), kvs
    x = llama_backbone(params, tokens, cfg)
    return params["lm_head"](x).astype(jnp.float32)


def llama_loss(params, tokens, cfg):
    """Next-token cross-entropy (for perplexity eval, reference
    convert.py:176-259 llama_eval)."""
    logits = llama_forward(params, tokens[:, :-1], cfg)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def fuse_llama_params(params):
    """Fuse wq/wk/wv -> wqkv and w1/w3 -> w13 (dense params; quantized
    fusion happens at pack time: columns are independent, so GPTQ/RTN of
    the concatenation equals per-matrix solves). Halves+ the kernel
    launches per decode step: 7 matmuls -> 4."""
    from sparsebit_tpu.llm.quant import DenseLinear

    def cat(lins):
        w = jnp.concatenate([l.w for l in lins], axis=1)
        biases = [l.bias for l in lins]
        b = (
            jnp.concatenate(
                [
                    b if b is not None else jnp.zeros((l.w.shape[1],), w.dtype)
                    for b, l in zip(biases, lins)
                ]
            )
            if any(b is not None for b in biases)
            else None
        )
        return DenseLinear(w, b)

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = {
            "attn_norm": layer["attn_norm"],
            "ffn_norm": layer["ffn_norm"],
            "wqkv": cat([layer["wq"], layer["wk"], layer["wv"]]),
            "wo": layer["wo"],
            "w13": cat([layer["w1"], layer["w3"]]),
            "w2": layer["w2"],
        }
        out["layers"].append(new_layer)
    return out


_LINEAR_NAMES = ("wq", "wk", "wv", "wo", "w1", "w2", "w3", "wqkv", "w13")


def quantize_llama_params(params, quantize_fn, skip=("lm_head",)):
    """Return a new params pytree with every DenseLinear replaced via
    ``quantize_fn(path, lin) -> DenseLinear|QuantLinear``.

    The layer-name path (e.g. "layers.3.wq") feeds per-layer bit decisions
    (mixed-precision GPTQ metadata, reference convert.py:355-365).
    """
    out = dict(params)
    out["layers"] = []
    for i, layer in enumerate(params["layers"]):
        new_layer = dict(layer)
        for name in _LINEAR_NAMES:
            if name not in layer:
                continue
            path = "layers.{}.{}".format(i, name)
            new_layer[name] = quantize_fn(path, layer[name])
        out["layers"].append(new_layer)
    if "lm_head" not in skip:
        out["lm_head"] = quantize_fn("lm_head", params["lm_head"])
    return out
