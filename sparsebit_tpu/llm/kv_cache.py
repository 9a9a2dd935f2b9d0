"""KV cache: bf16 or INT8 (per-token-per-head dynamic scales).

Reference has no KV cache abstraction (HF eager attention re-reads full
fp16 K/V); the INT8 cache is part of the BASELINE.json north star. Layout
(B, S_max, n_kv, hd) with the sequence axis second so decode-step
dynamic_update_slice touches one contiguous row per (batch, layer), and the
head axis is shardable for tensor parallelism.

Quant scheme: symmetric int8, scale per (token, head) = absmax/127 — the
value distribution varies most across tokens and heads, not within a head's
128 lanes. Dequant happens inside the attention matmuls; XLA fuses the
scale multiply into the operand read, so the HBM traffic is the int8 bytes
(the 2x win over bf16 is the point: decode attention is cache-bandwidth
bound).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "k_scale", "v_scale", "length"],
         meta_fields=["quantized"])
@dataclass
class KVCache:
    k: list  # per layer: (B, S, n_kv, hd) int8|bf16
    v: list
    k_scale: list  # per layer: (B, S, n_kv) f32 (empty list if not quantized)
    v_scale: list
    length: jnp.ndarray  # (B,) int32 — tokens filled per sequence
    quantized: bool


def init_kv_cache(cfg, batch, max_len=None, quantized=True):
    """quantized: False (bf16), True/"int8", or "int4" (packed pairs along
    head_dim — 4x smaller than bf16; decode attention is cache-bandwidth
    bound, so the compression is throughput)."""
    S = max_len or cfg.max_seq_len
    if quantized is True:
        quantized = "int8"
    shape = (batch, S, cfg.n_kv_heads, cfg.head_dim)
    if quantized == "int4":
        assert cfg.head_dim % 2 == 0
        pshape = shape[:3] + (cfg.head_dim // 2,)
        k = [jnp.zeros(pshape, jnp.uint8) for _ in range(cfg.n_layers)]
        v = [jnp.zeros(pshape, jnp.uint8) for _ in range(cfg.n_layers)]
        ks = [jnp.zeros(shape[:3], jnp.float32) for _ in range(cfg.n_layers)]
        vs = [jnp.zeros(shape[:3], jnp.float32) for _ in range(cfg.n_layers)]
    elif quantized == "int8":
        k = [jnp.zeros(shape, jnp.int8) for _ in range(cfg.n_layers)]
        v = [jnp.zeros(shape, jnp.int8) for _ in range(cfg.n_layers)]
        ks = [jnp.zeros(shape[:3], jnp.float32) for _ in range(cfg.n_layers)]
        vs = [jnp.zeros(shape[:3], jnp.float32) for _ in range(cfg.n_layers)]
    else:
        k = [jnp.zeros(shape, cfg.jnp_dtype) for _ in range(cfg.n_layers)]
        v = [jnp.zeros(shape, cfg.jnp_dtype) for _ in range(cfg.n_layers)]
        ks, vs = [], []
    return KVCache(k, v, ks, vs, jnp.zeros((batch,), jnp.int32), quantized)


def _quant_heads(x, mode="int8"):
    """(B, S, H, hd) -> codes + (B, S, H) scales. int8: symmetric s8 with
    bf16-ROUNDED scales — the flat serving cache stores scales bf16
    (halves/eighths the scale-slab stream, VERDICT r4 #2), and quantizing
    the codes against the ROUNDED value keeps codes/scales
    self-consistent across every path (the f32<->bf16 scale casts at the
    cache-format boundary are then lossless). int4: symmetric 4-bit pairs
    packed into uint8 along head_dim (XLA paths only; scales stay f32).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    if mode == "int4":
        scale = jnp.maximum(absmax, 1e-8) / 7.0
        q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7
        ).astype(jnp.int32) + 8  # [1, 15]
        lo = q[..., 0::2]
        hi = q[..., 1::2]
        return (lo | (hi << 4)).astype(jnp.uint8), scale
    scale = (jnp.maximum(absmax, 1e-8) / 127.0).astype(
        jnp.bfloat16).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -128, 127)
    return q.astype(jnp.int8), scale


def _dequant_heads(q, scale, dtype, mode="int8"):
    if mode == "int4":
        w = q.astype(jnp.int32)
        lo = (w & 0xF) - 8
        hi = ((w >> 4) & 0xF) - 8
        full = jnp.stack([lo, hi], axis=-1).reshape(q.shape[:-1] + (-1,))
        return (full.astype(jnp.float32) * scale[..., None]).astype(dtype)
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def cache_update(cache, layer_idx, k_new, v_new, positions):
    """Write k/v (B, S_new, n_kv, hd) at ``positions`` (B,) per sequence.

    S_new is static (1 for decode, prompt length for prefill). Returns the
    updated per-layer arrays (callers rebuild the KVCache once per step).
    """
    B = k_new.shape[0]

    def upd(buf, val):
        def one(b_buf, b_val, p):
            return jax.lax.dynamic_update_slice(
                b_buf, b_val, (p,) + (0,) * (b_buf.ndim - 1)
            )
        return jax.vmap(one)(buf, val, positions)

    if cache.quantized:
        kq, ks = _quant_heads(k_new, cache.quantized)
        vq, vs = _quant_heads(v_new, cache.quantized)
        return (
            upd(cache.k[layer_idx], kq),
            upd(cache.v[layer_idx], vq),
            upd(cache.k_scale[layer_idx], ks),
            upd(cache.v_scale[layer_idx], vs),
        )
    return (
        upd(cache.k[layer_idx], k_new.astype(cache.k[layer_idx].dtype)),
        upd(cache.v[layer_idx], v_new.astype(cache.v[layer_idx].dtype)),
        None,
        None,
    )


def cache_read(cache, layer_idx, dtype):
    """Full (dequantized) K, V for a layer: (B, S, n_kv, hd)."""
    if cache.quantized:
        mode = cache.quantized
        k = _dequant_heads(
            cache.k[layer_idx], cache.k_scale[layer_idx], dtype, mode
        )
        v = _dequant_heads(
            cache.v[layer_idx], cache.v_scale[layer_idx], dtype, mode
        )
        return k, v
    return cache.k[layer_idx].astype(dtype), cache.v[layer_idx].astype(dtype)


# ---- paged (block-table) cache ----------------------------------------------
#
# vLLM-style paged KV for the serving engine (reference serves one request
# at a time; BASELINE.json's continuous-batching north star + round-1
# VERDICT #6 ask for a block allocator). Physical storage is a POOL of
# fixed-size row blocks shared by all slots; each slot's logical sequence
# is its block_table row — so cache HBM is provisioned for the ENGINE's
# total context budget, not max_batch x max_len, and identical prompt
# prefixes can SHARE read-only blocks (allocator refcounts). The decode
# megakernel takes the table via scalar prefetch and DMAs exactly the
# blocks within each slot's context (ops/layer_fused, length-chunked
# loads) — the gather indirection is SMEM scalar arithmetic, not a
# data-plane gather.


@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "k_scale", "v_scale", "block_table",
                      "length"],
         meta_fields=[])
@dataclass
class PagedKVCache:
    k: jnp.ndarray        # (L, n_blocks, block, n_kv, hd) int8
    v: jnp.ndarray        # (L, n_blocks, block, n_kv, hd) int8
    k_scale: jnp.ndarray  # (L, n_blocks, n_kv, block) bf16, TRANSPOSED
    v_scale: jnp.ndarray  # (L, n_blocks, n_kv, block) bf16
    block_table: jnp.ndarray  # (B, max_chunks) int32 physical block ids
    length: jnp.ndarray   # (B,) int32 tokens filled per slot

    @property
    def block(self):
        return self.k.shape[2]

    @property
    def n_blocks(self):
        return self.k.shape[1]


def init_paged_kv_cache(cfg, batch, n_blocks, block=128, max_chunks=None):
    """INT8 pools in the decode megakernel's serving layout (rows
    (n_kv, hd) int8 — the kernel reads them through a flat ref reshape
    and row-commits them 5-D; scales bf16 tight-head, TRANSPOSED
    (n_kv, block) per pool block so the kernel's lane chunks are
    tile-aligned — round 5) + an all-zeros block table. max_chunks
    defaults to ceil(max_seq_len / block)."""
    if max_chunks is None:
        max_chunks = -(-cfg.max_seq_len // block)
    Lx = cfg.n_layers
    shape = (Lx, n_blocks, block, cfg.n_kv_heads, cfg.head_dim)
    return PagedKVCache(
        k=jnp.zeros(shape, jnp.int8),
        v=jnp.zeros(shape, jnp.int8),
        k_scale=jnp.zeros((Lx, n_blocks, cfg.n_kv_heads, block),
                          jnp.bfloat16),
        v_scale=jnp.zeros((Lx, n_blocks, cfg.n_kv_heads, block),
                          jnp.bfloat16),
        block_table=jnp.zeros((batch, max_chunks), jnp.int32),
        length=jnp.zeros((batch,), jnp.int32),
    )


@partial(jax.jit, donate_argnums=(0,))
def paged_write_rows(pcache, slot_blocks, rows_k, rows_v, rows_ks, rows_vs,
                     n_rows, offset):
    """Scatter ``n_rows`` contiguous logical rows (from a prefill) into one
    slot's blocks starting at logical row ``offset``.

    slot_blocks (max_chunks,) int32; rows_k/v (L, S_buf, n_kv, hd) int8;
    rows_ks/vs (L, S_buf, n_kv) bf16; n_rows/offset scalars (S_buf
    static). Rows land at pool[blk[(offset+i)//block], (offset+i) %
    block]; rows >= n_rows are masked out (scatter drops out-of-range
    indices). Scale pools are TRANSPOSED (L, n_blocks, n_kv, block) —
    the non-adjacent advanced indices move the row dim to the front, so
    those values are passed (S_buf, L, n_kv)."""
    block = pcache.block
    S_buf = rows_k.shape[1]
    i = jnp.arange(S_buf, dtype=jnp.int32)
    logical = offset + i
    blk = slot_blocks[jnp.clip(logical // block, 0,
                               slot_blocks.shape[0] - 1)]
    row = logical % block
    # out-of-range block id disables the write (scatter drop semantics)
    blk = jnp.where(i < n_rows, blk, pcache.n_blocks)
    k = pcache.k.at[:, blk, row].set(rows_k, mode="drop")
    v = pcache.v.at[:, blk, row].set(rows_v, mode="drop")
    ks = pcache.k_scale.at[:, blk, :, row].set(
        jnp.swapaxes(rows_ks, 0, 1), mode="drop")
    vs = pcache.v_scale.at[:, blk, :, row].set(
        jnp.swapaxes(rows_vs, 0, 1), mode="drop")
    return PagedKVCache(k, v, ks, vs, pcache.block_table, pcache.length)
