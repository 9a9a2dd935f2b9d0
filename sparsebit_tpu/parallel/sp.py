"""Sequence parallelism (sp) for LLaMA training via shard_map.

The reference has no long-context/sequence-parallel story (SURVEY §5:
"absent — optional extension"); this is the TPU-native extension: the
sequence axis of the activations is sharded over a mesh axis, so
positionwise work — embedding lookup, RMSNorm, all four projections, the
FFN, the loss — runs on 1/n of the tokens per device and activation
memory scales 1/n with the axis (the enabler for long-context training).

Attention is the only cross-position op. Two implementations:

- ``sp_llama_loss`` (default, Megatron-SP style): K/V are all-gathered
  over the sp axis per layer (ICI all_gather of the small Hkv*D rows —
  for GQA models K/V are n_heads/n_kv_heads times smaller than the
  activations), and each device computes its Q chunk's causal attention
  against the full K/V with an offset mask. Communication per layer:
  2 x (B, S, Hkv, D) all_gather; activations never materialise globally.
- ``sp_llama_loss(ring=True)``: RING attention — K/V chunks ppermute
  around the sp axis while each device accumulates its Q chunk's
  attention with a numerically-stable online softmax (flash-attention
  accumulators: running max, running denominator, running value mix).
  Peak K/V footprint per device is ONE chunk instead of the full
  sequence; the n-step ppermute ring rides ICI neighbor copies and
  overlaps with each step's dots. Same math (exact, not approximate) as
  the all-gather path.

Both compose with data parallelism on a (dp, sp) mesh: batch sharded
over dp, sequence over sp, gradients psum over dp by the caller's
value_and_grad over the shard_mapped loss (shard_map is differentiable).

The next-token shift crosses shard boundaries: targets come from the
REPLICATED token array (each device slices rows [off+1, off+S_loc+1)),
and the global last position is weight-masked. Loss = token-mean over
the full (B, S-1) grid, psum'd over sp (and dp when present) — equal to
llama.llama_loss on the unsharded model.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sparsebit_tpu.llm import llama as L


def _local_attention(q, k_full, v_full, offset, cfg):
    """Causal attention of a local Q chunk (B, S_loc, Hq, D) against the
    FULL K/V (B, S, Hkv, D): position of local row i is offset + i."""
    B, S_loc = q.shape[:2]
    S = k_full.shape[1]
    n_rep = cfg.n_heads // cfg.n_kv_heads
    rows = offset + jnp.arange(S_loc, dtype=jnp.int32)
    cols = jnp.arange(S, dtype=jnp.int32)
    mask = jnp.where(
        cols[None, :] <= rows[:, None], 0.0, -1e9
    )[None, None]  # (1, 1, S_loc, S)
    return L.attention_scores(
        q, L.repeat_kv(k_full, n_rep), L.repeat_kv(v_full, n_rep), mask
    )


def _ring_attention(q, k_loc, v_loc, offset, cfg, axis, n_shards):
    """Exact causal ring attention: K/V chunks rotate around the sp axis;
    each device folds every chunk into flash-style online-softmax
    accumulators. Chunk j (after j hops) arrived from device
    (me + j) % n — its global column offset is ((me + j) % n) * S_loc."""
    B, S_loc, Hq, D = q.shape
    n_rep = cfg.n_heads // cfg.n_kv_heads
    me = jax.lax.axis_index(axis)
    rows = offset + jnp.arange(S_loc, dtype=jnp.int32)
    scale = float(D) ** -0.5
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    # accumulators: running max m, denom l, value mix o (f32)
    m = jnp.full((B, Hq, S_loc, 1), -1e30, jnp.float32)
    denom = jnp.zeros((B, Hq, S_loc, 1), jnp.float32)
    o = jnp.zeros((B, Hq, S_loc, D), jnp.float32)

    k_cur, v_cur = k_loc, v_loc
    for j in range(n_shards):
        src = (me + j) % n_shards
        col0 = src * S_loc
        cols = col0 + jnp.arange(S_loc, dtype=jnp.int32)
        kj = L.repeat_kv(k_cur, n_rep)  # (B, S_loc, Hq, D)
        vj = L.repeat_kv(v_cur, n_rep)
        s_j = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(jnp.float32),
            kj.astype(jnp.float32)
        ) * scale
        s_j = jnp.where(
            cols[None, None, None, :] <= rows[None, None, :, None],
            s_j, -1e30,
        )
        m_j = jnp.max(s_j, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_j)
        # rescale old accumulators, fold the new chunk in
        alpha = jnp.exp(m - m_new)
        p_j = jnp.exp(s_j - m_new)
        denom = denom * alpha + jnp.sum(p_j, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum(
            "bhqk,bkhd->bhqd", p_j, vj.astype(jnp.float32))
        m = m_new
        if j + 1 < n_shards:
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
    out = o / jnp.maximum(denom, 1e-30)
    return jnp.moveaxis(out, 1, 2).astype(q.dtype)  # (B, S_loc, Hq, D)


def _sp_forward_local(params, tok_local, offset, cfg, axis, n_shards,
                      ring):
    B, S_loc = tok_local.shape
    x = params["tok_embed"][tok_local]
    inv_freq = L.rope_frequencies(cfg)
    positions = jnp.broadcast_to(
        offset + jnp.arange(S_loc, dtype=jnp.int32), (B, S_loc)
    )
    for layer in params["layers"]:
        h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q, k, v = L.qkv_proj(layer, h, cfg)
        q = L.apply_rope(q, positions, inv_freq)
        k = L.apply_rope(k, positions, inv_freq)
        if ring:
            out = _ring_attention(q, k, v, offset, cfg, axis, n_shards)
        else:
            # Megatron-SP: gather the (small, GQA-compressed) K/V rows
            k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
            v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
            out = _local_attention(q, k_full, v_full, offset, cfg)
        x = x + layer["wo"](out.reshape(B, S_loc, -1))
        x = x + L._ffn_block(
            layer, L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        )
    return L.rms_norm(x, params["norm"], cfg.rms_eps)


def sp_llama_loss(params, tokens, cfg, mesh, axis="sp", dp_axis=None,
                  ring=False):
    """Sequence-parallel next-token loss == llama.llama_loss. tokens
    (B, S) with S % n_sp == 0; params replicated; batch sharded over
    ``dp_axis`` when given (a (dp, sp) mesh)."""
    n_sp = mesh.shape[axis]
    tok_spec = P(dp_axis, None)  # tokens replicated over sp: targets
    # cross shard boundaries, every device slices its own rows

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), tok_spec),
        out_specs=P(),
    )
    def _loss(params, tokens):
        B, S = tokens.shape
        S_loc = S // n_sp
        me = jax.lax.axis_index(axis)
        offset = me * S_loc
        tok_local = jax.lax.dynamic_slice(
            tokens, (0, offset), (B, S_loc))
        x = _sp_forward_local(
            params, tok_local, offset, cfg, axis, n_sp, ring)
        logits = params["lm_head"](x).astype(jnp.float32)  # (B, S_loc, V)
        # targets: global rows [offset+1, offset+S_loc+1) — the final
        # global position has no target (weight 0)
        tgt = jax.lax.dynamic_slice(
            jnp.pad(tokens, ((0, 0), (0, 1))), (0, offset + 1), (B, S_loc)
        )
        pos = offset + jnp.arange(S_loc, dtype=jnp.int32)
        w = (pos < S - 1).astype(jnp.float32)[None, :]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        loc = jnp.sum(nll * w)
        tot = jax.lax.psum(loc, axis)
        cnt = jax.lax.psum(jnp.sum(w) * B, axis)
        if dp_axis is not None:
            tot = jax.lax.psum(tot, dp_axis)
            cnt = jax.lax.psum(cnt, dp_axis)
        return tot / cnt

    return _loss(params, tokens)
