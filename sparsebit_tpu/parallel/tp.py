"""Tensor parallelism for (quantized) LLaMA via shard_map.

Megatron-style sharding, packed-weight aware (the BASELINE.json north star:
weights + KV-cache tensor-sharded, collectives overlapped with
dequant-matmul):

- wq/wk/wv, w1/w3, lm_head: column-parallel — each device packs its own
  contiguous output-column block (head groups for attention), so the
  sub-byte column-plane layout stays device-local and the Pallas kernel
  needs no cross-device awareness.
- wo, w2: row-parallel — inputs arrive already column-sharded from the
  producer, local matmul yields a partial sum, one psum per residual
  branch rides ICI (XLA's latency-hiding scheduler overlaps it with the
  next layer's dequant work).
- lm_head stays vocab-sharded; cross-entropy is computed with a
  pmax/psum-logsumexp so full logits are never materialised.

Sharding is done AT PACK TIME (shard_quantlinear): quantization groups are
along K, so column splits never cut a group; row splits land on group
boundaries because groupsize | K/T is validated.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.quant import DenseLinear, QuantLinear


@jax.tree_util.register_pytree_node_class
class TPLinear:
    """Per-device shards of a linear, stacked on a leading tp axis.

    ``stacked`` is a DenseLinear/QuantLinear whose every array leaf has a
    leading T axis; ``kind`` is "col" (output columns sharded) or "row"
    (input rows sharded, psum after).
    """

    def __init__(self, stacked, kind):
        self.stacked = stacked
        self.kind = kind

    def local(self):
        """Inside shard_map: strip the (length-1) shard axis."""
        return jax.tree.map(lambda x: x[0], self.stacked)

    def tree_flatten(self):
        return (self.stacked,), (self.kind,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


def _stack_linears(lins):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *lins)


def shard_linear(lin, T, kind, bits=None, groupsize=-1):
    """Split a DenseLinear along columns/rows into T shards; quantize+pack
    each shard independently when ``bits`` is set.

    LoraLinear inputs shard base + adapters consistently: column-parallel
    splits lora_B's output columns (lora_A replicated); row-parallel splits
    lora_A's input rows (lora_B replicated) — the per-branch psum then sums
    partial x@A_t@B terms to the full adapter output."""
    from sparsebit_tpu.llm.qlora import LoraLinear

    if isinstance(lin, LoraLinear):
        base_tp = shard_linear(lin.base, T, kind, bits, groupsize)
        if kind == "col":
            Nl = lin.lora_B.shape[1] // T
            shards = [
                LoraLinear(
                    jax.tree.map(lambda a: a[t], base_tp.stacked),
                    lin.lora_A,
                    lin.lora_B[:, t * Nl : (t + 1) * Nl],
                    lin.alpha,
                    lin.dropout,
                )
                for t in range(T)
            ]
        else:
            Kl = lin.lora_A.shape[0] // T
            shards = [
                LoraLinear(
                    jax.tree.map(lambda a: a[t], base_tp.stacked),
                    lin.lora_A[t * Kl : (t + 1) * Kl, :],
                    lin.lora_B,
                    lin.alpha,
                    lin.dropout,
                )
                for t in range(T)
            ]
        return TPLinear(_stack_linears(shards), kind)

    w = lin.w if isinstance(lin, DenseLinear) else lin.dequantize()
    K, N = w.shape
    shards = []
    for t in range(T):
        if kind == "col":
            assert N % T == 0
            ws = w[:, t * (N // T) : (t + 1) * (N // T)]
            bs = (
                lin.bias[t * (N // T) : (t + 1) * (N // T)]
                if lin.bias is not None
                else None
            )
        else:
            assert K % T == 0
            gs_eff = groupsize if groupsize and groupsize > 0 else K
            assert (K // T) % gs_eff == 0 or bits is None, (
                "row shard {} not aligned to groupsize {}".format(K // T, gs_eff)
            )
            ws = w[t * (K // T) : (t + 1) * (K // T), :]
            # bias added once after the psum: fold 1/T into each shard
            bs = lin.bias / T if lin.bias is not None else None
        if bits is None:
            shards.append(DenseLinear(ws, bs))
        else:
            shards.append(
                QuantLinear.from_dense(ws, bits=bits, groupsize=groupsize, bias=bs)
            )
    return TPLinear(_stack_linears(shards), kind)


def shard_quantlinear(lin, T, kind, conv=None):
    """EXACT packed split of a QuantLinear — codes/scales/zeros are sliced,
    never requantized, so a TP-sharded GPTQ checkpoint dequantizes to
    bit-identical values per shard (shard_linear's dequantize->from_dense
    round-trip would re-round). ``conv`` optionally maps each shard (e.g.
    the serving layout). Column split slices output columns (groups are
    along K -> untouched); row split slices whole groups (requires
    (K/T) % groupsize == 0; per-channel qparams are shared across row
    shards — dequant is elementwise, so a row subset with the full-K
    scale/zero is exact)."""
    from sparsebit_tpu.ops.packing import unpack_columns

    codes = unpack_columns(lin.packed, lin.bits, lin.n_padded)
    codes = codes[:, : lin.out_features]
    scales = lin.scales[:, : lin.out_features].astype(jnp.float32)
    zeros = lin.zeros[:, : lin.out_features].astype(jnp.float32)
    K, N = codes.shape
    shards = []
    if kind == "col":
        assert N % T == 0, (N, T)
        Nl = N // T
        for t in range(T):
            sl = slice(t * Nl, (t + 1) * Nl)
            b = lin.bias[sl] if lin.bias is not None else None
            shards.append(QuantLinear.from_codes(
                codes[:, sl], scales[:, sl], zeros[:, sl], lin.bits,
                lin.groupsize, bias=b, impl=lin.impl, perm=lin.perm,
            ))
    else:
        assert lin.perm is None, (
            "row-sharding an act-order (perm) QuantLinear would permute "
            "input channels across shards"
        )
        assert K % T == 0, (K, T)
        Kl = K // T
        if lin.groupsize > 0:
            assert Kl % lin.groupsize == 0, (
                "row shard {} not aligned to groupsize {}".format(
                    Kl, lin.groupsize)
            )
            Gl = Kl // lin.groupsize
        for t in range(T):
            c = codes[t * Kl: (t + 1) * Kl]
            if lin.groupsize > 0:
                s = scales[t * Gl: (t + 1) * Gl]
                z = zeros[t * Gl: (t + 1) * Gl]
            else:
                s, z = scales, zeros
            # bias added once after the psum: fold 1/T into each shard
            b = lin.bias / T if lin.bias is not None else None
            shards.append(QuantLinear.from_codes(
                c, s, z, lin.bits, lin.groupsize, bias=b, impl=lin.impl,
            ))
    if conv is not None:
        shards = [conv(sh) for sh in shards]
    return TPLinear(_stack_linears(shards), kind)


_COL = ("wq", "wk", "wv", "w1", "w3")
_ROW = ("wo", "w2")


def shard_llama_params_tp(params, cfg, T, bits=None, groupsize=-1):
    """Transform a (dense or quantized->dequantized) LLaMA params pytree
    into a TP-sharded one. n_heads and n_kv_heads must divide by T so
    column blocks align with head groups."""
    assert cfg.n_heads % T == 0 and cfg.n_kv_heads % T == 0
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for name in _COL:
            new_layer[name] = shard_linear(layer[name], T, "col", bits, groupsize)
        for name in _ROW:
            new_layer[name] = shard_linear(layer[name], T, "row", bits, groupsize)
        out["layers"].append(new_layer)
    out["lm_head"] = shard_linear(params["lm_head"], T, "col", bits, groupsize)
    return out


# ---- local (per-device) forward ---------------------------------------------


def _tp_attn(layer, x, cfg, inv_freq, positions, mask, T):
    B, S, _ = x.shape
    hd = cfg.head_dim
    h_loc = cfg.n_heads // T
    kv_loc = cfg.n_kv_heads // T
    wq, wk, wv = (layer[n].local() for n in ("wq", "wk", "wv"))
    q = wq(x).reshape(B, S, h_loc, hd)
    k = wk(x).reshape(B, S, kv_loc, hd)
    v = wv(x).reshape(B, S, kv_loc, hd)
    q = L.apply_rope(q, positions, inv_freq)
    k = L.apply_rope(k, positions, inv_freq)
    n_rep = h_loc // kv_loc
    out = L.attention_scores(q, L.repeat_kv(k, n_rep), L.repeat_kv(v, n_rep), mask)
    out = out.reshape(B, S, h_loc * hd)
    partial_o = layer["wo"].local()(out)  # row-parallel partial
    return jax.lax.psum(partial_o, "tp")


def _tp_ffn(layer, x):
    h = jax.nn.silu(layer["w1"].local()(x)) * layer["w3"].local()(x)
    return jax.lax.psum(layer["w2"].local()(h), "tp")


def _tp_forward_local(params, tokens, cfg, T):
    """Runs inside shard_map; x replicated across tp, batch sharded dp.
    Returns vocab-sharded logits (B, S, V/T)."""
    B, S = tokens.shape
    x = params["tok_embed"][tokens]
    inv_freq = L.rope_frequencies(cfg)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    mask = jnp.triu(jnp.full((S, S), -1e9, jnp.float32), k=1)[None, None]
    for layer in params["layers"]:
        h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        x = x + _tp_attn(layer, h, cfg, inv_freq, positions, mask, T)
        h = L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        x = x + _tp_ffn(layer, h)
    x = L.rms_norm(x, params["norm"], cfg.rms_eps)
    return params["lm_head"].local()(x).astype(jnp.float32)


def _vocab_parallel_nll(logits_loc, targets, V_loc):
    """Cross-entropy over vocab-sharded logits without gathering.

    logits_loc: (B, S, V/T) — this device's vocab columns.
    """
    r = jax.lax.axis_index("tp")
    # stability shift only — stop_gradient BEFORE pmax (no pmax diff rule)
    m = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.max(logits_loc, axis=-1)), "tp"
    )  # (B, S)
    z = jax.lax.psum(
        jnp.sum(jnp.exp(logits_loc - m[..., None]), axis=-1), "tp"
    )
    logz = m + jnp.log(z)
    lo = r * V_loc
    owned = (targets >= lo) & (targets < lo + V_loc)
    idx = jnp.clip(targets - lo, 0, V_loc - 1)
    tgt_logit = jnp.take_along_axis(logits_loc, idx[..., None], axis=-1)[..., 0]
    tgt_logit = jax.lax.psum(jnp.where(owned, tgt_logit, 0.0), "tp")
    return logz - tgt_logit  # (B, S)


def _spec_tree(params, lin_spec, rep_spec):
    return jax.tree.map(
        lambda x: lin_spec if isinstance(x, TPLinear) else rep_spec,
        params,
        is_leaf=lambda x: isinstance(x, TPLinear),
    )


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_llama_forward(params_tp, tokens, cfg, mesh):
    """Full logits (B, S, V), batch sharded over dp, vocab gathered.

    jitted (cfg/mesh static): an EAGER shard_map dispatches every
    primitive as its own multi-device program — measured 137 s vs 1.3 s
    for one jitted grad step of the tiny test model on a CPU mesh."""
    T = mesh.shape["tp"]
    in_specs = (_spec_tree(params_tp, P("tp"), P()), P("dp"))

    fn = shard_map(
        partial(_tp_forward_local, cfg=cfg, T=T),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P("dp", None, "tp"),
        check_vma=False,
    )
    return fn(params_tp, tokens)


def _tp_decode_local(params, tokens, cache, cfg, T):
    """One decode step per device: heads and KV cache locally sharded,
    row-parallel psums as in _tp_forward_local. Returns (vocab-sharded
    logits, updated local cache)."""
    from sparsebit_tpu.llm.kv_cache import KVCache, cache_read, cache_update

    B = tokens.shape[0]
    S_max = cache.k[0].shape[1]
    positions = cache.length[:, None]
    valid = jnp.arange(S_max, dtype=jnp.int32)[None, :] <= positions
    mask = jnp.where(valid, 0.0, -1e9)[:, None, None, :]
    x = params["tok_embed"][tokens[:, None]]
    inv_freq = L.rope_frequencies(cfg)
    hd = cfg.head_dim
    h_loc = cfg.n_heads // T
    kv_loc = cfg.n_kv_heads // T

    new_k, new_v = list(cache.k), list(cache.v)
    new_ks, new_vs = list(cache.k_scale), list(cache.v_scale)
    for li, layer in enumerate(params["layers"]):
        h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = layer["wq"].local()(h).reshape(B, 1, h_loc, hd)
        k = layer["wk"].local()(h).reshape(B, 1, kv_loc, hd)
        v = layer["wv"].local()(h).reshape(B, 1, kv_loc, hd)
        q = L.apply_rope(q, positions, inv_freq)
        k = L.apply_rope(k, positions, inv_freq)
        tmp = KVCache(new_k, new_v, new_ks, new_vs, cache.length, cache.quantized)
        upd = cache_update(tmp, li, k, v, positions[:, 0])
        new_k[li], new_v[li] = upd[0], upd[1]
        if cache.quantized:
            new_ks[li], new_vs[li] = upd[2], upd[3]
        tmp = KVCache(new_k, new_v, new_ks, new_vs, cache.length, cache.quantized)
        k_all, v_all = cache_read(tmp, li, x.dtype)
        n_rep = h_loc // kv_loc
        out = L.attention_scores(
            q, L.repeat_kv(k_all, n_rep), L.repeat_kv(v_all, n_rep), mask
        ).reshape(B, 1, h_loc * hd)
        x = x + jax.lax.psum(layer["wo"].local()(out), "tp")
        h2 = L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        x = x + jax.lax.psum(
            layer["w2"].local()(
                jax.nn.silu(layer["w1"].local()(h2)) * layer["w3"].local()(h2)
            ),
            "tp",
        )
    x = L.rms_norm(x, params["norm"], cfg.rms_eps)
    logits = params["lm_head"].local()(x).astype(jnp.float32)[:, 0]
    new_cache = KVCache(
        new_k, new_v, new_ks, new_vs, cache.length + 1, cache.quantized
    )
    return logits, new_cache


def _cache_specs(cache):
    from sparsebit_tpu.llm.kv_cache import KVCache

    L_n = len(cache.k)
    kv = [P(None, None, "tp", None)] * L_n
    sc = [P(None, None, "tp")] * L_n if cache.quantized else []
    return KVCache(list(kv), list(kv), sc, list(sc), P(None), cache.quantized)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_decode_step(params_tp, tokens, cache, cfg, mesh):
    """Tensor-parallel decode step: packed weight shards + head-sharded
    INT8 KV cache (the north star's serving configuration). Batch is
    replicated across dp for simplicity (decode batches are small).
    jitted — see tp_llama_forward."""
    T = mesh.shape["tp"]
    cspec = _cache_specs(cache)
    in_specs = (_spec_tree(params_tp, P("tp"), P()), P(None), cspec)
    fn = shard_map(
        partial(_tp_decode_local, cfg=cfg, T=T),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(None, "tp"), cspec),
        check_vma=False,
    )
    return fn(params_tp, tokens, cache)


def shard_kv_cache_tp(cache, mesh):
    """Place a KVCache with heads sharded over tp."""
    from jax.sharding import NamedSharding

    cspec = _cache_specs(cache)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), cache, cspec
    )


def shard_llama_params_tp_packed(params, cfg, T, conv=None):
    """TP-shard an already-QUANTIZED LLaMA params pytree exactly
    (shard_quantlinear; DenseLinear leaves fall back to plain splits).
    The serving-engine entry: GPTQ codes survive sharding bit-identically.
    ``conv`` maps each QuantLinear shard (serving layout)."""
    assert cfg.n_heads % T == 0 and cfg.n_kv_heads % T == 0, (
        "n_heads {} / n_kv_heads {} must divide tp={}".format(
            cfg.n_heads, cfg.n_kv_heads, T)
    )

    def shard_any(lin, kind):
        if isinstance(lin, QuantLinear):
            return shard_quantlinear(lin, T, kind, conv=conv)
        return shard_linear(lin, T, kind)

    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        assert "wq" in layer, (
            "TP sharding needs UNFUSED layers (wq/wk/wv, w1/w3); got "
            "fused keys {}".format(sorted(layer)))
        new_layer = dict(layer)
        for name in _COL:
            new_layer[name] = shard_any(layer[name], "col")
        for name in _ROW:
            new_layer[name] = shard_any(layer[name], "row")
        out["layers"].append(new_layer)
    out["lm_head"] = shard_any(params["lm_head"], "col")
    return out


def _tp_prefill_local(params, tokens, cache, last_idx, offset, cfg, T):
    """Bucketed-admission prefill per device (decode.prefill_at semantics):
    heads and KV cache locally sharded, row-parallel psums; returns FULL
    logits at each row's last real token (vocab all_gathered — admission
    batches are small, the (B, V) gather is noise next to the forward)."""
    from sparsebit_tpu.llm.kv_cache import KVCache, cache_read, cache_update

    B, S = tokens.shape
    S_max = cache.k[0].shape[1]
    positions = offset[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    col = jnp.arange(S_max, dtype=jnp.int32)
    visible = col[None, None, :] <= positions[:, :, None]  # (B, S, S_max)
    mask = jnp.where(visible, 0.0, -1e9)[:, None]  # (B, 1, S, S_max)
    x = params["tok_embed"][tokens]
    inv_freq = L.rope_frequencies(cfg)
    hd = cfg.head_dim
    h_loc = cfg.n_heads // T
    kv_loc = cfg.n_kv_heads // T
    n_rep = h_loc // kv_loc

    new_k, new_v = list(cache.k), list(cache.v)
    new_ks, new_vs = list(cache.k_scale), list(cache.v_scale)
    for li, layer in enumerate(params["layers"]):
        h = L.rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = layer["wq"].local()(h).reshape(B, S, h_loc, hd)
        k = layer["wk"].local()(h).reshape(B, S, kv_loc, hd)
        v = layer["wv"].local()(h).reshape(B, S, kv_loc, hd)
        q = L.apply_rope(q, positions, inv_freq)
        k = L.apply_rope(k, positions, inv_freq)
        tmp = KVCache(new_k, new_v, new_ks, new_vs, cache.length,
                      cache.quantized)
        upd = cache_update(tmp, li, k, v, positions[:, 0])
        new_k[li], new_v[li] = upd[0], upd[1]
        if cache.quantized:
            new_ks[li], new_vs[li] = upd[2], upd[3]
        tmp = KVCache(new_k, new_v, new_ks, new_vs, cache.length,
                      cache.quantized)
        k_all, v_all = cache_read(tmp, li, x.dtype)
        out = L.attention_scores(
            q, L.repeat_kv(k_all, n_rep), L.repeat_kv(v_all, n_rep), mask
        ).reshape(B, S, h_loc * hd)
        x = x + jax.lax.psum(layer["wo"].local()(out), "tp")
        h2 = L.rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
        x = x + jax.lax.psum(
            layer["w2"].local()(
                jax.nn.silu(layer["w1"].local()(h2)) * layer["w3"].local()(h2)
            ),
            "tp",
        )
    x = L.rms_norm(x, params["norm"], cfg.rms_eps)
    x_last = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)[:, 0]
    logits_loc = params["lm_head"].local()(x_last).astype(jnp.float32)
    logits = jax.lax.all_gather(logits_loc, "tp", axis=1, tiled=True)
    new_cache = KVCache(
        new_k, new_v, new_ks, new_vs, offset + last_idx + 1, cache.quantized
    )
    return logits, new_cache


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_prefill_at(params_tp, tokens, cache, cfg, last_idx, offset, mesh):
    """Tensor-parallel decode.prefill_at: the serving engine's admission
    forward over a tp mesh (BASELINE.json configs[4] — tensor-sharded
    continuous batching). Returns (full logits (B, V), head-sharded
    cache)."""
    T = mesh.shape["tp"]
    cspec = _cache_specs(cache)
    fn = shard_map(
        partial(_tp_prefill_local, cfg=cfg, T=T),
        mesh=mesh,
        in_specs=(_spec_tree(params_tp, P("tp"), P()), P(None), cspec,
                  P(None), P(None)),
        out_specs=(P(None), cspec),
        check_vma=False,
    )
    return fn(params_tp, tokens, cache, last_idx, offset)


@partial(jax.jit, static_argnames=("cfg", "mesh", "n_tokens"))
def tp_decode_chunk(params_tp, tok0, cache, temps, key, cfg, mesh, n_tokens):
    """Tensor-parallel serving inner loop: n_tokens decode steps fully on
    device under ONE shard_map — packed weight shards + head-sharded INT8
    KV cache, per-step logits all_gathered for on-device per-slot
    temperature sampling (decode.decode_chunk semantics). The row-parallel
    psums are the only per-layer collectives; XLA's latency-hiding
    scheduler overlaps them with the next matmul's dequant work."""
    from sparsebit_tpu.llm.decode import sample_logits_vec

    T = mesh.shape["tp"]
    cspec = _cache_specs(cache)

    def local(params, tok0, cache, temps, key):
        def body(carry, k_):
            tok, cache = carry
            logits_loc, cache = _tp_decode_local(params, tok, cache, cfg, T)
            logits = jax.lax.all_gather(logits_loc, "tp", axis=1, tiled=True)
            tok = sample_logits_vec(logits, k_, temps)
            return (tok, cache), tok

        keys = jax.random.split(key, n_tokens)
        (tok, cache), toks = jax.lax.scan(body, (tok0, cache), keys)
        return jnp.swapaxes(toks, 0, 1), cache

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(_spec_tree(params_tp, P("tp"), P()), P(None), cspec,
                  P(None), P(None)),
        out_specs=(P(None), cspec),
        check_vma=False,
    )
    return fn(params_tp, tok0, cache, temps, key)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def tp_llama_loss(params_tp, tokens, cfg, mesh):
    """Mean next-token NLL with vocab-parallel softmax (never materialises
    full logits). jitted — see tp_llama_forward."""
    T = mesh.shape["tp"]
    V_loc = cfg.vocab_size // T
    in_specs = (_spec_tree(params_tp, P("tp"), P()), P("dp"))

    def local(params, toks):
        logits = _tp_forward_local(params, toks[:, :-1], cfg, T)
        nll = _vocab_parallel_nll(logits, toks[:, 1:], V_loc)
        # mean over the dp-sharded batch
        return jax.lax.pmean(jnp.mean(nll), "dp")[None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(None),
        check_vma=False,
    )
    return fn(params_tp, tokens)[0]
