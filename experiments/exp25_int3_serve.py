"""TRUE 3-bit vs nibble-container serving, 7B shapes (VERDICT r3 #3).

Measures B=1 scanned decode through the megakernel for a uniform int3-g128
LLaMA-7B-shaped model under both serving layouts:
  nibble — 4-bit signed row-pair container (free in-register unpack)
  planes — 3-bit [low2|high1] plane windows (in-kernel shift/mask unpack)

Reports device-timeline tok/s + streamed bytes/token for each. The plane
layout streams 25% fewer weight bytes; the unpack is VPU work the nibble
layout does not pay — this experiment decides the serving default.
"""
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import stack_layers
from sparsebit_tpu.llm.kv_cache import init_kv_cache
from sparsebit_tpu.llm.quant import QuantLinear
from sparsebit_tpu.ops.packing import pack_columns, pack_planes_serving, pack_s4_rows, unpack_columns

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 30
cfg = L.LlamaConfig(max_seq_len=512)
GS = 128
key = jax.random.PRNGKey(0)


def qlin3(key, K, N, serving):
    import numpy as np
    rng = np.random.default_rng(int(key[0]))
    from sparsebit_tpu.ops.packing import pallas_n_pad
    Np = N + pallas_n_pad(N, 3)
    codes = jnp.asarray(rng.integers(0, 8, (K, Np)), jnp.int32)
    G = K // GS
    scales = jnp.asarray(rng.uniform(0.001, 0.01, (G, Np)), jnp.float32
                         ).astype(jnp.bfloat16)
    zeros = jnp.full((G, Np), 4.0, jnp.bfloat16)
    if serving == "planes":
        packed = {"pl": pack_planes_serving(codes, 3)}
        return QuantLinear(packed, scales, zeros, 3, GS, N)
    # nibble: 3-bit codes in the signed 4-bit row-pair container
    packed = {"s4r": pack_s4_rows(codes)}
    return QuantLinear(packed, scales, zeros, 4, GS, N)


def build(serving):
    dt = cfg.jnp_dtype
    hd = cfg.head_dim
    keys = jax.random.split(key, cfg.n_layers + 2)
    layers = []
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 4)
        layers.append({
            "attn_norm": jnp.ones((cfg.dim,), dt),
            "ffn_norm": jnp.ones((cfg.dim,), dt),
            "wqkv": qlin3(ks[0], cfg.dim,
                          (cfg.n_heads + 2 * cfg.n_kv_heads) * hd, serving),
            "wo": qlin3(ks[1], cfg.n_heads * hd, cfg.dim, serving),
            "w13": qlin3(ks[2], cfg.dim, 2 * cfg.ffn_dim, serving),
            "w2": qlin3(ks[3], cfg.ffn_dim, cfg.dim, serving),
        })
    from sparsebit_tpu.llm.quant import DenseLinear

    emb = (jax.random.normal(keys[-2], (cfg.vocab_size, cfg.dim),
                             jnp.float32) * 0.02).astype(dt)
    return {"tok_embed": emb, "layers": layers, "norm": jnp.ones((cfg.dim,), dt),
            "lm_head": DenseLinear(emb.T)}


def packed_bytes(params):
    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total


def dev_seconds(trace_dir):
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    best = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("name", "").startswith(
                "jit_decode_tokens_scanned") and "dur" in e:
            best = max(best, e["dur"] * 1e-6)
    return best or None


def run(serving):
    from sparsebit_tpu.llm.decode import decode_tokens_scanned

    params = stack_layers(build(serving))
    wbytes = packed_bytes(params["layers"]) + packed_bytes(params["lm_head"])
    cache = init_kv_cache(cfg, 1, max_len=512, quantized=True)
    tok = jnp.zeros((1,), jnp.int32)
    toks, cache = decode_tokens_scanned(params, tok, cache, cfg, ITERS)
    jax.block_until_ready(toks)
    t0 = time.perf_counter()
    toks, cache = decode_tokens_scanned(params, toks[:, -1], cache, cfg, ITERS)
    jax.block_until_ready(toks)
    wall = ITERS / (time.perf_counter() - t0)
    rate = wall
    tdir = "/tmp/exp25_%s" % serving
    with jax.profiler.trace(tdir):
        toks, cache = decode_tokens_scanned(params, toks[:, -1], cache, cfg,
                                            ITERS)
        jax.block_until_ready(toks)
    ds = dev_seconds(tdir)
    if ds:
        rate = ITERS / ds
    print(json.dumps({
        "serving": serving,
        "tokens_per_s": round(rate, 2),
        "wall_tokens_per_s": round(wall, 2),
        "weight_bytes_per_tok_gb": round(wbytes / 1e9, 3),
        "sol_tokens_per_s": round(819e9 / wbytes, 1),
    }), flush=True)
    for leaf in jax.tree.leaves((params, cache, toks)):
        if hasattr(leaf, "delete"):
            try:
                leaf.delete()
            except Exception:
                pass


for serving in (sys.argv[1:] or ("nibble", "planes")):
    run(serving)
