"""Isolate B-scaling cost: whole-backbone megakernel launch alone vs the
full decode step (megakernel + embedding + lm_head + argmax) at B=1/4/8.
"""
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_quantized_llama
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import stack_layers
from sparsebit_tpu.ops.layer_fused import fused_decoder_layers
from sparsebit_tpu.llm.quant import QuantLinear

ITERS = 30
S_MAX = 512
cfg = L.LlamaConfig(max_seq_len=S_MAX)
stacked = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))
Lx = cfg.n_layers
Hkv, D, Hp = cfg.n_kv_heads, cfg.head_dim, 128
gsz = 128
layers = stacked["layers"]


def s4r(lin):
    return lin.packed["s4r"]


args = (s4r(layers["wqkv"]), layers["wqkv"].scales, layers["wqkv"].zeros,
        s4r(layers["wo"]), layers["wo"].scales, layers["wo"].zeros,
        s4r(layers["w13"]), layers["w13"].scales, layers["w13"].zeros,
        s4r(layers["w2"]), layers["w2"].scales, layers["w2"].zeros,
        layers["attn_norm"], layers["ffn_norm"])


def dev_us(trace_dir):
    paths = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    best = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and e.get("name", "").startswith(
                "jit_f"):
            best = max(best, e["dur"])
    return best


for B in (8,):
    k8 = jnp.zeros((Lx, B, S_MAX, Hkv, D), jnp.int8)
    v8 = jnp.zeros((Lx, B, S_MAX, Hkv, D), jnp.int8)
    ks = jnp.zeros((Lx, B, S_MAX, Hp), jnp.float32)
    vs = jnp.zeros((Lx, B, S_MAX, Hp), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, cfg.dim), jnp.float32)
    pos = jnp.full((B,), 17, jnp.int32)
    angles = pos[:, None].astype(jnp.float32) * L.rope_frequencies(cfg)
    cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
    sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)

    @jax.jit
    def f(x, k8, v8, ks, vs):
        def tok(carry, _):
            x, k8, v8, ks, vs = carry
            out, k8, v8, ks, vs = fused_decoder_layers(
                x, pos, cosf, sinf, *args, k8, v8, ks, vs, cfg, gsz,
                signed=True)
            return (out, k8, v8, ks, vs), None
        carry, _ = jax.lax.scan(tok, (x, k8, v8, ks, vs), None, length=ITERS)
        return carry[0]

    out = f(x, k8, v8, ks, vs)
    jax.block_until_ready(out)
    td = f"/tmp/exp21_{B}"
    with jax.profiler.trace(td):
        jax.block_until_ready(f(x, k8, v8, ks, vs))
    us = dev_us(td) / ITERS
    print(json.dumps({"B": B, "megakernel_us_per_tok": round(us, 1),
                      "us_per_layer": round(us / Lx, 2)}))
