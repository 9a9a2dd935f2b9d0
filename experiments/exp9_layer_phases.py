"""Per-phase device time of the whole-layer decode megakernel (7B shapes).

The kernel walks one 1-D grid through five pl.when-gated phases
(Wqkv / attention / Wo / W13 / W2). `_n_phases=k` truncates the grid
after phase k, so successive differences isolate each phase's cost.
Device time via profiler trace (wall clock lies on this tunnel).
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
from sparsebit_tpu.llm.decode import (
    stack_layers, prepare_stacked_params_for_decode, _u4_serving)
from sparsebit_tpu.ops.layer_fused import fused_decoder_layer

ITERS = 30
S_MAX = 512

cfg = L.LlamaConfig(max_seq_len=S_MAX)  # 7B
params = build_quantized_llama(cfg, bits=4, groupsize=128)
stacked = stack_layers(params)
del params
Lx = cfg.n_layers
B = 1
Hkv, D = cfg.n_kv_heads, cfg.head_dim
Hp = 128
k8 = jnp.zeros((Lx, B, S_MAX, Hkv, D), jnp.int8)
v8 = jnp.zeros((Lx, B, S_MAX, Hkv, D), jnp.int8)
ks = jnp.zeros((Lx, B, S_MAX, Hp), jnp.float32)
vs = jnp.zeros((Lx, B, S_MAX, Hp), jnp.float32)
x = jax.random.normal(jax.random.PRNGKey(0), (B, cfg.dim), jnp.float32)
pos = jnp.full((B,), 17, jnp.int32)
angles = pos[:, None].astype(jnp.float32) * L.rope_frequencies(cfg)
cosf = jnp.concatenate([jnp.cos(angles)] * 2, axis=1)
sinf = jnp.concatenate([jnp.sin(angles)] * 2, axis=1)
gsz = 128


def run(n_phases):
    # stacked must be an ARGUMENT: closed over, the weights become jit
    # constants and XLA constant-folds the u4 conversion on the host
    # (3.2 GB single-threaded = tens of minutes)
    @jax.jit
    def f(stacked, x, k8, v8, ks, vs):
        layers = prepare_stacked_params_for_decode(stacked)["layers"]

        def body(carry, li):
            x, k8, v8, ks, vs = carry
            out, k8, v8, ks, vs = fused_decoder_layer(
                x, pos, cosf, sinf, li,
                _u4_serving(layers["wqkv"]), layers["wqkv"].scales,
                layers["wqkv"].zeros,
                _u4_serving(layers["wo"]), layers["wo"].scales,
                layers["wo"].zeros,
                _u4_serving(layers["w13"]), layers["w13"].scales,
                layers["w13"].zeros,
                _u4_serving(layers["w2"]), layers["w2"].scales,
                layers["w2"].zeros,
                layers["attn_norm"], layers["ffn_norm"],
                k8, v8, ks, vs, cfg, gsz, _n_phases=n_phases,
            )
            return (out, k8, v8, ks, vs), None

        def tok(carry, _):
            carry, _ = jax.lax.scan(
                body, carry, jnp.arange(Lx, dtype=jnp.int32))
            return carry, None

        (x, k8, v8, ks, vs), _ = jax.lax.scan(
            tok, (x, k8, v8, ks, vs), None, length=ITERS)
        return x

    out = f(stacked, x, k8, v8, ks, vs)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/exp9_{n_phases}"
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(f(stacked, x, k8, v8, ks, vs))
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    tot, cnt = 0.0, 0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and "closed_call" in e.get("name", ""):
            tot += e["dur"]
            cnt += 1
    per = tot / max(cnt, 1)
    print(f"phases<= {n_phases}: {per:7.1f} us/call ({cnt} calls)", flush=True)
    return per


prev = 0.0
for n in (1, 2, 3, 4, 5):
    per = run(n)
    print(f"  phase {n} marginal: {per - prev:7.1f} us", flush=True)
    prev = per
