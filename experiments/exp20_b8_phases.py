"""Per-phase device time INSIDE the whole-backbone megakernel (7B).

Same grid-truncation trick as exp9 (_n_phases) but through _fused_call
with n_grid_layers = 32, so layer-boundary effects (weight prefetch across
layers, xcur carry) are included. Successive differences = phase cost.
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
from sparsebit_tpu.llm.decode import stack_layers, _u4_serving
from sparsebit_tpu.ops.layer_fused import _fused_call

ITERS = 30
S_MAX = 512

cfg = L.LlamaConfig(max_seq_len=S_MAX)  # 7B
stacked = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))
Lx = cfg.n_layers
B = 8
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
layers = stacked["layers"]
args = (_u4_serving(layers["wqkv"]), layers["wqkv"].scales,
        layers["wqkv"].zeros,
        _u4_serving(layers["wo"]), layers["wo"].scales, layers["wo"].zeros,
        _u4_serving(layers["w13"]), layers["w13"].scales,
        layers["w13"].zeros,
        _u4_serving(layers["w2"]), layers["w2"].scales, layers["w2"].zeros,
        layers["attn_norm"], layers["ffn_norm"])


def run(n_phases):
    @jax.jit
    def f(x, k8, v8, ks, vs, *wargs):
        def tok(carry, _):
            x, k8, v8, ks, vs = carry
            out, k8, v8, ks, vs = _fused_call(
                x, pos, cosf, sinf, jnp.int32(0), *wargs,
                k8, v8, ks, vs, cfg, gsz, _n_phases=n_phases,
                n_grid_layers=Lx, signed=True,  # bench emits s4r now
            )
            return (out, k8, v8, ks, vs), None
        carry, _ = jax.lax.scan(tok, (x, k8, v8, ks, vs), None, length=ITERS)
        return carry[0]

    out = f(x, k8, v8, ks, vs, *args)
    jax.block_until_ready(out)
    trace_dir = f"/tmp/exp11_{n_phases}"
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(f(x, k8, v8, ks, vs, *args))
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    tot, cnt = 0.0, 0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and "closed_call" in e.get("name", ""):
            tot += e["dur"]
            cnt += 1
    per = tot / max(cnt, 1) / Lx
    print(f"phases<= {n_phases}: {per:7.2f} us/layer ({cnt} calls)", flush=True)
    return per


prev = 0.0
for n in (1, 2, 3, 4, 5):
    per = run(n)
    print(f"  phase {n} marginal: {per - prev:7.2f} us/layer", flush=True)
    prev = per
