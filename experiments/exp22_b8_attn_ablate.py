"""Ablate the batched attention phase's subsections at B=8 (7B megakernel):
_ablate="" (full) vs "patch" (no slab patches) vs "attn" (no group
attention) vs "ropeq" (whole batched step skipped). Differences isolate
where the ~60 us/layer phase-2 cost lives (exp20). TIMING ONLY — outputs
are garbage under any ablation."""
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
cfg = L.LlamaConfig(max_seq_len=S_MAX)
stacked = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))
Lx = cfg.n_layers
B = 8
Hkv, D, Hp = cfg.n_kv_heads, cfg.head_dim, 128
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


def run(ablate):
    @jax.jit
    def f(x, k8, v8, ks, vs, *wargs):
        def tok(carry, _):
            x, k8, v8, ks, vs = carry
            out, k8, v8, ks, vs = _fused_call(
                x, pos, cosf, sinf, jnp.int32(0), *wargs,
                k8, v8, ks, vs, cfg, gsz,
                n_grid_layers=Lx, signed=True, _ablate=ablate,
            )
            return (out, k8, v8, ks, vs), None
        carry, _ = jax.lax.scan(tok, (x, k8, v8, ks, vs), None, length=ITERS)
        return carry[0]

    out = f(x, k8, v8, ks, vs, *args)
    jax.block_until_ready(out)
    trace_dir = "/tmp/exp22_" + (ablate or "full")
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
    print("%-8s %7.2f us/layer (%d calls)" % (ablate or "full", per, cnt),
          flush=True)
    return per


full = run("")
no_attn = run("attn")
no_patch = run("patch")
none = run("ropeq")
print("attention loop: %.2f us/layer" % (full - no_attn))
print("slab patches:   %.2f us/layer" % (full - no_patch))
print("whole step:     %.2f us/layer" % (full - none))
