"""B=32 FLAT-megakernel step anatomy (round 5): exp23 rerun on the
flat serving layout (int8 (S, Hkv*D) slabs + transposed bf16 scales).

Ablations (timing only, outputs garbage):
  ""      full step
  "attn"  slab loads + patches run, group attention compute skipped
  "ropeq" whole batched phase-2 skipped (matmul phases only)

Run at two context depths (pos 17: 1 chunk/row slab loads; pos 400:
4 chunks/row) to split DMA from compute in the group steps.
"""
import functools
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
B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
POS = int(sys.argv[2]) if len(sys.argv) > 2 else 17
Hkv, D, Hp = cfg.n_kv_heads, cfg.head_dim, 128
def fresh_caches():
    return (jnp.zeros((Lx, B, S_MAX, Hkv, D), jnp.int8),
            jnp.zeros((Lx, B, S_MAX, Hkv, D), jnp.int8),
            jnp.zeros((Lx, B, Hkv, S_MAX), jnp.bfloat16),
            jnp.zeros((Lx, B, Hkv, S_MAX), jnp.bfloat16))


x = jax.random.normal(jax.random.PRNGKey(0), (B, cfg.dim), jnp.float32)
pos = jnp.full((B,), POS, jnp.int32)
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
    # donate the caches: at B=32/7B k+v are 4.3 GB each — in+out copies
    # would oversubscribe the 16 GB chip
    @functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
    def f(x, k8, v8, ks, vs, *wargs):
        def tok(carry, _):
            x, k8, v8, ks, vs = carry
            out, k8, v8, ks, vs = _fused_call(
                x, pos, cosf, sinf, jnp.int32(0), *wargs,
                k8, v8, ks, vs, cfg, gsz,
                n_grid_layers=Lx, signed=True, s_active=128,
                _ablate=ablate,
            )
            return (out, k8, v8, ks, vs), None
        carry, _ = jax.lax.scan(tok, (x, k8, v8, ks, vs), None, length=ITERS)
        return carry[0]

    # donated buffers are consumed per call: re-allocate before EVERY f(...)
    k8, v8, ks, vs = fresh_caches()
    out = f(x, k8, v8, ks, vs, *args)
    jax.block_until_ready(out)
    trace_dir = "/tmp/exp33_%d_%d_%s" % (B, POS, ablate or "full")
    k8, v8, ks, vs = fresh_caches()
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(f(x, k8, v8, ks, vs, *args))
    paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
    data = json.load(gzip.open(paths[-1]))
    tot, cnt = 0.0, 0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and "closed_call" in e.get("name", ""):
            tot += e["dur"]
            cnt += 1
    step_ms = tot / max(cnt, 1) / 1e3
    print("B=%d pos=%d %-8s %7.3f ms/step (%7.2f us/layer, %d calls)"
          % (B, POS, ablate or "full", step_ms, tot / max(cnt, 1) / Lx, cnt),
          flush=True)
    return step_ms


full = run("")
no_attn = run("attn")
mm_only = run("ropeq")
print(json.dumps({
    "B": B, "pos": POS,
    "full_ms": round(full, 3),
    "loads_patch_ms": round(no_attn - mm_only, 3),
    "attn_compute_ms": round(full - no_attn, 3),
    "matmul_phases_ms": round(mm_only, 3),
}))
