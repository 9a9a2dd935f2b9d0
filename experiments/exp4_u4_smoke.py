"""u4 serving path smoke: 2-layer 7B-dims model through decode_tokens on
device; checks lowering + per-kernel times of the u4 kernels."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax, jax.numpy as jnp
from triage import kernel_events
from bench import build_quantized_llama
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import decode_tokens, prefill
from sparsebit_tpu.llm.kv_cache import init_kv_cache

cfg = L.LlamaConfig(n_layers=2, max_seq_len=512)
params = build_quantized_llama(cfg, bits=4, groupsize=128)
cache = init_kv_cache(cfg, 1, max_len=cfg.max_seq_len, quantized=True)
prompt = jnp.zeros((1, 16), jnp.int32)
logits, cache = prefill(params, prompt, cache, cfg)
tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
t0 = time.perf_counter()
toks, cache = decode_tokens(params, tok, cache, cfg, 30)
jax.block_until_ready(toks)
print("compile+run {:.1f}s".format(time.perf_counter() - t0), flush=True)
with jax.profiler.trace("/tmp/exp4_u4smoke"):
    toks, cache = decode_tokens(params, toks[:, -1], cache, cfg, 30)
    jax.block_until_ready(toks)
evs = kernel_events("/tmp/exp4_u4smoke", min_us=3.0)
for name, durs in sorted(evs.items()):
    if len(durs) >= 10:
        print("  {:44s} n={:4d} mean {:7.1f} us".format(
            name[:44], len(durs), sum(durs) / len(durs)), flush=True)
