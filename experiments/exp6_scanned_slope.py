"""Scanned u4 decode + fused attention kernel: per-token device time via
wall-clock slope across two scan lengths (one jit dispatch each; the
tunnel overhead cancels in the difference)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bench import build_quantized_llama
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import (
    decode_tokens_scanned, prefill_scanned, stack_layers)
from sparsebit_tpu.llm.kv_cache import init_kv_cache

cfg = L.LlamaConfig(max_seq_len=512)  # 7B
params = build_quantized_llama(cfg, bits=4, groupsize=128)
stacked = stack_layers(params)
del params
cache0 = init_kv_cache(cfg, 1, max_len=cfg.max_seq_len, quantized=True)
prompt = jnp.zeros((1, 16), jnp.int32)
logits, cache0 = prefill_scanned(stacked, prompt, cache0, cfg)
tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

def run(n, reps=3):
    t0 = time.perf_counter()
    toks, _ = decode_tokens_scanned(stacked, tok, cache0, cfg, n)
    jax.block_until_ready(toks)
    print("  n={} compile+run {:.1f}s".format(n, time.perf_counter()-t0), flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        toks, _ = decode_tokens_scanned(stacked, tok, cache0, cfg, n)
        jax.block_until_ready(toks)
        best = min(best, time.perf_counter() - t0)
    print("  n={} best wall {:.3f}s".format(n, best), flush=True)
    return best

w1 = run(25)
w2 = run(100)
per_tok = (w2 - w1) / 75
print("slope per-token {:.3f} ms -> {:.1f} tok/s".format(
    per_tok * 1e3, 1.0 / per_tok), flush=True)
