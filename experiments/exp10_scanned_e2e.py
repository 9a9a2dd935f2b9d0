"""End-to-end device time of decode_tokens_scanned (megakernel path), 7B.

Per-token device time from the profiler trace of the whole scanned decode
dispatch (includes lm_head, sampling glue, and inter-kernel gaps that the
per-call exp9 measurement misses).
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
    decode_tokens_scanned,
    prefill_scanned,
    stack_layers,
)
from sparsebit_tpu.llm.kv_cache import init_kv_cache

ITERS = 30
S_MAX = 512

cfg = L.LlamaConfig(max_seq_len=S_MAX)  # 7B
params = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))
cache = init_kv_cache(cfg, 1, S_MAX, quantized=True)
prompt = jnp.zeros((1, 16), jnp.int32)
logits, cache = prefill_scanned(params, prompt, cache, cfg)
tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

toks, cache = decode_tokens_scanned(params, tok, cache, cfg, ITERS)
jax.block_until_ready(toks)

import time
t0 = time.perf_counter()
toks, cache = decode_tokens_scanned(params, toks[:, -1], cache, cfg, ITERS)
jax.block_until_ready(toks)
wall = time.perf_counter() - t0

trace_dir = "/tmp/exp10"
with jax.profiler.trace(trace_dir):
    toks, cache = decode_tokens_scanned(params, toks[:, -1], cache, cfg, ITERS)
    jax.block_until_ready(toks)
paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
data = json.load(gzip.open(paths[-1]))
best = 0.0
for e in data.get("traceEvents", []):
    if e.get("ph") == "X" and "dur" in e and e.get("name", "").startswith(
        "jit_decode_tokens_scanned"
    ):
        best = max(best, e["dur"] * 1e-6)
per_tok = best / ITERS
print(f"wall: {wall / ITERS * 1e3:.2f} ms/tok ({ITERS / wall:.1f} tok/s)")
print(f"device: {per_tok * 1e3:.3f} ms/tok ({1.0 / per_tok:.1f} tok/s)")
