"""Scanned u4 decode + fused attention kernel: per-token DEVICE time via
jax.profiler trace (wall clock lies on this tunnel — async acks return
before the device finishes; see docs/perf_notes.md measurement rules)."""
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_quantized_llama
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import (
    decode_tokens_scanned, prefill_scanned, stack_layers)
from sparsebit_tpu.llm.kv_cache import init_kv_cache

N_TOK = 50

cfg = L.LlamaConfig(max_seq_len=512)  # 7B
params = build_quantized_llama(cfg, bits=4, groupsize=128)
stacked = stack_layers(params)
del params
cache0 = init_kv_cache(cfg, 1, max_len=cfg.max_seq_len, quantized=True)
prompt = jnp.zeros((1, 16), jnp.int32)
logits, cache0 = prefill_scanned(stacked, prompt, cache0, cfg)
tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

t0 = time.perf_counter()
toks, _ = decode_tokens_scanned(stacked, tok, cache0, cfg, N_TOK)
jax.block_until_ready(toks)
print("compile+run {:.1f}s".format(time.perf_counter() - t0), flush=True)

trace_dir = "/tmp/exp7_trace"
with jax.profiler.trace(trace_dir):
    toks, _ = decode_tokens_scanned(stacked, tok, cache0, cfg, N_TOK)
    jax.block_until_ready(toks)

paths = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))
with gzip.open(paths[-1]) as f:
    data = json.load(f)
best = 0.0
for e in data.get("traceEvents", []):
    if e.get("ph") == "X" and "dur" in e and e.get("name", "").startswith("jit_"):
        if e["dur"] * 1e-6 > best:
            best = e["dur"] * 1e-6
            name = e["name"]
print("top device event: {} {:.1f} ms".format(name, best * 1e3))
print("per-token {:.3f} ms -> {:.1f} tok/s".format(
    best * 1e3 / N_TOK, N_TOK / best), flush=True)
