"""7B scanned decode with weight-resident scalar-prefetch u4 kernels:
compile time + sustained tok/s from device trace."""
import sys, time, json
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
import jax, jax.numpy as jnp
from bench import build_quantized_llama, _device_seconds
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import (
    decode_tokens_scanned, prefill_scanned, stack_layers)
from sparsebit_tpu.llm.kv_cache import init_kv_cache

cfg = L.LlamaConfig(max_seq_len=512)  # 7B
params = build_quantized_llama(cfg, bits=4, groupsize=128)
stacked = stack_layers(params)
del params
cache = init_kv_cache(cfg, 1, max_len=cfg.max_seq_len, quantized=True)
prompt = jnp.zeros((1, 16), jnp.int32)
t0 = time.perf_counter()
logits, cache = prefill_scanned(stacked, prompt, cache, cfg)
jax.block_until_ready(logits)
print("prefill compile+run {:.1f}s".format(time.perf_counter() - t0), flush=True)
tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
ITERS = 30
t0 = time.perf_counter()
toks, cache = decode_tokens_scanned(stacked, tok, cache, cfg, ITERS)
jax.block_until_ready(toks)
print("decode compile+run {:.1f}s".format(time.perf_counter() - t0), flush=True)
t0 = time.perf_counter()
toks, cache = decode_tokens_scanned(stacked, toks[:, -1], cache, cfg, ITERS)
jax.block_until_ready(toks)
wall = time.perf_counter() - t0
print("wall {:.2f}s -> {:.1f} tok/s".format(wall, ITERS / wall), flush=True)
with jax.profiler.trace("/tmp/exp5_trace"):
    toks, cache = decode_tokens_scanned(stacked, toks[:, -1], cache, cfg, ITERS)
    jax.block_until_ready(toks)
dev = _device_seconds("/tmp/exp5_trace", "jit_decode_tokens_scanned")
if dev:
    print("device {:.3f}s -> {:.1f} tok/s".format(dev, ITERS / dev), flush=True)
