"""Batched decode throughput: aggregate tok/s at B in {1, 4, 8}.

Decode is weight-DMA bound at B=1, so the same weight stream should
serve every batch row nearly for free until attention/KV IO and the
per-row phases catch up. Megakernel supports B <= 8 (one VMEM activation
row per batch row, batch-padded to 8 sublanes).
"""
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bench import build_quantized_llama, _device_seconds
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import (
    decode_tokens_scanned, prefill_scanned, stack_layers)
from sparsebit_tpu.llm.kv_cache import init_kv_cache

ITERS = 30
cfg = L.LlamaConfig(max_seq_len=512)  # 7B
params = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))

for B in (1, 4, 8):
    cache = init_kv_cache(cfg, B, max_len=cfg.max_seq_len, quantized=True)
    prompt = jnp.zeros((B, 16), jnp.int32)
    logits, cache = prefill_scanned(params, prompt, cache, cfg)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks, cache = decode_tokens_scanned(params, tok, cache, cfg, ITERS)
    jax.block_until_ready(toks)

    trace_dir = "/tmp/bench_trace_b%d" % B
    with jax.profiler.trace(trace_dir):
        toks, cache = decode_tokens_scanned(
            params, toks[:, -1], cache, cfg, ITERS)
        jax.block_until_ready(toks)
    dev_s = _device_seconds(trace_dir, "jit_decode_tokens_scanned")
    agg = ITERS * B / dev_s if dev_s else float("nan")
    print(json.dumps({
        "B": B,
        "aggregate_tokens_per_s": round(agg, 1),
        "ms_per_step": round(dev_s / ITERS * 1e3, 3) if dev_s else None,
        "per_stream": round(agg / B, 1),
    }))
