"""B=64 decode through the megakernel (8 int8 attention group steps).

The round-3 B=64 attempt crashed the Mosaic compile subprocess; the
round-4 kernel is much smaller (int8 attention, no per-row unrolled
glue), so re-probe. Needs a shrunken tile budget + raised VMEM cap:
8-row slabs (36 MB) + qbd8 (8.4 MB) + B=64 activations exceed the
default layout. Usage: SBT_FUSED_BUDGET=6600000 SBT_FUSED_VMEM=115343360
python exp27_b64.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_quantized_llama, _device_seconds
from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import decode_tokens_scanned, stack_layers
from sparsebit_tpu.llm.kv_cache import init_kv_cache

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = 30
cfg = L.LlamaConfig(max_seq_len=512)
params = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))

import functools
from sparsebit_tpu.llm import decode as D

decode_fn = jax.jit(
    D.decode_tokens_scanned.__wrapped__,
    static_argnames=("cfg", "n_tokens"), donate_argnums=(2,),
)
c = init_kv_cache(cfg, B, max_len=cfg.max_seq_len, quantized=True)
t = jnp.zeros((B,), jnp.int32)
tk, c = decode_fn(params, t, c, cfg, ITERS)
jax.block_until_ready(tk)
t0 = time.perf_counter()
tk, c = decode_fn(params, tk[:, -1], c, cfg, ITERS)
jax.block_until_ready(tk)
wall = ITERS * B / (time.perf_counter() - t0)
rate = wall
try:
    with jax.profiler.trace("/tmp/exp27_b%d" % B):
        tk, c = decode_fn(params, tk[:, -1], c, cfg, ITERS)
        jax.block_until_ready(tk)
    ds = _device_seconds("/tmp/exp27_b%d" % B, "jit_decode_tokens_scanned")
    if ds:
        rate = ITERS * B / ds
except Exception:
    pass
print(json.dumps({"B": B, "tokens_per_s": round(rate, 1),
                  "wall": round(wall, 1)}), flush=True)
