"""B=8 decode with manual weight streaming enabled (SBT_FUSED_STREAM_B8)."""
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
from sparsebit_tpu.llm import decode as D
from sparsebit_tpu.llm.decode import stack_layers
from sparsebit_tpu.llm.kv_cache import init_kv_cache

B, ITERS = 8, 30
cfg = L.LlamaConfig(max_seq_len=512)
params = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))
decode_fn = jax.jit(
    D.decode_tokens_scanned.__wrapped__,
    static_argnames=("cfg", "n_tokens"), donate_argnums=(2,),
)
c = init_kv_cache(cfg, B, max_len=cfg.max_seq_len, quantized=True)
tk, c = decode_fn(params, jnp.zeros((B,), jnp.int32), c, cfg, ITERS)
jax.block_until_ready(tk)
t0 = time.perf_counter()
tk, c = decode_fn(params, tk[:, -1], c, cfg, ITERS)
jax.block_until_ready(tk)
wall = ITERS * B / (time.perf_counter() - t0)
rate = wall
with jax.profiler.trace("/tmp/exp28"):
    tk, c = decode_fn(params, tk[:, -1], c, cfg, ITERS)
    jax.block_until_ready(tk)
ds = _device_seconds("/tmp/exp28", "jit_decode_tokens_scanned")
if ds:
    rate = ITERS * B / ds
print(json.dumps({"B": B, "tokens_per_s": round(rate, 1),
                  "wall": round(wall, 1)}), flush=True)
