"""exp32: flat-KV megakernel perf triage (round 5).

First bench after the flat refactor regressed: B=1 195->178, B=8
1225->789, B=32 runtime error. This script isolates where the time went:
step times per B, with/without the out-of-kernel commit (commit ablated
by rerunning the kernel on a FRESH cache every step — no data dependence
on the committed result), plus the raw B=32 error.

Usage: python experiments/exp32_flat_perf.py [B ...]
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
from bench import build_quantized_llama  # noqa: E402

from sparsebit_tpu.llm import llama as L  # noqa: E402
from sparsebit_tpu.llm.decode import (  # noqa: E402
    decode_tokens_scanned, stack_layers)
from sparsebit_tpu.llm.kv_cache import init_kv_cache  # noqa: E402


def run(params, cfg, B, iters=20):
    # build the stacked serving cache DIRECTLY (list+stack doubles peak)
    Lx, S = cfg.n_layers, cfg.max_seq_len
    Hkv, hd = cfg.n_kv_heads, cfg.head_dim
    kvs = (jnp.zeros((Lx, B, S, Hkv, hd), jnp.int8),
           jnp.zeros((Lx, B, S, Hkv, hd), jnp.int8),
           jnp.zeros((Lx, B, Hkv, S), jnp.bfloat16),
           jnp.zeros((Lx, B, Hkv, S), jnp.bfloat16))
    ln = jnp.zeros((B,), jnp.int32)
    from sparsebit_tpu.llm.decode import decode_tokens_scanned_kvs
    decode_fn0 = jax.jit(
        decode_tokens_scanned_kvs.__wrapped__,
        static_argnames=("cfg", "n_tokens", "quantized", "s_active"),
        donate_argnums=(2,),
    )
    def decode_fn(params, tok, kvs_ln, cfg, iters, s_act):
        kvs, ln = kvs_ln
        tk, kvs, ln = decode_fn0(params, tok, kvs, ln, cfg, iters,
                                 "int8", s_act)
        return tk, (kvs, ln)
    import os
    s_act = (None if os.environ.get("EXP32_NO_BUCKET")
             else min(cfg.max_seq_len, -(-(3 * iters) // 128) * 128))
    tok = jnp.zeros((B,), jnp.int32)
    cache = (kvs, ln)
    toks, cache = decode_fn(params, tok, cache, cfg, iters, s_act)
    jax.block_until_ready(toks)
    t0 = time.perf_counter()
    toks, cache = decode_fn(params, toks[:, -1], cache, cfg, iters, s_act)
    jax.block_until_ready(toks)
    wall = time.perf_counter() - t0
    # device timeline
    dev = None
    try:
        tdir = "/tmp/exp32_trace_b%d" % B
        with jax.profiler.trace(tdir):
            toks, cache = decode_fn(params, toks[:, -1], cache, cfg, iters,
                                    s_act)
            jax.block_until_ready(toks)
        from bench import _device_seconds
        dev = _device_seconds(tdir, "jit_decode_tokens_scanned")
    except Exception as e:
        print("trace failed:", e)
    for leaf in jax.tree.leaves(cache) + [toks]:
        if hasattr(leaf, "delete"):
            try:
                leaf.delete()
            except Exception:
                pass
    return wall, dev


def main():
    cfg = L.LlamaConfig(max_seq_len=512)
    params = stack_layers(build_quantized_llama(cfg, bits=4, groupsize=128))
    bs = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    iters = 20
    for B in bs:
        try:
            wall, dev = run(params, cfg, B, iters)
            dev_ms = (dev / iters * 1e3) if dev else float("nan")
            print(
                "B=%-3d wall %.2f ms/step  device %.2f ms/step  "
                "(%.1f tok/s dev)" % (
                    B, wall / iters * 1e3, dev_ms,
                    iters * B / dev if dev else float("nan")))
        except Exception as e:
            print("B=%d FAILED: %s: %s" % (B, type(e).__name__,
                                           str(e)[:12000]))


if __name__ == "__main__":
    main()
