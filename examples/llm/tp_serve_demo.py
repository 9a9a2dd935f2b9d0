"""Tensor-parallel quantized decode demo (CPU-simulable).

Shards packed INT4 weights + the INT8 KV cache over a tp mesh axis and
runs decode steps under shard_map (the BASELINE.json serving layout).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python tp_serve_demo.py --tp 2
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import os

import jax


def main():
    # must precede any backend query (axon sitecustomize overrides the env)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sparsebit_tpu.llm import llama as L
    from sparsebit_tpu.llm.decode import prefill
    from sparsebit_tpu.llm.kv_cache import init_kv_cache
    from sparsebit_tpu.parallel.mesh import make_mesh
    from sparsebit_tpu.parallel.tp import (
        shard_kv_cache_tp,
        shard_llama_params_tp,
        tp_decode_step,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=8)
    ap.add_argument("--bits", type=int, default=4)
    args = ap.parse_args()

    cfg = L.llama_tiny(
        vocab_size=256, dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
        ffn_dim=256, max_seq_len=64, dtype="float32",
    )
    params = L.init_llama_params(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(dp=1, tp=args.tp)
    params_tp = shard_llama_params_tp(
        params, cfg, args.tp, bits=args.bits, groupsize=32
    )
    print("mesh:", dict(mesh.shape), "| per-shard packed INT{} weights".format(args.bits))

    prompt = jnp.ones((2, 5), jnp.int32)
    cache = init_kv_cache(cfg, 2, 32, quantized=True)
    logits, cache = prefill(params, prompt, cache, cfg)  # prefill fp for demo
    cache = shard_kv_cache_tp(cache, mesh)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    out = []
    for _ in range(args.tokens):
        logits, cache = tp_decode_step(params_tp, tok, cache, cfg, mesh)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        out.append(tok)
    print("decoded:", jnp.stack(out, 1).tolist())


if __name__ == "__main__":
    main()
