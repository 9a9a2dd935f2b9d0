"""Quantized decode CLI (reference: llama/quantization/inference.py:78).

    python gptq_inference.py --ckpt gptq_ckpt --tokens 128
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import time

import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.llm.convert import load_quant_checkpoint
from sparsebit_tpu.llm.decode import generate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--prompt-ids", default=None, help=".npy int32 (B, S)")
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--fp-kv", action="store_true", help="disable INT8 KV cache")
    args = ap.parse_args()

    params, cfg, layers_bit = load_quant_checkpoint(args.ckpt)
    bits = sorted(set(layers_bit.values()))
    print("loaded: {} layers, bits {}".format(cfg.n_layers, bits))

    if args.prompt_ids:
        prompt = jnp.asarray(np.load(args.prompt_ids).astype(np.int32))
    else:
        prompt = jnp.ones((1, 8), jnp.int32)

    t0 = time.perf_counter()
    out = generate(
        params, prompt, cfg,
        max_new_tokens=args.tokens,
        temperature=args.temperature,
        top_k=args.top_k,
        top_p=args.top_p,
        kv_quantized=not args.fp_kv,
    )
    dt = time.perf_counter() - t0
    print("generated {} tokens in {:.2f}s ({:.2f} tok/s, incl. compile)".format(
        out.size, dt, out.size / dt))
    print(np.asarray(out))


if __name__ == "__main__":
    main()
