"""QLoRA finetune CLI (reference: alpaca-qlora/finetune.py).

    python qlora_finetune.py --ckpt gptq_ckpt --tokens data.npy \
        --r 8 --alpha 16 --steps 100

Backbone: a GPTQ checkpoint (frozen, packed); adapters: fp32 LoRA on
q/v projections. DP over the mesh comes free from jit + batch sharding.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsebit_tpu.llm.convert import load_quant_checkpoint
from sparsebit_tpu.llm.qlora import (
    extract_lora,
    inject_lora,
    qlora_train_step,
    wrap_llama_lora,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--tokens", default=None, help=".npy int32 (N, S) training windows")
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--alpha", type=float, default=16.0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--save", default="lora_adapters.npz")
    args = ap.parse_args()

    params, cfg, _ = load_quant_checkpoint(args.ckpt)
    lparams = wrap_llama_lora(params, r=args.r, alpha=args.alpha)
    lora = extract_lora(lparams)

    if args.tokens:
        data = np.load(args.tokens).astype(np.int32)
    else:
        print("[warn] no --tokens; random data (flow demo)")
        data = np.random.default_rng(0).integers(
            0, cfg.vocab_size, size=(64, min(128, cfg.max_seq_len))
        ).astype(np.int32)

    opt = optax.adamw(args.lr)
    state = opt.init(lora)
    step = jax.jit(
        lambda lora, state, batch: qlora_train_step(
            lora, state, lparams, batch, cfg, opt
        )
    )
    for s in range(args.steps):
        idx = np.random.default_rng(s).integers(0, len(data), size=(args.batch,))
        lora, state, loss = step(lora, state, jnp.asarray(data[idx]))
        if s % 10 == 0:
            print("step {} loss {:.4f}".format(s, float(loss)))

    flat = {
        "layers.{}.{}.{}".format(i, name, k): np.asarray(v)
        for (i, name), ab in lora.items()
        for k, v in ab.items()
    }
    np.savez(args.save, **flat)
    print("saved adapters to", args.save)


if __name__ == "__main__":
    main()
