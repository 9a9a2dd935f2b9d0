"""One-command real-checkpoint accuracy pipeline (reference:
llama/quantization/convert.py:176-259 llama_eval flow + README table).

    # fp16 vs GPTQ-INT4 perplexity on a real LLaMA + token file:
    python eval_checkpoint.py --hf-path /path/to/llama \
        --tokens wikitext2_test.npy --calib-tokens wikitext2_calib.npy \
        --bits 4 --groupsize 128 --save ckpt_int4 --out results.json

    # re-evaluate an existing GPTQ checkpoint (no fp pass):
    python eval_checkpoint.py --ckpt ckpt_int4 --tokens wikitext2_test.npy

    # CI / smoke mode (no HF weights): random tiny model + synthetic stream
    python eval_checkpoint.py --demo --out results.json

Token files are 1-D int32 .npy streams (the reference tokenizes
wikitext-2 test with the model's tokenizer; this environment has no
dataset egress, so tokenization happens wherever the data lives and the
stream is handed over as .npy). --calib-tokens may be the same stream —
it is reshaped to (n_samples, seqlen) windows for GPTQ.

The eval forward is 7B-on-one-chip safe: flash-attention backbone +
sequence-chunked lm_head/log-softmax (sparsebit_tpu/llm/eval.py
_window_nll_chunked) — no (S, S) score or (S, V) logits materialisation.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..")))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.eval import perplexity


def _load_stream(path, n_tokens=None):
    toks = np.load(path).reshape(-1).astype(np.int32)
    if n_tokens:
        toks = toks[:n_tokens]
    return toks


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--hf-path", default=None,
                    help="local HF LLaMA dir (fp baseline + GPTQ source)")
    ap.add_argument("--ckpt", default=None,
                    help="existing GPTQ checkpoint dir (save_quant_checkpoint)")
    ap.add_argument("--tokens", default=None,
                    help="1-D int32 .npy eval token stream")
    ap.add_argument("--calib-tokens", default=None,
                    help="1-D or (n, seqlen) int32 .npy for GPTQ calibration")
    ap.add_argument("--bits", type=int, nargs="+", default=None,
                    help="GPTQ candidate bits (e.g. --bits 2 3 4 for the "
                         "mixed-precision allocator); omit to skip convert")
    ap.add_argument("--groupsize", type=int, default=128)
    ap.add_argument("--sym", action="store_true")
    ap.add_argument("--act-order", action="store_true")
    ap.add_argument("--n-calib", type=int, default=16)
    ap.add_argument("--seqlen", type=int, default=2048)
    ap.add_argument("--max-tokens", type=int, default=None,
                    help="truncate the eval stream (quick runs)")
    ap.add_argument("--save", default=None,
                    help="save the GPTQ checkpoint here after converting")
    ap.add_argument("--out", default=None, help="write the result JSON here")
    ap.add_argument("--skip-fp", action="store_true",
                    help="skip the fp baseline perplexity pass")
    ap.add_argument("--demo", action="store_true",
                    help="random tiny model + synthetic stream (CI smoke)")
    args = ap.parse_args(argv)

    result = {"seqlen": args.seqlen, "groupsize": args.groupsize}

    # ---- model + data sources ----------------------------------------------
    fp_params = cfg = None
    if args.demo:
        cfg = L.llama_tiny()
        fp_params = jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a,
            L.init_llama_params(cfg, jax.random.PRNGKey(0)),
        )
        args.seqlen = min(args.seqlen, 32)
        result["seqlen"] = args.seqlen
        rng = np.random.RandomState(0)
        toks = rng.randint(1, cfg.vocab_size, size=4 * args.seqlen)
        toks = toks.astype(np.int32)
        calib = toks[: 2 * args.seqlen]
        if args.bits is None:
            args.bits = [4]
        args.groupsize = min(args.groupsize, 32)
        result["groupsize"] = args.groupsize
        result["demo"] = True
    else:
        assert args.tokens, "--tokens required (or --demo)"
        toks = _load_stream(args.tokens, args.max_tokens)
        calib = (_load_stream(args.calib_tokens)
                 if args.calib_tokens else None)
        if args.hf_path:
            from sparsebit_tpu.llm.import_hf import load_llama_from_hf

            fp_params, cfg = load_llama_from_hf(args.hf_path)

    # ---- fp baseline ---------------------------------------------------------
    if fp_params is not None and not args.skip_fp:
        ppl = perplexity(fp_params, toks, cfg, seqlen=args.seqlen,
                         verbose=True)
        result["fp_ppl"] = round(ppl, 4)
        print("fp ppl = {:.4f}".format(ppl))

    # ---- quantized model -----------------------------------------------------
    qparams = layers_bit = None
    if args.ckpt:
        from sparsebit_tpu.llm.convert import load_quant_checkpoint

        qparams, cfg, layers_bit = load_quant_checkpoint(args.ckpt)
        result["checkpoint"] = args.ckpt
    elif args.bits:
        assert fp_params is not None, "--bits needs --hf-path (or --demo)"
        assert calib is not None or args.demo, "--bits needs --calib-tokens"
        from sparsebit_tpu.llm.convert import (
            quantize_llama_gptq,
            save_quant_checkpoint,
        )

        n_win = min(args.n_calib, len(calib) // args.seqlen)
        assert n_win > 0, "calib stream shorter than one seqlen window"
        calib_w = calib[: n_win * args.seqlen].reshape(n_win, args.seqlen)
        fused = L.fuse_llama_params(fp_params)
        qparams, layers_bit = quantize_llama_gptq(
            fused, jnp.asarray(calib_w), cfg,
            candidate_bits=tuple(args.bits), groupsize=args.groupsize,
            sym=args.sym, act_order=args.act_order, verbose=not args.demo,
        )
        if args.save:
            save_quant_checkpoint(args.save, qparams, layers_bit, cfg,
                                  args.groupsize)
            result["checkpoint"] = args.save

    if qparams is not None:
        ppl = perplexity(qparams, toks, cfg, seqlen=args.seqlen,
                         verbose=True)
        result["quant_ppl"] = round(ppl, 4)
        if layers_bit:
            result["layers_bit"] = {str(k): int(v)
                                    for k, v in layers_bit.items()}
            result["mean_bits"] = round(
                float(np.mean(list(layers_bit.values()))), 3)
        print("quant ppl = {:.4f}".format(ppl))

    if "fp_ppl" in result and "quant_ppl" in result:
        result["ppl_delta"] = round(result["quant_ppl"] - result["fp_ppl"], 4)

    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return result


if __name__ == "__main__":
    main()
