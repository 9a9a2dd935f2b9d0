"""PTQ GPT-2 on a token stream, perplexity eval (reference:
examples/post_training_quantization/wikitext/main.py).

    python main.py --tokens wikitext_tokens.npy [--ckpt gpt2.npz]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.models import create_model


def ppl(model_fn, toks, seqlen, batch=1):
    n_win = len(toks) // seqlen
    total, count = 0.0, 0
    for i in range(n_win):
        win = jnp.asarray(toks[i * seqlen : (i + 1) * seqlen][None], jnp.int32)
        logits = model_fn(win)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits[:, :-1], axis=-1), win[:, 1:, None], axis=-1
        )
        total += float(-jnp.sum(logp))
        count += win.shape[1] - 1
    return float(np.exp(total / count))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt2_small")
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig.yaml"))
    ap.add_argument("--tokens", default=None, help=".npy int32 token stream")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--seqlen", type=int, default=512)
    ap.add_argument("--calib-windows", type=int, default=4)
    args = ap.parse_args()

    model = create_model(args.model)
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    if args.tokens:
        toks = np.load(args.tokens).astype(np.int32)
    else:
        print("[warn] no --tokens; random stream (flow demo)")
        toks = np.random.default_rng(0).integers(
            0, 50257 if args.model == "gpt2_small" else 1024,
            size=(args.seqlen * (args.calib_windows + 2),),
        ).astype(np.int32)

    cfg = parse_qconfig(args.qconfig)
    x0 = jnp.asarray(toks[: args.seqlen][None], jnp.int32)
    qmodel = QuantModel(model, cfg, (x0,))
    qmodel.prepare_calibration()
    for i in range(args.calib_windows):
        qmodel(jnp.asarray(toks[i * args.seqlen : (i + 1) * args.seqlen][None], jnp.int32))
    qmodel.calc_qparams()

    qmodel.set_quant(False, False)
    print("float ppl: {:.3f}".format(ppl(qmodel, toks, args.seqlen)))
    qmodel.set_quant(True, True)
    print("int8 ppl:  {:.3f}".format(ppl(qmodel, toks, args.seqlen)))


if __name__ == "__main__":
    main()
