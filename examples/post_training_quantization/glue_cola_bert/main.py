"""PTQ BERT on GLUE/CoLA-style classification (reference:
examples/post_training_quantization/GLUE/CoLA/main.py — finetune +
postquant modes; here postquant, finetuning is any standard loop).

    python main.py --data cola_tokens.npz [--ckpt bert.npz]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.models import create_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="bert_base", choices=["bert_base", "bert_tiny"])
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig.yaml"))
    ap.add_argument("--data", default=None, help="npz: input_ids (N,S) int, label (N)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--calib-batches", type=int, default=8)
    args = ap.parse_args()

    model = create_model(args.model)
    vocab = model.embeddings.word_embeddings.num_embeddings
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    if args.data:
        z = np.load(args.data)
        ids, labels = z["input_ids"].astype(np.int32), z["label"]
    else:
        print("[warn] no --data; random tokens (flow demo)")
        rng = np.random.default_rng(0)
        ids = rng.integers(0, vocab, size=(args.calib_batches * args.batch + 256, 64)).astype(np.int32)
        labels = rng.integers(0, 2, size=(len(ids),))

    cfg = parse_qconfig(args.qconfig)
    qmodel = QuantModel(model, cfg, (jnp.asarray(ids[: args.batch]),))
    qmodel.prepare_calibration()
    for i in range(args.calib_batches):
        qmodel(jnp.asarray(ids[i * args.batch : (i + 1) * args.batch]))
    qmodel.calc_qparams()
    qmodel.set_quant(True, True)

    ex, ey = ids[-256:], labels[-256:]
    correct = 0
    for i in range(0, len(ex), args.batch):
        logits = qmodel(jnp.asarray(ex[i : i + args.batch]))
        correct += int(jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(ey[i : i + args.batch])))
    print("int8 acc: {:.4f}".format(correct / len(ex)))


if __name__ == "__main__":
    main()
