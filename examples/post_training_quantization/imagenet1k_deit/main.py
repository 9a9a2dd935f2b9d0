"""PTQ DeiT (reference: examples/post_training_quantization/imagenet1k/deit/main.py).

    python main.py --model deit_tiny --qconfig qconfig.yaml [--data imagenet.npz]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny",
                    choices=["deit_tiny", "deit_small", "deit_base"])
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig.yaml"))
    ap.add_argument("--data", default=None, help="npz x (N,224,224,3), y (N)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--calib-batches", type=int, default=8)
    args = ap.parse_args()

    model = create_model(args.model)
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    if args.data:
        z = np.load(args.data)
        x, y = z["x"].astype(np.float32), z["y"]
    else:
        print("[warn] no --data; random tensors (flow demo)")
        x = np.random.default_rng(0).normal(
            size=(args.calib_batches * args.batch + 256, 224, 224, 3)
        ).astype(np.float32)
        y = np.zeros(len(x), np.int64)

    cfg = parse_qconfig(args.qconfig)
    qmodel = QuantModel(model, cfg, (jnp.asarray(x[: args.batch]),))
    qmodel.prepare_calibration()
    for i in range(args.calib_batches):
        qmodel(jnp.asarray(x[i * args.batch : (i + 1) * args.batch]))
    qmodel.calc_qparams()
    qmodel.set_quant(w_quant=True, a_quant=True)

    eval_x, eval_y = x[-256:], y[-256:]
    correct = 0
    for i in range(0, len(eval_x), args.batch):
        logits = qmodel(jnp.asarray(eval_x[i : i + args.batch]))
        correct += int(jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(eval_y[i : i + args.batch])))
    print("int8 top-1: {:.4f}".format(correct / len(eval_x)))

    err = qmodel.get_quantization_error(jnp.asarray(eval_x[: args.batch]))
    worst = sorted(err.items(), key=lambda kv: -kv[1])[:5]
    print("worst-5 layers by quant error:", worst)


if __name__ == "__main__":
    main()
