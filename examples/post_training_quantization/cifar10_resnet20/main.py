"""PTQ basecase: resnet20/cifar10 (reference:
examples/post_training_quantization/cifar10/basecase/main.py).

Flow: build model -> QuantModel -> prepare_calibration -> forward
calibration batches -> calc_qparams -> set_quant -> evaluate/export.

Data: --data points at an npz with arrays x (N,32,32,3 float) and
y (N int); without it, random data demonstrates the flow (this
environment has no dataset downloads).
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


def load_data(path, n_calib, n_eval):
    if path:
        z = np.load(path)
        x, y = z["x"].astype(np.float32), z["y"].astype(np.int64)
    else:
        print("[warn] no --data given; using random tensors (flow demo)")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(n_calib + n_eval, 32, 32, 3)).astype(np.float32)
        y = rng.integers(0, 10, size=(n_calib + n_eval,))
    return (x[:n_calib], y[:n_calib]), (x[n_calib : n_calib + n_eval], y[n_calib:])


def accuracy(model_fn, x, y, batch=128):
    correct = 0
    for i in range(0, len(x), batch):
        logits = model_fn(jnp.asarray(x[i : i + batch]))
        correct += int(jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(y[i : i + batch])))
    return correct / len(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig.yaml"))
    ap.add_argument("--data", default=None)
    ap.add_argument("--ckpt", default=None, help="npz full_state_dict of the float model")
    ap.add_argument("--calib-batches", type=int, default=16)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--export", default=None)
    args = ap.parse_args()

    model = create_model("resnet20")
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    (cx, cy), (ex, ey) = load_data(args.data, args.calib_batches * args.batch, 2048)

    cfg = parse_qconfig(args.qconfig)
    qmodel = QuantModel(model, cfg, (jnp.asarray(cx[: args.batch]),))

    qmodel.prepare_calibration()
    for i in range(0, len(cx), args.batch):
        qmodel(jnp.asarray(cx[i : i + args.batch]))
    qmodel.calc_qparams()

    qmodel.set_quant(w_quant=False, a_quant=False)
    if args.ckpt or args.data:
        print("float acc: {:.4f}".format(accuracy(qmodel, ex, ey, args.batch)))
    qmodel.set_quant(w_quant=True, a_quant=True)
    print("int8 acc: {:.4f}".format(accuracy(qmodel, ex, ey, args.batch)))

    if args.export:
        qmodel.export(args.export, jnp.asarray(ex[: args.batch]))
        print("exported to", args.export)


if __name__ == "__main__":
    main()
