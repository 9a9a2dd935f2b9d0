"""PTQ basecase: ImageNet-1k CNNs (reference:
examples/post_training_quantization/imagenet1k/basecase/main.py:152-229).

The canonical PTQ flow over the models in the reference's README table
(basecase/README.md:27-33): resnet18, mobilenet_v2, efficientnet_lite0,
regnetx_600mf. Flow: build model -> QuantModel -> prepare_calibration ->
forward calibration batches -> calc_qparams -> set_quant -> evaluate ->
export (StableHLO + quant-metadata sidecar; the TPU-native deploy path
replaces the reference's ONNX/TensorRT handoff).

Data: --data points at an npz with arrays x (N,224,224,3 float,
normalized) and y (N int). Without it, random tensors demonstrate the
flow end-to-end (this environment has no dataset downloads). --ckpt
loads an npz full_state_dict exported from the torch model via
sparsebit_tpu.models.import_torch (see that module's docstring).
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
)

import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.models import create_model

MODELS = ("resnet18", "mobilenet_v2", "efficientnet_lite0", "regnetx_600mf")


def load_data(path, n_calib, n_eval, size=224):
    if path:
        z = np.load(path)
        x, y = z["x"].astype(np.float32), z["y"].astype(np.int64)
    else:
        print("[warn] no --data given; using random tensors (flow demo)")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(n_calib + n_eval, size, size, 3)).astype(np.float32)
        y = rng.integers(0, 1000, size=(n_calib + n_eval,))
    return (x[:n_calib], y[:n_calib]), (x[n_calib : n_calib + n_eval], y[n_calib:])


def accuracy(model_fn, x, y, batch=64):
    correct = 0
    for i in range(0, len(x), batch):
        logits = model_fn(jnp.asarray(x[i : i + batch]))
        correct += int(jnp.sum(jnp.argmax(logits, -1) == jnp.asarray(y[i : i + batch])))
    return correct / len(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet18", choices=MODELS)
    ap.add_argument(
        "--qconfig",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "qconfig.yaml"),
    )
    ap.add_argument("--data", default=None)
    ap.add_argument("--ckpt", default=None, help="npz full_state_dict of the float model")
    ap.add_argument("--calib-batches", type=int, default=16)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-samples", type=int, default=2048)
    ap.add_argument("--export", default=None)
    args = ap.parse_args()

    model = create_model(args.model)
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    (cx, cy), (ex, ey) = load_data(
        args.data, args.calib_batches * args.batch, args.eval_samples
    )

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
