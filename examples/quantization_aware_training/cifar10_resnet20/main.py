"""QAT basecase: 4-bit LSQ resnet20 (reference:
examples/quantization_aware_training/imagenet1k/basecase/main.py:233-250).

Flow: QuantModel -> calibrate -> init_QAT (LSQ scales become learnable)
-> 8-bit head/tail override -> jitted functional training loop.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsebit_tpu import QuantModel, parse_qconfig
from sparsebit_tpu.models import create_model
from sparsebit_tpu.quantization.tools import (
    commit_qat_params,
    cross_entropy,
    init_qat_state,
    make_qat_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig.yaml"))
    ap.add_argument("--data", default=None, help="npz with x (N,32,32,3), y (N)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    if args.data:
        z = np.load(args.data)
        x, y = z["x"].astype(np.float32), z["y"].astype(np.int64)
    else:
        print("[warn] no --data; random tensors (flow demo)")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(1024, 32, 32, 3)).astype(np.float32)
        y = rng.integers(0, 10, size=(1024,))

    model = create_model("resnet20").eval()
    cfg = parse_qconfig(args.qconfig)
    qmodel = QuantModel(model, cfg, (jnp.asarray(x[: args.batch]),))

    # 8-bit head/tail override BEFORE calibration (QAT main.py:236-250)
    names = [n for n, _ in qmodel.qmodules()]
    for name in (names[0], names[-1]):
        op = qmodel.get_qmodule(name)
        for q in (op.input_quantizer, op.weight_quantizer):
            if q is not None:
                q.set_bit(8)

    # calibrate + QAT init (LSQ inits its scale from observer stats)
    qmodel.prepare_calibration()
    for i in range(0, min(len(x), 4 * args.batch), args.batch):
        qmodel(jnp.asarray(x[i : i + args.batch]))
    qmodel.init_QAT()

    opt = optax.adam(args.lr)
    step = make_qat_step(qmodel, cross_entropy, opt)
    trainable, opt_state = init_qat_state(qmodel, opt)
    qmodel.train()
    for epoch in range(args.epochs):
        for i in range(0, len(x), args.batch):
            xb = jnp.asarray(x[i : i + args.batch])
            yb = jnp.asarray(y[i : i + args.batch])
            trainable, opt_state, loss = step(trainable, opt_state, xb, yb)
        print("epoch {} loss {:.4f}".format(epoch, float(loss)))
    commit_qat_params(qmodel, trainable)
    qmodel.eval()


if __name__ == "__main__":
    main()
