"""DP-sharded QAT for DeiT/ViT: 4-bit LSQ (or LSQ+ on post-GELU inputs).

Reference flow: examples/quantization_aware_training/imagenet1k/deit/
main.py — timm DeiT -> QuantModel -> 8-bit patch-embed/head overrides
(main.py:578-581) -> calibrate 256 images -> init_QAT -> DDP training
loop with LabelSmoothingCrossEntropy. TPU-native equivalent: the
first-party ViT zoo, the same QuantModel flow (the 8-bit head/tail
override rides each yaml's SPECIFIC section), and data parallelism as a
`jax.sharding.Mesh` batch sharding — the jitted train step runs SPMD with
XLA inserting the gradient psum (no DDP wrapper, no EMA/mixup scaffolding;
those are timm training-recipe pieces, orthogonal to quantization).

This exercises LSQ end-to-end THROUGH the quantized attention path:
QMatmul(q, k^T) and QMatmul(softmax, v) train with learned scales, which
no CNN example touches.

Run on a pod slice as-is; to demo locally:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python main.py --model deit_tiny --img 64 --batch 16 --qconfig qconfig_lsq.yaml
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
from sparsebit_tpu.parallel.mesh import dp_shard_batch, make_mesh, replicate
from sparsebit_tpu.quantization.tools import (
    commit_qat_params,
    cross_entropy,
    init_qat_state,
    make_qat_step,
)


def label_smoothing_ce(logits, y, smoothing=0.1):
    """timm LabelSmoothingCrossEntropy (reference criterion at
    deit/main.py:619) as a functional loss."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    return jnp.mean((1.0 - smoothing) * nll - smoothing * jnp.mean(logp, axis=-1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deit_tiny",
                    choices=["deit_tiny", "deit_small", "deit_base"])
    ap.add_argument("--qconfig", default=_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "qconfig_lsq.yaml"))
    ap.add_argument("--data", default=None, help="npz with x (N,H,W,3), y (N)")
    ap.add_argument("--ckpt", default=None, help="float checkpoint (npz)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=64, help="global batch")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--smoothing", type=float, default=0.1)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    mesh = make_mesh(dp=n_dev)
    assert args.batch % n_dev == 0, "global batch must divide the dp axis"
    print("devices: {} (dp={})".format(n_dev, n_dev))

    if args.data:
        z = np.load(args.data)
        x, y = z["x"].astype(np.float32), z["y"].astype(np.int64)
    else:
        print("[warn] no --data; random tensors (flow demo)")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2 * args.batch, args.img, args.img, 3)).astype(
            np.float32)
        y = rng.integers(0, 1000, size=(2 * args.batch,))

    model = create_model(args.model, img_size=args.img)
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()
    cfg = parse_qconfig(args.qconfig)
    qmodel = QuantModel(model, cfg, (jnp.asarray(x[: args.batch]),))

    # calibrate ~256 images (reference calib_size) + QAT init
    qmodel.prepare_calibration()
    for i in range(0, min(len(x), 256), args.batch):
        qmodel(jnp.asarray(x[i : i + args.batch]))
    qmodel.init_QAT()

    opt = optax.adamw(args.lr, weight_decay=0.05)
    loss_fn = (lambda lg, yy: label_smoothing_ce(lg, yy, args.smoothing)
               ) if args.smoothing else cross_entropy
    step = make_qat_step(qmodel, loss_fn, opt)
    trainable, opt_state = init_qat_state(qmodel, opt)
    trainable = replicate(mesh, trainable)
    opt_state = replicate(mesh, opt_state)

    qmodel.train()
    for epoch in range(args.epochs):
        for i in range(0, len(x) - args.batch + 1, args.batch):
            xb = dp_shard_batch(mesh, jnp.asarray(x[i : i + args.batch]))
            yb = dp_shard_batch(mesh, jnp.asarray(y[i : i + args.batch]))
            trainable, opt_state, loss = step(trainable, opt_state, xb, yb)
        print("epoch {} loss {:.4f}".format(epoch, float(loss)))
    commit_qat_params(qmodel, jax.device_get(trainable))
    qmodel.eval()

    # eval (quant on) on the tail of the data
    xb = jnp.asarray(x[-args.batch:])
    yb = np.asarray(y[-args.batch:])
    pred = np.asarray(jnp.argmax(qmodel(xb), axis=-1))
    print("QAT top-1 on eval tail: {:.4f}".format(float((pred == yb).mean())))


if __name__ == "__main__":
    main()
