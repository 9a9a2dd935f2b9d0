"""DP-sharded QAT: resnet18/imagenet with LSQ / LSQ+ / PACT / DoReFa.

Reference flow: examples/quantization_aware_training/imagenet1k/basecase/
main.py:233-255 — QuantModel, 8-bit head/tail overrides, calibrate,
init_QAT, then a DistributedDataParallel training loop. TPU-native
equivalent: the same QuantModel flow, but data parallelism is a
`jax.sharding.Mesh` batch sharding — the jitted train step runs SPMD over
every device with XLA inserting the gradient psum (no DDP wrapper, no
NCCL). Pick the quantizer with --qconfig qconfig_{lsq,lsq_plus,pact,
dorefa}.yaml; the 8-bit head/tail override rides in each yaml's SPECIFIC
section (reference does it in code at main.py:236-239).

Run on a pod slice as-is; to demo locally:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python main.py --qconfig qconfig_lsq.yaml
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qconfig", default=_os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "qconfig_lsq.yaml"))
    ap.add_argument("--data", default=None, help="npz with x (N,H,W,3), y (N)")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch", type=int, default=256, help="global batch")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--lr", type=float, default=1e-4)
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
            np.float32
        )
        y = rng.integers(0, 1000, size=(2 * args.batch,))

    model = create_model("resnet18").eval()
    cfg = parse_qconfig(args.qconfig)
    qmodel = QuantModel(model, cfg, (jnp.asarray(x[: args.batch]),))

    # calibrate + QAT init (learnable scales/clips initialised from stats)
    qmodel.prepare_calibration()
    for i in range(0, min(len(x), 4 * args.batch), args.batch):
        qmodel(jnp.asarray(x[i : i + args.batch]))
    qmodel.init_QAT()

    opt = optax.adam(args.lr)
    step = make_qat_step(qmodel, cross_entropy, opt)
    trainable, opt_state = init_qat_state(qmodel, opt)
    # replicate params/opt state over the mesh; shard every batch on dp —
    # under jit this is exactly DDP (psum on grads), minus the wrapper
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


if __name__ == "__main__":
    main()
