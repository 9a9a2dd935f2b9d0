"""Structured (channel) pruning of resnet18 at ImageNet scale, with a
DP-sharded sparse finetune step.

Reference: examples/structured_prune/imagenet1k/ (README-scale runs of the
cifar10/basecase flow: SparseModel -> calc_params -> masked finetune).
TPU-native differences: the finetune loop is a functional optax step over
`smodel.apply` jitted SPMD over a dp mesh (no DDP), and masks stay applied
inside the traced graph so gradients flow only to surviving channels.

    python main.py --sconfig sconfig.yaml [--data imagenet.npz] [--finetune-steps 100]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sparsebit_tpu import SparseModel, parse_sconfig
from sparsebit_tpu.models import create_model
from sparsebit_tpu.parallel.mesh import dp_shard_batch, make_mesh, replicate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sconfig", default=_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "sconfig.yaml"))
    ap.add_argument("--data", default=None, help="npz with x (N,H,W,3), y (N)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--finetune-steps", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--export", default=None)
    args = ap.parse_args()

    model = create_model("resnet18")
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    if args.data:
        z = np.load(args.data)
        x, y = z["x"].astype(np.float32), z["y"].astype(np.int64)
    else:
        print("[warn] no --data; random tensors (flow demo)")
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2 * args.batch, args.img, args.img, 3)).astype(np.float32)
        y = rng.integers(0, 1000, size=(2 * args.batch,))

    cfg = parse_sconfig(args.sconfig)
    smodel = SparseModel(model, cfg, (jnp.asarray(x[: args.batch]),))
    smodel.calc_params()
    print("global sparsity after calc_params: {:.3f}".format(smodel.sparsity()))

    # ---- masked finetune, dp-sharded ---------------------------------------
    n_dev = len(jax.devices())
    mesh = make_mesh(dp=n_dev)
    assert args.batch % n_dev == 0
    smodel.train()
    params = replicate(mesh, smodel.params())
    opt = optax.sgd(args.lr, momentum=0.9)
    opt_state = replicate(mesh, opt.init(params))

    def freeze_masks(tree):
        # masks ride the params pytree; zero their grads so pruned
        # channels cannot resurrect during the finetune
        return {n: {k: (jnp.zeros_like(v) if k.endswith("_mask") else v)
                    for k, v in p.items()} for n, p in tree.items()}

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_of(p):
            logits = smodel.apply(p, xb, training=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=-1))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(freeze_masks(grads), opt_state,
                                        params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.finetune_steps):
        j = (i * args.batch) % (len(x) - args.batch + 1)
        xb = dp_shard_batch(mesh, jnp.asarray(x[j : j + args.batch]))
        yb = dp_shard_batch(mesh, jnp.asarray(y[j : j + args.batch]))
        params, opt_state, loss = step(params, opt_state, xb, yb)
    print("finetune done ({} steps), last loss {:.4f}".format(
        args.finetune_steps, float(loss)))
    smodel.load_params(jax.device_get(params))  # commit before export
    smodel.eval()
    if args.export:
        smodel.export(args.export, jnp.asarray(x[: args.batch]))
        print("exported to", args.export)


if __name__ == "__main__":
    main()
