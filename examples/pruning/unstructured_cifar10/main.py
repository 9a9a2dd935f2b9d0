"""Unstructured pruning on the cifar-style resnet20
(reference: examples/unstructured_prune/cifar10/main.py — the torch
version wraps a DDP training loop around SparseModel; datasets are not
available in this environment, so this drives the same SparseModel flow
on synthetic tensors and reports mask sparsity. Fine-tuning after masking
is ordinary optax training on smodel.apply, see docs/user_guide.md).

    python main.py --sconfig sconfig.yaml [--ratio 0.7] [--export out]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import SparseModel, parse_sconfig
from sparsebit_tpu.models import create_model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sconfig", default=_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "sconfig.yaml"))
    ap.add_argument("--ratio", type=float, default=None,
                    help="override SPARSER.RATIO")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--export", default=None)
    args = ap.parse_args()

    model = create_model("resnet20")
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    cfg = parse_sconfig(args.sconfig)
    if args.ratio is not None:
        cfg.defrost()
        cfg.SPARSER.RATIO = args.ratio
        cfg.freeze()

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 32, 32, 3)), jnp.float32
    )
    smodel = SparseModel(model, cfg, (x,))
    smodel.calc_params()
    out = smodel(x)
    print("output {}, global sparsity {:.3f} (requested {})".format(
        out.shape, smodel.sparsity(), cfg.SPARSER.RATIO))
    if args.export:
        smodel.export(args.export, x)
        print("exported to", args.export)


if __name__ == "__main__":
    main()
