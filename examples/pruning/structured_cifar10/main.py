"""Pruning example (reference: examples/{structured,unstructured}_prune/).

    python main.py --sconfig sconfig.yaml
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
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--export", default=None)
    args = ap.parse_args()

    model = create_model("resnet20")
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 32, 32, 3)), jnp.float32)
    cfg = parse_sconfig(args.sconfig)
    smodel = SparseModel(model, cfg, (x,))
    smodel.calc_params()
    out = smodel(x)
    print("output {}, global sparsity {:.3f}".format(out.shape, smodel.sparsity()))
    if args.export:
        smodel.export(args.export, x)
        print("exported to", args.export)


if __name__ == "__main__":
    main()
