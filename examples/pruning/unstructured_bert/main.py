"""Unstructured pruning of the BERT encoder (reference:
examples/unstructured_prune/{GLUE/bert,SQuAD}/main.py — torch prunes HF
bert-base on GLUE/SQuAD; this drives the identical SparseModel flow on
the zoo BertModel: encoder Linears masked elementwise at RATIO,
embeddings and the task head kept dense via SPECIFIC overrides).

    python main.py --sconfig sconfig.yaml [--ratio 0.7]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.abspath(_os.path.join(_os.path.dirname(__file__), "..", "..", "..")))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu import SparseModel, parse_sconfig
from sparsebit_tpu.models.bert import BertModel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sconfig", default=_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "sconfig.yaml"))
    ap.add_argument("--ratio", type=float, default=None)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    model = BertModel(
        vocab_size=1024, dim=args.dim, depth=args.depth,
        num_heads=2, ffn_dim=4 * args.dim, num_classes=2,
        key=jax.random.PRNGKey(0),
    ).eval()

    cfg = parse_sconfig(args.sconfig)
    if args.ratio is not None:
        cfg.defrost()
        cfg.SPARSER.RATIO = args.ratio
        cfg.freeze()

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 1024, size=(4, 32)), jnp.int32
    )
    smodel = SparseModel(model, cfg, (ids,))
    smodel.calc_params()
    out = smodel(ids)
    print("logits {}, encoder sparsity {:.3f} (requested {})".format(
        out.shape, smodel.sparsity(), cfg.SPARSER.RATIO))


if __name__ == "__main__":
    main()
