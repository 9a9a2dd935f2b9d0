"""Unstructured pruning of a BERT QA model (SQuAD regime): span-extraction
start/end heads, encoder Linears masked elementwise, embeddings + QA head
kept dense.

Reference: examples/unstructured_prune/SQuAD/main.py — HF bert-base on
SQuAD with tokenized context/question pairs, AdamW finetune under
progressively ratcheted sparsity. This environment has no datasets
(zero egress), so --data takes a pre-tokenized npz
(input_ids (N, L) int32, start (N), end (N)); without it a synthetic
span-recovery task demos the flow (the answer span is marked by a
delimiter token the encoder must locate — position-dependent, so the
attention path is load-bearing). The sparsity schedule ratchets the mask
ratio every --ratio-steps finetune steps, recomputing masks from the
current weights (the reference's iterative magnitude schedule).

    python main.py --sconfig sconfig.yaml [--data squad_tok.npz]
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


def synth_span_data(n, seqlen=48, vocab=1024, seed=0, mark=7):
    """Synthetic extractive QA: random token stream; the answer span is
    bracketed by ``mark`` tokens. Start/end labels point at the bracket
    interior — recovering them requires position-sensitive attention."""
    rng = np.random.default_rng(seed)
    x = rng.integers(8, vocab, size=(n, seqlen), dtype=np.int64)
    starts = rng.integers(1, seqlen - 6, size=n)
    lens = rng.integers(1, 4, size=n)
    ends = np.minimum(starts + lens, seqlen - 2)
    for i in range(n):
        x[i, starts[i] - 1] = mark
        x[i, ends[i] + 1] = mark
    return x.astype(np.int32), starts.astype(np.int64), ends.astype(np.int64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sconfig", default=_os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "sconfig.yaml"))
    ap.add_argument("--data", default=None,
                    help="npz with input_ids (N,L), start (N), end (N)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--ratio-steps", type=int, default=20,
                    help="re-ratchet the mask every this many steps")
    ap.add_argument("--ratios", default="0.2,0.35,0.5",
                    help="iterative magnitude schedule (final = sconfig RATIO)")
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    model = create_model("bert_qa_tiny")
    if args.ckpt:
        model.load_full_state_dict(dict(np.load(args.ckpt)))
    model.eval()

    if args.data:
        z = np.load(args.data)
        x, ys, ye = (z["input_ids"].astype(np.int32),
                     z["start"].astype(np.int64), z["end"].astype(np.int64))
    else:
        print("[warn] no --data; synthetic span-recovery task (flow demo)")
        x, ys, ye = synth_span_data(4 * args.batch)

    cfg = parse_sconfig(args.sconfig)
    smodel = SparseModel(model, cfg, (jnp.asarray(x[: args.batch]),))

    opt = optax.adamw(args.lr)
    params = smodel.params()
    opt_state = opt.init(params)
    smodel.train()

    def freeze_masks(tree):
        # masks are part of the params pytree (smodel.apply reads them
        # from there) but must NOT train: zero their gradient entries
        return {n: {k: (jnp.zeros_like(v) if k.endswith("_mask") else v)
                    for k, v in p.items()} for n, p in tree.items()}

    @jax.jit
    def step(params, opt_state, xb, sb, eb):
        def loss_of(p):
            start_logits, end_logits = smodel.apply(p, xb, training=True)
            def ce(lg, lab):
                lp = jax.nn.log_softmax(lg, axis=-1)
                return -jnp.mean(jnp.take_along_axis(lp, lab[:, None], 1))
            return 0.5 * (ce(start_logits, sb) + ce(end_logits, eb))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(freeze_masks(grads), opt_state,
                                        params)
        return optax.apply_updates(params, updates), opt_state, loss

    ratios = [float(r) for r in args.ratios.split(",")]
    ri = -1
    for i in range(args.steps):
        if i % args.ratio_steps == 0 and ri + 1 < len(ratios):
            # iterative magnitude schedule: load current weights, raise the
            # ratio, recompute masks from the finetuned magnitudes
            ri += 1
            smodel.load_params(jax.device_get(params))
            for _, op in smodel.smodules():
                if getattr(op, "sparser", None) is not None:
                    op.sparser.ratio = ratios[ri]
            smodel.calc_params()
            # the training step reads masks from the PARAMS pytree —
            # refresh the mask leaves from the freshly computed buffers
            # (without this the whole finetune runs dense)
            params = smodel.params()
            opt_state = opt.init(params)
            print("step {}: mask ratio -> {} (global sparsity {:.3f})".format(
                i, ratios[ri], smodel.sparsity()))
        j = (i * args.batch) % (len(x) - args.batch + 1)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x[j : j + args.batch]),
            jnp.asarray(ys[j : j + args.batch]),
            jnp.asarray(ye[j : j + args.batch]))
    print("done: final loss {:.4f}, sparsity {:.3f}".format(
        float(loss), smodel.sparsity()))

    # exact-match on the tail batch (the reference reports SQuAD EM/F1)
    smodel.load_params(jax.device_get(params))
    smodel.eval()
    sl, el = smodel(jnp.asarray(x[-args.batch:]))
    em = float(np.mean(
        (np.argmax(np.asarray(sl), -1) == ys[-args.batch:])
        & (np.argmax(np.asarray(el), -1) == ye[-args.batch:])))
    print("span exact-match on eval tail: {:.3f}".format(em))


if __name__ == "__main__":
    main()
