"""Record the accuracy fixture's absolute numbers to accuracy/ACCURACY.json.

Usage:
    python examples/llm/accuracy_fixture.py [--steps 200] [--bits 4 3]

This is the committed-accuracy artifact for the framework: a
deterministically-trained tiny LLaMA evaluated through the exact pipeline a
real checkpoint uses (GPTQ convert -> packed QuantLinear -> windowed ppl,
reference convert.py:176-259). When a real LLaMA checkpoint + wikitext2 are
available, examples/llm/gptq_convert.py --eval produces the number to
compare against the reference table (int4-g128 7B ppl 7.547).
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--bits", type=int, nargs="+", default=[4, 3])
    ap.add_argument("--groupsize", type=int, default=32)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "..", "accuracy", "ACCURACY.json"
        ),
    )
    args = ap.parse_args()

    from sparsebit_tpu.llm.fixture import run_fixture

    results = run_fixture(
        steps=args.steps,
        gptq_bits=tuple(args.bits),
        groupsize=args.groupsize,
        verbose=True,
    )
    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    if "llm_gptq" not in existing and "ppl_float" in existing:
        existing = {}  # flat round-1 layout is superseded by this write
    existing["llm_gptq"] = results
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
