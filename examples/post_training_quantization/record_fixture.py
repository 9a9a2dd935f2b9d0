"""Record the CNN PTQ accuracy fixture's absolute numbers into
accuracy/ACCURACY.json (under the "cnn_ptq" key, merging with the LLM
fixture's "llm_gptq" numbers written by examples/llm/accuracy_fixture.py).

Usage:
    python examples/post_training_quantization/record_fixture.py [--steps 300]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "..", "accuracy", "ACCURACY.json"
        ),
    )
    args = ap.parse_args()

    from sparsebit_tpu.quantization.tools.fixture import run_cnn_fixture

    results = run_cnn_fixture(steps=args.steps, verbose=True)
    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    if "llm_gptq" not in existing and "ppl_float" in existing:
        existing = {"llm_gptq": existing}  # migrate flat round-1 layout
    existing["cnn_ptq"] = results
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
