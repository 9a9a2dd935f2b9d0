"""Record the PTQ accuracy fixtures' absolute numbers into
accuracy/ACCURACY.json ("cnn_ptq" / "vit_ptq" / "bert_ptq" keys, merging
with the LLM fixture's "llm_gptq" numbers written by
examples/llm/accuracy_fixture.py).

Usage:
    python examples/post_training_quantization/record_fixture.py \
        [--steps 300] [--which cnn vit bert]
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
    ap.add_argument("--which", nargs="+", default=["cnn", "vit", "bert", "vit_qat"],
                    choices=["cnn", "vit", "bert", "vit_qat"])
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "..", "accuracy", "ACCURACY.json"
        ),
    )
    args = ap.parse_args()

    from sparsebit_tpu.quantization.tools import fixture

    runners = {"cnn": fixture.run_cnn_fixture,
               "vit": fixture.run_vit_fixture,
               "bert": fixture.run_bert_fixture,
               "vit_qat": fixture.run_vit_qat_fixture}
    results = {k: runners[k](steps=args.steps, verbose=True)
               for k in args.which}
    out = os.path.abspath(args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    if "llm_gptq" not in existing and "ppl_float" in existing:
        existing = {"llm_gptq": existing}  # migrate flat round-1 layout
    for k, v in results.items():
        existing[k if k.endswith("_qat") else k + "_ptq"] = v
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
