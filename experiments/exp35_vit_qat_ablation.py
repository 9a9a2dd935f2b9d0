"""exp35: ViT-QAT fixture schedule ablation (VERDICT r4 #6).

The round-4 gate run recovered 0.582 top-1 (float 0.885, PTQ-at-init
0.328) after 120 QAT steps — a half-trained result by the reference's
QAT standard (LSQ 4w4f recovers ~float,
quantization_aware_training/imagenet1k/README.md). This sweeps the QAT
schedule (steps x lr) to find where the fixture saturates; the winning
config becomes the fixture default + the raised accuracy gate.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from sparsebit_tpu.quantization.tools.fixture import run_vit_qat_fixture

GRID = [
    (120, 2e-4),   # round-4 baseline
    (400, 2e-4),
    (400, 5e-4),
    (800, 2e-4),
    (800, 5e-4),
    (1600, 5e-4),
]

if __name__ == "__main__":
    picks = [int(a) for a in sys.argv[1:]] or range(len(GRID))
    for i in picks:
        steps, lr = GRID[i]
        r = run_vit_qat_fixture(qat_steps=steps, qat_lr=lr)
        print(json.dumps({"qat_steps": steps, "qat_lr": lr,
                          "acc_float": r["acc_float"],
                          "acc_ptq": r["acc_ptq"],
                          "acc_qat": r["acc_qat"]}), flush=True)
