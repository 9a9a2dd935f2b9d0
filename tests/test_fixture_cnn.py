"""Recorded-accuracy fixture gate for the graph-PTQ regime (CNN top-1).

Counterpart of tests/test_fixture.py (LLM ppl): the reference publishes
ImageNet PTQ top-1 tables (basecase/README.md:27-33) with no CI gate;
this trains a tiny CNN on a synthetic shift-invariant task and runs the
FULL PTQ harness (QuantModel -> calibration -> calc_qparams -> fake-quant
eval), asserting the platform-stable relative claims:

  1. the model learned (top-1 far above 10-class chance),
  2. int8 PTQ costs < 2 points of top-1 (the reference's resnet18 row
     loses 0.216 points),
  3. 4-bit weights cost more than 8-bit but stay usable.

Absolute numbers for the committed artifact are recorded by
examples/post_training_quantization/record_fixture.py ->
accuracy/ACCURACY.json.
"""

import pytest

from sparsebit_tpu.quantization.tools.fixture import run_cnn_fixture


@pytest.fixture(scope="module")
def fixture_results():
    # Smaller than the artifact config (steps=300, n_train=4096) to keep CI
    # time down; the relative gates hold from ~150 steps on.
    return run_cnn_fixture(steps=150, n_train=2048, n_eval=1024)


def test_model_learned(fixture_results):
    assert fixture_results["acc_float"] > 0.6  # chance = 0.1


def test_int8_ptq_cost_small(fixture_results):
    f, q = fixture_results["acc_float"], fixture_results["acc_w8a8"]
    assert q > f - 0.02, "int8 top-1 {} vs float {}".format(q, f)


def test_w4_degrades_gracefully(fixture_results):
    f, q4 = fixture_results["acc_float"], fixture_results["acc_w4a8"]
    assert q4 > f - 0.15, "w4a8 top-1 {} vs float {}".format(q4, f)
    # and 4-bit should not beat 8-bit by more than noise
    assert q4 <= fixture_results["acc_w8a8"] + 0.02
