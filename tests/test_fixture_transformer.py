"""Recorded-accuracy fixture gates for the transformer PTQ regimes.

Counterparts of tests/test_fixture_cnn.py for the two reference accuracy
tables that had no gate (round-2 VERDICT #5):

- DeiT regime (imagenet1k/deit/README.md:37-40): a tiny ViT — patch conv,
  MHSA with F.matmul/softmax, LayerNorm, GELU on the NLC path — trained
  on patch-shifted templates; the reference's deit_tiny row loses 0.25
  top-1 points at w8a8 (MSE observers, LN/softmax in float).
- BERT/CoLA regime (GLUE/CoLA/README.md:24-27): the zoo BertModel on a
  synthetic Markov-chain 'grammaticality' task (bigram evidence — the
  attention path is load-bearing, unigram stats don't separate classes).

Absolute numbers for the committed artifact are recorded by
examples/post_training_quantization/record_fixture.py ->
accuracy/ACCURACY.json (vit_ptq / bert_ptq keys).
"""

import pytest

from sparsebit_tpu.quantization.tools.fixture import (
    run_bert_fixture,
    run_vit_fixture,
)


@pytest.fixture(scope="module")
def vit_results():
    # smaller than the artifact config to keep CI time down; the relative
    # gates hold from ~150 steps on
    return run_vit_fixture(steps=150, n_train=2048, n_eval=512)


@pytest.fixture(scope="module")
def bert_results():
    return run_bert_fixture(steps=200, n_train=2048, n_eval=512)


def test_vit_learned(vit_results):
    assert vit_results["acc_float"] > 0.6  # chance = 0.1


def test_vit_int8_ptq_cost_small(vit_results):
    f, q = vit_results["acc_float"], vit_results["acc_w8a8"]
    assert q > f - 0.03, "int8 top-1 {} vs float {}".format(q, f)


def test_vit_w4_degrades_gracefully(vit_results):
    f, q4 = vit_results["acc_float"], vit_results["acc_w4a8"]
    assert q4 > f - 0.15, "w4a8 top-1 {} vs float {}".format(q4, f)
    assert q4 <= vit_results["acc_w8a8"] + 0.02


def test_bert_learned(bert_results):
    assert bert_results["acc_float"] > 0.7  # chance = 0.5


def test_bert_int8_ptq_cost_small(bert_results):
    f, q = bert_results["acc_float"], bert_results["acc_w8a8"]
    assert q > f - 0.03, "int8 acc {} vs float {}".format(q, f)


def test_bert_w4_degrades_gracefully(bert_results):
    f, q4 = bert_results["acc_float"], bert_results["acc_w4a8"]
    assert q4 > f - 0.15, "w4a8 acc {} vs float {}".format(q4, f)


@pytest.fixture(scope="module")
def vit_qat_results():
    from sparsebit_tpu.quantization.tools.fixture import run_vit_qat_fixture

    # CI runs the 400-step point of the round-5 schedule ablation
    # (exp35: 0.652 top-1; the recorded-artifact default is 800 steps ->
    # 0.711, where the fixture SATURATES — 1600 steps measures the same)
    return run_vit_qat_fixture(steps=150, qat_steps=400, n_train=2048,
                               n_eval=512)


def test_vit_qat_recovers_over_ptq(vit_qat_results):
    """QAT (LSQ 4w4a trained through the quantized attention path) must
    recover SUBSTANTIALLY over the calibrated PTQ starting point —
    round 5 raised the gate from "QAT > PTQ + 0.10" (which a
    half-trained run satisfied) to an ABSOLUTE floor: the 400-step
    cosine schedule measures 0.652 top-1 (float 0.885, PTQ-at-init
    0.328; saturation 0.711 at 800+ steps — exp35 ablation, recorded in
    accuracy/ACCURACY.json vit_qat)."""
    r = vit_qat_results
    assert r["acc_qat"] >= 0.60, r
    assert r["acc_qat"] >= r["acc_ptq"] + 0.25, r
