"""Recorded-accuracy fixture gate (VERDICT round-1 item #2).

The reference tracks accuracy via published tables (wikitext2 ppl,
llama/quantization/README.md:79-86) with no CI gate; this test is the gate
the reference lacks: a deterministically-trained tiny LLaMA on a synthetic
Markov corpus runs the FULL eval harness (train -> GPTQ convert -> packed
QuantLinear -> windowed ppl, mirroring reference convert.py:176-259
llama_eval) and asserts the platform-stable *relative* claims:

  1. the model learned (ppl far below uniform vocab ppl),
  2. int4 quantization costs < 5% ppl,
  3. GPTQ is no worse than round-to-nearest.

Absolute numbers for the committed artifact are recorded by
examples/llm/accuracy_fixture.py -> accuracy/ACCURACY.json.
"""

import pytest

from sparsebit_tpu.llm.fixture import run_fixture


@pytest.fixture(scope="module")
def fixture_results():
    # The artifact config (steps=200): at steps=100 the model is
    # undertrained and the GPTQ-vs-RTN ppl gap sits inside eval noise.
    return run_fixture(steps=200, gptq_bits=(4,))


def test_model_learned(fixture_results):
    # uniform ppl over vocab 256 is 256; a 1st-order Markov chain with ~4
    # successors has ppl floor ~e^H(dirichlet) ~ 2. Trained model must be
    # far below uniform.
    assert fixture_results["ppl_float"] < 4.0


def test_quantization_cost_small(fixture_results):
    f, q = fixture_results["ppl_float"], fixture_results["ppl_gptq_int4"]
    assert q < f * 1.05, "int4 GPTQ ppl {} vs float {}".format(q, f)


def test_gptq_beats_rtn(fixture_results):
    rtn = fixture_results["ppl_rtn_int4"]
    gptq = fixture_results["ppl_gptq_int4"]
    # GPTQ minimises layerwise output error; on a trained model it must not
    # lose to round-to-nearest (tiny tolerance for eval noise).
    assert gptq <= rtn * 1.002, "GPTQ ppl {} vs RTN {}".format(gptq, rtn)
