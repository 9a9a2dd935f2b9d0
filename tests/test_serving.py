"""Continuous-batching engine: slot reuse + parity with the plain
generation loop."""

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import generate
from sparsebit_tpu.llm.serving import DecodeEngine

CFG = L.llama_tiny(dim=128, ffn_dim=256, n_layers=2, vocab_size=128,
                   max_seq_len=64, dtype="float32")


def test_engine_matches_generate():
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    prompts = [
        np.array([3, 17, 91, 30], np.int32),
        np.array([5, 9], np.int32),
        np.array([8, 1, 2, 3, 4, 5], np.int32),
    ]
    n_new = 6
    engine = DecodeEngine(params, CFG, max_batch=2, max_len=32)
    rids = [engine.add_request(p, max_new_tokens=n_new) for p in prompts]
    results = engine.run()

    for rid, prompt in zip(rids, prompts):
        ref = generate(
            params, jnp.asarray(prompt[None]), CFG,
            max_new_tokens=n_new, kv_quantized=True, max_len=32,
        )[0]
        got = results[rid]
        assert len(got) == n_new, (rid, got)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref), err_msg=str(rid))


def test_engine_slot_reuse_and_queueing():
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    engine = DecodeEngine(params, CFG, max_batch=1, max_len=32)
    r1 = engine.add_request(np.array([1, 2, 3], np.int32), max_new_tokens=3)
    r2 = engine.add_request(np.array([4, 5], np.int32), max_new_tokens=2)
    out = engine.run()
    assert len(out[r1]) == 3 and len(out[r2]) == 2
    assert not engine.has_work
