"""Weight-streaming decode == resident decode (reference single_device_mode
oracle: streamed execution must be numerically identical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparsebit_tpu.llm import llama as L
from sparsebit_tpu.llm.decode import decode_step, prefill
from sparsebit_tpu.llm.kv_cache import init_kv_cache
from sparsebit_tpu.llm.offload import StreamingLlama, offload_llama_params

CFG = L.llama_tiny(dim=128, ffn_dim=256, n_layers=3, vocab_size=128,
                   max_seq_len=64, dtype="float32")


@pytest.mark.parametrize("kv_quantized", [False, True])
def test_streaming_matches_resident(kv_quantized):
    params = L.init_llama_params(CFG, jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, CFG.vocab_size)

    cache = init_kv_cache(CFG, 2, 32, quantized=kv_quantized)
    ref_logits, ref_cache = prefill(params, tokens, cache, CFG)
    ref_step, _ = decode_step(params, jnp.argmax(ref_logits, -1).astype(jnp.int32),
                              ref_cache, CFG)

    host = offload_llama_params(params)
    sl = StreamingLlama(host, CFG, prefetch=2)
    cache2 = init_kv_cache(CFG, 2, 32, quantized=kv_quantized)
    logits, cache2 = sl.prefill(tokens, cache2)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-4
    )
    step, _ = sl.decode_step(jnp.argmax(logits, -1).astype(jnp.int32), cache2)
    np.testing.assert_allclose(
        np.asarray(step), np.asarray(ref_step), rtol=1e-4, atol=1e-4
    )
