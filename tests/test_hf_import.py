"""HF import parity: torch LlamaForCausalLM logits == our functional LLaMA.

The strongest correctness oracle available without datasets: identical
weights, independent implementations (reference relies on HF correctness;
we must match it to claim ppl parity on real checkpoints).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from sparsebit_tpu.llm.import_hf import config_from_hf, params_from_state_dict  # noqa: E402
from sparsebit_tpu.llm.llama import llama_forward  # noqa: E402


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    return model


def test_hf_llama_logits_match(hf_model):
    cfg = config_from_hf(hf_model.config)
    params = params_from_state_dict(
        hf_model.state_dict(), cfg, dtype=jnp.float32
    )
    ids = np.array([[3, 17, 91, 200, 4, 8, 42, 11]], dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()
    out = np.asarray(llama_forward(params, jnp.asarray(ids, jnp.int32), cfg))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_hf_llama_gqa_cache_decode(hf_model):
    """Our cached decode matches HF full forward on the last position."""
    from sparsebit_tpu.llm.decode import decode_step, prefill
    from sparsebit_tpu.llm.kv_cache import init_kv_cache

    cfg = config_from_hf(hf_model.config)
    params = params_from_state_dict(hf_model.state_dict(), cfg, jnp.float32)
    ids = np.array([[5, 9, 100, 30, 77]], dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.numpy()[:, -1]
    cache = init_kv_cache(cfg, 1, max_len=16, quantized=False)
    _, cache = prefill(params, jnp.asarray(ids[:, :-1], jnp.int32), cache, cfg)
    logits, _ = decode_step(params, jnp.asarray(ids[:, -1], jnp.int32), cache, cfg)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)
