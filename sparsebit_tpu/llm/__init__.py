"""LLM low-bit pipeline (reference: large_language_models/, SURVEY.md §2.4).

- ``llm.llama``: functional LLaMA (RoPE, GQA, RMSNorm) whose linears are
  either dense arrays or packed ``QuantLinear`` pytrees dispatching to the
  Pallas groupwise dequant-matmul.
- ``llm.quant``: per-channel/group quantizer (minmax ± MSE grid) and the
  packed QuantLinear container.
- ``llm.gptq``: Hessian-based GPTQ solver (blockwise Cholesky, mixed
  precision candidate bits, groupsize, bias correction).
- ``llm.convert``: layer-streaming quantization driver + checkpointing.
- ``llm.kv_cache`` / ``llm.decode``: INT8 KV-cache decode engine.
- ``llm.qlora``: LoRA finetuning over quantized backbones (W4A8 path).
"""

from sparsebit_tpu.llm.quant import QuantLinear, DenseLinear, LLMQuantizer  # noqa: F401
from sparsebit_tpu.llm.llama import LlamaConfig, init_llama_params, llama_forward  # noqa: F401
