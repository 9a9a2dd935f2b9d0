"""sparsebit_tpu — a TPU-native model-compression and quantized-inference framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
megvii-research/Sparsebit (see SURVEY.md):

- ``sparsebit_tpu.quantization``: graph-level PTQ/QAT toolkit (QuantModel,
  quantizer/observer zoo, calibration, fusion passes, export).
- ``sparsebit_tpu.sparse``: pruning (mask) toolkit (SparseModel, sparser zoo).
- ``sparsebit_tpu.llm``: GPTQ low-bit LLM pipeline, packed-weight Pallas
  kernels, decode engine with INT8 KV-cache, QLoRA finetuning.
- ``sparsebit_tpu.parallel``: mesh/sharding utilities (DP/TP over ICI).
"""

__version__ = "0.1.0"

from sparsebit_tpu.quantization import QuantModel, parse_qconfig
from sparsebit_tpu.sparse import SparseModel, parse_sconfig
