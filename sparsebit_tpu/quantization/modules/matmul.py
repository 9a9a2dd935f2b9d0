"""Quantized matmul (reference: sparsebit/quantization/modules/matmul.py:8,
multi-input: both operands get QIdentity quantizers)."""

from sparsebit_tpu.nn import functional as F
from sparsebit_tpu.quantization.modules import register_qmodule
from sparsebit_tpu.quantization.modules.base import MultipleInputsQuantOpr


@register_qmodule(sources=[F.MatMul])
class MatMul(MultipleInputsQuantOpr):
    pass
