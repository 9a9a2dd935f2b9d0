"""Quantized linear (reference: sparsebit/quantization/modules/linear.py:8)."""

from sparsebit_tpu.nn import modules as nn
from sparsebit_tpu.quantization.modules import register_qmodule
from sparsebit_tpu.quantization.modules.base import QuantOpr


@register_qmodule(sources=[nn.Linear])
class QLinear(QuantOpr):
    WEIGHT_QUANT = True
    W_CH_AXIS = 1  # (in, out) weight layout: out-channel axis is 1
