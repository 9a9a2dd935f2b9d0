"""Quantized conv ops (reference: sparsebit/quantization/modules/conv.py:8-82)."""

from sparsebit_tpu.nn import modules as nn
from sparsebit_tpu.quantization.modules import register_qmodule
from sparsebit_tpu.quantization.modules.base import QuantOpr


@register_qmodule(sources=[nn.Conv2d])
class QConv2d(QuantOpr):
    WEIGHT_QUANT = True
    W_CH_AXIS = 3  # HWIO weight layout: out-channel axis is 3


@register_qmodule(sources=[nn.ConvTranspose2d])
class QConvTranspose2d(QuantOpr):
    WEIGHT_QUANT = True
    W_CH_AXIS = 3  # (kh, kw, oc//g, ic): torch layout axis-0 (in) maps to 3
