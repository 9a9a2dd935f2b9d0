"""Quantized normalization ops.

Reference: sparsebit/quantization/modules/normalization.py — BatchNorm is
wrapped but NOT quantized (it exists to be fused into the preceding conv);
LayerNorm is input-quantized only.
"""

from sparsebit_tpu.nn import modules as nn
from sparsebit_tpu.quantization.modules import register_qmodule
from sparsebit_tpu.quantization.modules.base import QuantOpr


@register_qmodule(sources=[nn.BatchNorm2d, nn.BatchNorm1d])
class QBatchNorm2d(QuantOpr):
    INPUT_QUANT = False
    WEIGHT_QUANT = False


@register_qmodule(sources=[nn.LayerNorm, nn.RMSNorm])
class QLayerNorm(QuantOpr):
    INPUT_QUANT = True
    WEIGHT_QUANT = False
