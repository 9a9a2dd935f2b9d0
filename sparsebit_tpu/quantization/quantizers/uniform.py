"""Uniform (pure STE) quantizer (reference: quantizers/uniform.py:7-16)."""

from sparsebit_tpu.quantization.quantizers import register_quantizer
from sparsebit_tpu.quantization.quantizers.base import Quantizer as BaseQuantizer


@register_quantizer
class Quantizer(BaseQuantizer):
    TYPE = "uniform"
