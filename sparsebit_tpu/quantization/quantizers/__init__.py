"""Quantizer registry (reference: sparsebit/quantization/quantizers/__init__.py:4-28)."""

QUANTIZERS_MAP = {}


def register_quantizer(quantizer_cls):
    QUANTIZERS_MAP[quantizer_cls.TYPE.lower()] = quantizer_cls
    return quantizer_cls


from sparsebit_tpu.quantization.quantizers.base import Quantizer  # noqa: E402
from sparsebit_tpu.quantization.quantizers import (  # noqa: E402,F401
    uniform,
    lsq,
    lsq_plus,
    pact,
    dorefa,
    adaround,
)


def build_quantizer(cfg):
    quantizer_type = cfg.QUANTIZER.TYPE.lower()
    assert quantizer_type in QUANTIZERS_MAP, "no quantizer named {}".format(
        quantizer_type
    )
    return QUANTIZERS_MAP[quantizer_type](cfg)
