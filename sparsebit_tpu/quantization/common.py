"""Common enums and qscheme helpers.

TPU-native re-design of sparsebit/quantization/common.py:5-51. Instead of torch
qscheme enums we carry an explicit (perchannel, symmetric) ``QScheme``.
"""

from enum import Enum


class Granularity(Enum):
    LAYERWISE = 0
    CHANNELWISE = 1
    GROUPWISE = 2  # TPU extension: groupsize quant (GPTQ) in the same core


class QuantTarget(Enum):
    WEIGHT = 0
    FEATURE = 1


class Backend(Enum):
    VIRTUAL = 0
    ONNXRUNTIME = 1
    TENSORRT = 2
    TPU = 3  # native backend: lowers to fused Pallas quantize-matmul kernels


class QScheme(Enum):
    PER_TENSOR_SYMMETRIC = 0
    PER_TENSOR_AFFINE = 1
    PER_CHANNEL_SYMMETRIC = 2
    PER_CHANNEL_AFFINE = 3

    @property
    def is_perchannel(self):
        return self in (QScheme.PER_CHANNEL_SYMMETRIC, QScheme.PER_CHANNEL_AFFINE)

    @property
    def is_symmetric(self):
        return self in (QScheme.PER_TENSOR_SYMMETRIC, QScheme.PER_CHANNEL_SYMMETRIC)


def get_backend(backend: str) -> Backend:
    mapping = {
        "virtual": Backend.VIRTUAL,
        "onnxruntime": Backend.ONNXRUNTIME,
        "tensorrt": Backend.TENSORRT,
        "tpu": Backend.TPU,
    }
    if backend not in mapping:
        raise TypeError(
            "only support backend in {}, not {}".format(list(mapping), backend)
        )
    return mapping[backend]


def get_qscheme(qscheme: str) -> QScheme:
    mapping = {
        "per-tensor-symmetric": QScheme.PER_TENSOR_SYMMETRIC,
        "per-tensor-affine": QScheme.PER_TENSOR_AFFINE,
        "per-channel-symmetric": QScheme.PER_CHANNEL_SYMMETRIC,
        "per-channel-affine": QScheme.PER_CHANNEL_AFFINE,
    }
    if qscheme not in mapping:
        raise TypeError(
            "only support a qscheme equals to per-[tensor/channel]-[affine/symmetric]"
            ", not {}".format(qscheme)
        )
    return mapping[qscheme]


def make_qscheme(perchannel: bool, symmetric: bool) -> QScheme:
    return {
        (True, True): QScheme.PER_CHANNEL_SYMMETRIC,
        (True, False): QScheme.PER_CHANNEL_AFFINE,
        (False, True): QScheme.PER_TENSOR_SYMMETRIC,
        (False, False): QScheme.PER_TENSOR_AFFINE,
    }[(perchannel, symmetric)]
