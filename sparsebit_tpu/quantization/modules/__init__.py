"""QModule registry.

Reference: sparsebit/quantization/modules/__init__.py:4-53. ``QMODULE_MAP``
maps float op-module classes (from sparsebit_tpu.nn) to their quantized
wrappers; ``register_qmodule(sources=[...])`` populates it.
"""

QMODULE_MAP = {}


def register_qmodule(sources):
    def wrapper(qmodule_cls):
        for src in sources:
            QMODULE_MAP[src] = qmodule_cls
        qmodule_cls.SOURCES = sources
        return qmodule_cls

    return wrapper


from sparsebit_tpu.quantization.modules.base import (  # noqa: E402
    QuantOpr,
    MultipleInputsQuantOpr,
)
from sparsebit_tpu.quantization.modules import (  # noqa: E402,F401
    conv,
    linear,
    matmul,
    embedding,
    activations,
    math as math_ops,
    pool,
    normalization,
    unary,
    shape as shape_ops,
    resize,
)

# float modules that pass through conversion untouched (shape ops etc. —
# reference keeps a PASSTHROUGHT_MODULES tuple for its graph passes)
from sparsebit_tpu.nn import modules as _nn
from sparsebit_tpu.nn import functional as _F

PASSTHROUGH_MODULES = (
    _nn.MaxPool2d,
    _nn.Dropout,
    _nn.Flatten,
    _F.Reshape,
    _F.Transpose,
    _F.Permute,
    _F.Split,
    _F.Expand,
    _F.GetItem,
    _F.Concat,
    _F.Detach,
    _F.Cast,
    _F.Where,
)
