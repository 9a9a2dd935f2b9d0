"""Sparse conv (reference: sparsebit/sparse/modules/conv.py:8-44)."""

from sparsebit_tpu.nn import modules as nn
from sparsebit_tpu.sparse.modules import register_smodule
from sparsebit_tpu.sparse.modules.base import SparseOpr


@register_smodule(sources=[nn.Conv2d])
class SConv2d(SparseOpr):
    HAS_WEIGHT = True
    W_CH_AXIS = 3  # HWIO
