"""Sparse linear (reference: sparsebit/sparse/modules/linear.py:8-35)."""

from sparsebit_tpu.nn import modules as nn
from sparsebit_tpu.sparse.modules import register_smodule
from sparsebit_tpu.sparse.modules.base import SparseOpr


@register_smodule(sources=[nn.Linear])
class SLinear(SparseOpr):
    HAS_WEIGHT = True
    W_CH_AXIS = 1  # (in, out)
