"""Network-slimming sparser (Liu et al., ICCV'17) — structured channel pruning
ranked by the following BatchNorm's |gamma| (TPU-build extension; the
reference README lists slimming as planned, sparse/readme.md).

The SparseModel injects the successor BN's gamma via ``set_bn_weight`` before
calling ``calc_mask``; without a BN the criterion falls back to weight L1.
"""

import jax.numpy as jnp

from sparsebit_tpu.sparse.sparsers import register_sparser
from sparsebit_tpu.sparse.sparsers.base import Sparser


@register_sparser
class SlimmingSparser(Sparser):
    TYPE = "slimming"

    def __init__(self, config):
        super().__init__(config)
        self.bn_weight = None

    def set_bn_weight(self, gamma):
        self.bn_weight = gamma

    def element_scores(self, weight):
        return jnp.abs(weight)

    def channel_scores(self, weight, ch_axis):
        if self.bn_weight is not None:
            return jnp.abs(self.bn_weight)
        axes = tuple(i for i in range(weight.ndim) if i != ch_axis)
        return jnp.sum(jnp.abs(weight), axis=axes)
