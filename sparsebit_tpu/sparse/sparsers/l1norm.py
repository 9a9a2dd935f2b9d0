"""L1-norm sparser (reference: sparsebit/sparse/sparsers/l1norm.py:8-43).

unstructure: |w| thresholded at the RATIO quantile.
structure: channels ranked by their L1 norm; lowest RATIO fraction pruned.
"""

import jax.numpy as jnp

from sparsebit_tpu.sparse.sparsers import register_sparser
from sparsebit_tpu.sparse.sparsers.base import Sparser


@register_sparser
class L1NormSparser(Sparser):
    TYPE = "l1norm"

    def element_scores(self, weight):
        return jnp.abs(weight)

    def channel_scores(self, weight, ch_axis):
        axes = tuple(i for i in range(weight.ndim) if i != ch_axis)
        return jnp.sum(jnp.abs(weight), axis=axes)
