"""L2-norm sparser (TPU-build extension; the reference README lists more
criteria than it ships — sparse/readme.md. Same interface as l1norm)."""

import jax.numpy as jnp

from sparsebit_tpu.sparse.sparsers import register_sparser
from sparsebit_tpu.sparse.sparsers.base import Sparser


@register_sparser
class L2NormSparser(Sparser):
    TYPE = "l2norm"

    def element_scores(self, weight):
        return jnp.square(weight)

    def channel_scores(self, weight, ch_axis):
        axes = tuple(i for i in range(weight.ndim) if i != ch_axis)
        return jnp.sqrt(jnp.sum(jnp.square(weight), axis=axes))
