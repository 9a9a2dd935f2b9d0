"""Random sparser — baseline criterion for ablations (TPU-build extension)."""

import jax
import jax.numpy as jnp

from sparsebit_tpu.sparse.sparsers import register_sparser
from sparsebit_tpu.sparse.sparsers.base import Sparser


@register_sparser
class RandomSparser(Sparser):
    TYPE = "random"

    def __init__(self, config):
        super().__init__(config)
        self._key = jax.random.PRNGKey(0)

    def _scores(self, shape):
        self._key, sub = jax.random.split(self._key)
        return jax.random.uniform(sub, shape)

    def element_scores(self, weight):
        return self._scores(weight.shape)

    def channel_scores(self, weight, ch_axis):
        return self._scores((weight.shape[ch_axis],))
