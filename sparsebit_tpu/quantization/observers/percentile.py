"""Percentile observer: clip alpha-fraction of each tail.

Reference: sparsebit/quantization/observers/percentile.py:16-46 (per-channel
kthvalue over positive/negative halves separately). TPU-native change: one
vectorized sort + take_along_axis replaces the per-channel Python loop.
"""

import jax.numpy as jnp

from sparsebit_tpu.quantization.common import Granularity
from sparsebit_tpu.quantization.observers import register_observer
from sparsebit_tpu.quantization.observers.base import Observer as BaseObserver


@register_observer
class Observer(BaseObserver):
    TYPE = "percentile"

    def __init__(self, config, qdesc):
        super().__init__(config, qdesc)
        self.alpha = config.OBSERVER.PERCENTILE.ALPHA

    def calc_minmax(self):
        if self.is_perchannel:
            data = self.data_cache.get_data_for_calibration(Granularity.CHANNELWISE)
        else:
            data = self.data_cache.get_data_for_calibration(
                Granularity.LAYERWISE
            ).reshape(1, -1)
        self.data_cache.reset()

        n = data.shape[1]
        neg_length = jnp.sum(data < 0, axis=-1)
        pos_length = jnp.sum(data >= 0, axis=-1)
        data_sorted = jnp.sort(data, axis=-1)

        # kthvalue(x, k) == sorted[k-1]. max: k = n - round(pos*alpha);
        # min: k = max(round(neg*alpha), 1). (percentile.py:33-43)
        k_max = n - jnp.maximum(jnp.round(pos_length * self.alpha), 0).astype(jnp.int32)
        k_min = jnp.maximum(jnp.round(neg_length * self.alpha), 1).astype(jnp.int32)
        max_val = jnp.take_along_axis(
            data_sorted, jnp.clip(k_max - 1, 0, n - 1)[:, None], axis=-1
        )[:, 0]
        min_val = jnp.take_along_axis(
            data_sorted, jnp.clip(k_min - 1, 0, n - 1)[:, None], axis=-1
        )[:, 0]
        max_val = jnp.where(pos_length > 0, max_val, 0.0)
        min_val = jnp.where(neg_length > 0, min_val, 0.0)

        if not self.is_perchannel:
            min_val, max_val = min_val[0], max_val[0]
        self.min_val, self.max_val = min_val, max_val
        return min_val, max_val
