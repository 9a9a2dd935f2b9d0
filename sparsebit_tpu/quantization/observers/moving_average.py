"""Moving-average (EMA) observer, feature-only.

Reference: sparsebit/quantization/observers/moving_average.py:19-34. The EMA
over per-sample min/max runs as one jitted ``lax.scan`` per cached batch.
"""

import jax
import jax.numpy as jnp

from sparsebit_tpu.quantization.common import QuantTarget
from sparsebit_tpu.quantization.observers import register_observer
from sparsebit_tpu.quantization.observers.base import Observer as BaseObserver


@register_observer
class Observer(BaseObserver):
    TYPE = "moving_average"

    def __init__(self, config, qdesc):
        super().__init__(config, qdesc)
        assert (
            self.qdesc.target == QuantTarget.FEATURE
        ), "Moving_average observer only support feature observing!"
        self.ema_ratio = config.OBSERVER.MOVING_AVERAGE.EMA_RATIO

    def calc_minmax(self):
        data = self.data_cache.get_data_cache()
        self.data_cache.reset()
        ratio = self.ema_ratio
        max_val, min_val = None, None
        for batch in data:
            if self.qdesc.bs_axis > 0:
                batch = jnp.swapaxes(batch, 0, self.qdesc.bs_axis)
            per_sample_max = batch.reshape(batch.shape[0], -1).max(axis=-1)
            per_sample_min = batch.reshape(batch.shape[0], -1).min(axis=-1)

            def ema(carry, xs):
                mx, mn = carry
                smax, smin = xs
                return (ratio * mx + (1 - ratio) * smax, ratio * mn + (1 - ratio) * smin), None

            if max_val is None:
                max_val, min_val = per_sample_max[0], per_sample_min[0]
                per_sample_max = per_sample_max[1:]
                per_sample_min = per_sample_min[1:]
            (max_val, min_val), _ = jax.lax.scan(
                ema, (max_val, min_val), (per_sample_max, per_sample_min)
            )
        self.min_val, self.max_val = min_val, max_val
        return min_val, max_val
