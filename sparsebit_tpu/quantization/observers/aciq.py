"""ACIQ observer: analytic clipping under Gaussian/Laplace assumptions.

Reference: sparsebit/quantization/observers/aciq.py:9-124 (alpha constant
tables per bit, half-range detection, batch-size-aware element count for
features).
"""

import math

import jax.numpy as jnp

from sparsebit_tpu.quantization.common import Granularity, QuantTarget
from sparsebit_tpu.quantization.observers import register_observer
from sparsebit_tpu.quantization.observers.base import Observer as BaseObserver

ALPHA_GAUS = {1: 1.24, 2: 1.71, 3: 2.15, 4: 2.55, 5: 2.93, 6: 3.28, 7: 3.61, 8: 3.92}
ALPHA_GAUS_POSITIVE = {
    1: 1.71, 2: 2.15, 3: 2.55, 4: 2.93, 5: 3.28, 6: 3.61, 7: 3.92, 8: 4.2,
}
ALPHA_LAPLACE = {
    0: 1.05, 1: 1.86, 2: 2.83, 3: 3.89, 4: 5.03, 5: 6.2, 6: 7.41, 7: 8.64, 8: 9.89,
}
ALPHA_LAPLACE_POSITIVE = {
    0: 1.86, 1: 2.83, 2: 3.89, 3: 5.02, 4: 6.2, 5: 7.41, 6: 8.64, 7: 9.89, 8: 11.16,
}
GAUS_CONST = (0.5 * 0.35) * (1 + (math.pi * math.log(4)) ** 0.5)


@register_observer
class Observer(BaseObserver):
    TYPE = "aciq"

    def __init__(self, config, qdesc):
        super().__init__(config, qdesc)
        self.distribution = config.OBSERVER.ACIQ.DISTRIBUTION.lower()
        assert self.distribution in (
            "gaus",
            "laplace",
        ), f"ACIQ distribution must be 'gaus' or 'laplace', got {self.distribution!r}"

    def calc_laplace_minmax(self):
        if self.is_perchannel:
            data = self.data_cache.get_data_for_calibration(Granularity.CHANNELWISE)
            b = jnp.mean(jnp.abs(data - data.mean(axis=1, keepdims=True)), axis=1)
        else:
            data = self.data_cache.get_data_for_calibration(Granularity.LAYERWISE)
            b = jnp.mean(jnp.abs(data - data.mean()))
        is_half_range = bool(data.min() >= 0)
        self.data_cache.reset()
        if (not self.qdesc.is_symmetric) and is_half_range:
            max_val = ALPHA_LAPLACE_POSITIVE[self.qdesc.bit] * b
            min_val = jnp.zeros_like(max_val)
        else:
            max_val = ALPHA_LAPLACE[self.qdesc.bit] * b
            min_val = -max_val
        return min_val, max_val

    def calc_gaus_minmax(self):
        batch_size = None
        if self.qdesc.target == QuantTarget.FEATURE:
            batch_size = self.data_cache.get_batch_size()
        if self.is_perchannel:
            data = self.data_cache.get_data_for_calibration(Granularity.CHANNELWISE)
            max_val = data.max(axis=1)
            min_val = data.min(axis=1)
        else:
            data = self.data_cache.get_data_for_calibration(Granularity.LAYERWISE)
            max_val = data.max()
            min_val = data.min()
        is_half_range = bool(data.min() >= 0)
        num_elements = data.size
        self.data_cache.reset()
        if self.qdesc.target == QuantTarget.FEATURE:
            num_elements /= batch_size
        std = ((max_val - min_val) * GAUS_CONST) / (
            (2 * math.log(num_elements)) ** 0.5
        )
        if (not self.qdesc.is_symmetric) and is_half_range:
            max_val = ALPHA_GAUS_POSITIVE[self.qdesc.bit] * std
            min_val = jnp.zeros_like(max_val)
        else:
            max_val = ALPHA_GAUS[self.qdesc.bit] * std
            min_val = -max_val
        return min_val, max_val

    def calc_minmax(self):
        if self.distribution == "laplace":
            min_val, max_val = self.calc_laplace_minmax()
        else:
            min_val, max_val = self.calc_gaus_minmax()
        self.min_val, self.max_val = min_val, max_val
        return min_val, max_val
