"""Observer base + DataCache.

TPU-native counterpart of sparsebit/quantization/observers/base.py:7-87.
Calibration statistics are computed with pure jnp functions on device; the
DataCache keeps raw activation/weight arrays (device-resident) and flattens
them per-channel or per-layer on demand.
"""

import jax.numpy as jnp

from sparsebit_tpu.quantization.common import Granularity, QuantTarget


class DataCache:
    def __init__(self, qdesc):
        self.qdesc = qdesc
        self._data_cache = []

    def update(self, data):
        self._data_cache.append(jnp.asarray(data))

    def reset(self):
        self._data_cache = []

    def __len__(self):
        return len(self._data_cache)

    def get_data_for_calibration(self, granularity: Granularity):
        """Flatten the cache to (C, N) for CHANNELWISE or (N,) for LAYERWISE.

        Mirrors observers/base.py:21-36: channelwise concatenates along
        ch_axis, moves that axis first, and flattens the rest.
        """
        assert len(self._data_cache), "No data cached!"
        assert granularity in (Granularity.LAYERWISE, Granularity.CHANNELWISE)
        if granularity == Granularity.CHANNELWISE:
            ch_axis = self.qdesc.ch_axis
            if ch_axis >= self._data_cache[0].ndim:
                # channels-last layouts (NHWC ch_axis=3 / NLC ch_axis=2) on
                # lower-rank data (e.g. a pooled (B, C) fc input): the
                # channel axis is simply the last one
                ch_axis = self._data_cache[0].ndim - 1
            data = jnp.concatenate(self._data_cache, axis=ch_axis)
            if ch_axis != 0:
                data = jnp.swapaxes(data, 0, ch_axis)
            data = data.reshape(data.shape[0], -1)
        else:
            data = jnp.concatenate([d.reshape(-1) for d in self._data_cache], axis=0)
        return data

    def get_batch_size(self):
        if self.qdesc.target == QuantTarget.WEIGHT:
            return None
        return sum(int(d.shape[self.qdesc.bs_axis]) for d in self._data_cache)

    def get_data_cache(self):
        assert len(self._data_cache), "No data cached!"
        return self._data_cache


class Observer:
    TYPE = "base"

    def __init__(self, config, qdesc):
        self.cfg = config
        self.qdesc = qdesc
        self.min_val = None
        self.max_val = None
        self.data_cache = DataCache(qdesc)

    def update(self, data):
        self.data_cache.update(data)

    def calc_minmax(self):
        raise NotImplementedError

    def calc_qparams(self):
        min_val, max_val = self.calc_minmax()
        scale, zero_point = self.calc_qparams_with_minmax(min_val, max_val)
        return scale, zero_point

    def calc_qparams_with_minmax(self, min_val, max_val):
        """scale/zp math, mirroring observers/base.py:63-79 (min scale 1e-6)."""
        min_val = jnp.asarray(min_val, dtype=jnp.float32)
        max_val = jnp.asarray(max_val, dtype=jnp.float32)
        min_val_neg = jnp.minimum(min_val, 0.0)
        max_val_pos = jnp.maximum(max_val, 0.0)
        qmin, qmax = self.qdesc.qrange
        if self.is_symmetric:
            max_val_pos = jnp.maximum(-min_val_neg, max_val_pos)
            scale = max_val_pos * 2.0 / float(qmax - qmin)
            scale = jnp.maximum(scale, 1e-6)
            zero_point = jnp.zeros_like(scale)
        else:
            scale = (max_val_pos - min_val_neg) / float(qmax - qmin)
            scale = jnp.maximum(scale, 1e-6)
            zero_point = jnp.round(-min_val_neg / scale)
        return scale, zero_point

    @property
    def is_perchannel(self):
        return self.qdesc.is_perchannel

    @property
    def is_symmetric(self):
        return self.qdesc.is_symmetric
