"""MSE observer: 80-step shrink-grid search minimizing fake-quant MSE.

Reference: sparsebit/quantization/observers/mse.py:28-63. TPU-native changes:
the grid search runs as a single jitted ``lax.scan`` on device (per-channel
vectorized), instead of an 80-iteration Python loop.
"""

from functools import partial

import jax
import jax.numpy as jnp

from sparsebit_tpu.quantization.common import Granularity
from sparsebit_tpu.quantization.fake_quant import fake_quant
from sparsebit_tpu.quantization.observers import register_observer
from sparsebit_tpu.quantization.observers.base import Observer as BaseObserver


@partial(jax.jit, static_argnums=(3, 4, 5))
def _mse_grid_search(data, min_val, max_val, qmin, qmax, symmetric):
    """data: (C, N); min/max: (C,). Returns best (scale, zero_point) per row."""

    def qparams(lo, hi):
        lo_neg = jnp.minimum(lo, 0.0)
        hi_pos = jnp.maximum(hi, 0.0)
        if symmetric:
            hi_pos = jnp.maximum(-lo_neg, hi_pos)
            scale = jnp.maximum(hi_pos * 2.0 / (qmax - qmin), 1e-6)
            zp = jnp.zeros_like(scale)
        else:
            scale = jnp.maximum((hi_pos - lo_neg) / (qmax - qmin), 1e-6)
            zp = jnp.round(-lo_neg / scale)
        return scale, zp

    def step(carry, shrink):
        best_scale, best_zp, best_loss = carry
        scale, zp = qparams(min_val * shrink, max_val * shrink)
        dq = fake_quant(data, scale[:, None], zp[:, None], qmin, qmax)
        loss = jnp.mean((data - dq) ** 2, axis=-1)
        better = loss < best_loss
        return (
            jnp.where(better, scale, best_scale),
            jnp.where(better, zp, best_zp),
            jnp.where(better, loss, best_loss),
        ), None

    shrinks = 1.0 - jnp.arange(80, dtype=jnp.float32) * 0.01
    c = data.shape[0]
    init = (
        jnp.ones((c,), jnp.float32),
        jnp.zeros((c,), jnp.float32),
        jnp.full((c,), 1e10, jnp.float32),
    )
    (best_scale, best_zp, _), _ = jax.lax.scan(step, init, shrinks)
    return best_scale, best_zp


@register_observer
class Observer(BaseObserver):
    TYPE = "mse"

    def calc_minmax(self, data_c_first):
        if self.is_perchannel:
            max_val = data_c_first.max(axis=1)
            min_val = data_c_first.min(axis=1)
        else:
            min_val, max_val = data_c_first.min(), data_c_first.max()
        self.min_val, self.max_val = min_val, max_val
        return min_val, max_val

    def calc_qparams(self):
        data_c_first = self.data_cache.get_data_for_calibration(
            Granularity.CHANNELWISE
        )
        self.data_cache.reset()
        min_val, max_val = self.calc_minmax(data_c_first)
        qmin, qmax = self.qdesc.qrange
        if self.is_perchannel:
            scale, zp = _mse_grid_search(
                data_c_first, min_val, max_val, qmin, qmax, self.is_symmetric
            )
        else:
            flat = data_c_first.reshape(1, -1)
            scale, zp = _mse_grid_search(
                flat,
                min_val.reshape(1),
                max_val.reshape(1),
                qmin,
                qmax,
                self.is_symmetric,
            )
            scale, zp = scale[0], zp[0]
        return scale, zp
