"""LSQ+ quantizer (learnable scale and zero-point).

Reference: sparsebit/quantization/quantizers/lsq_plus.py:13-82. Weight:
per-channel symmetric, scale init from mean±3std; activation: per-tensor
affine, scale/zp init from the observer; both gradient-scaled.
"""

import math

import jax.numpy as jnp

from sparsebit_tpu.quantization.common import Granularity
from sparsebit_tpu.quantization.fake_quant import fake_quant, grad_scale
from sparsebit_tpu.quantization.quantizers import register_quantizer
from sparsebit_tpu.quantization.quantizers.base import Quantizer as BaseQuantizer


@register_quantizer
class Quantizer(BaseQuantizer):
    TYPE = "lsq+"

    def __init__(self, config):
        super().__init__(config)
        self.init_params = False
        self._zp_learnable = False

    def calc_qparams(self):
        if self.fake_fused:
            return self.scale, self.zero_point
        if not self.init_params:
            if self.is_perchannel:
                x_oc = self.observer.data_cache.get_data_for_calibration(
                    Granularity.CHANNELWISE
                )
                assert (
                    self.is_symmetric
                ), "LSQ+ only support per-channel-symmetric quant for weight"
                mean, std = x_oc.mean(axis=1), x_oc.std(axis=1)
                scale = (
                    2
                    * jnp.maximum(jnp.abs(mean - 3 * std), jnp.abs(mean + 3 * std))
                    / (self.qdesc.qmax - self.qdesc.qmin)
                )
                self.observer.data_cache.reset()
                self.scale = self._broadcast_qparams(scale)
                self.zero_point = jnp.zeros_like(self.scale)
                self._zp_learnable = False
            else:
                assert (
                    not self.is_symmetric
                ), "LSQ+ only support per-tensor-affine quant for activation"
                scale, zero_point = self.observer.calc_qparams()
                self.scale = self._broadcast_qparams(scale)
                zero_point = jnp.clip(zero_point, self.qdesc.qmin, self.qdesc.qmax)
                self.zero_point = self._broadcast_qparams(zero_point)
                self._zp_learnable = True
            self.init_params = True
        return self.scale, self.zero_point

    def trainable_params(self):
        out = {"scale": self.scale}
        if self._zp_learnable:
            out["zero_point"] = self.zero_point
        return out

    def _qparams_preprocess(self, x, params):
        scale = params.get("scale", self.scale) if params else self.scale
        zp = params.get("zero_point", self.zero_point) if params else self.zero_point
        return jnp.abs(scale), jnp.clip(zp, self.qdesc.qmin, self.qdesc.qmax)

    def _forward(self, x, scale, zero_point, params=None):
        if self.is_perchannel:
            num_perchannel = x.size / x.shape[self.qdesc.ch_axis]
            gs_ratio = 1.0 / math.sqrt(num_perchannel * self.qdesc.qmax)
        else:
            gs_ratio = 1.0 / math.sqrt(x.size * self.qdesc.qmax)
        scale = grad_scale(scale, gs_ratio)
        if self._zp_learnable:
            zero_point = grad_scale(zero_point, gs_ratio)
        return fake_quant(x, scale, zero_point, self.qdesc.qmin, self.qdesc.qmax)
