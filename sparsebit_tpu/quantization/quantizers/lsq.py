"""LSQ quantizer (Learned Step-size Quantization).

Reference: sparsebit/quantization/quantizers/lsq.py:13-76. The learnable scale
is exported through ``trainable_params`` and gradient-scaled with
``grad_scale`` (ratio 1/sqrt(N*qmax)), mirroring gs_scaling.
"""

import math
import warnings

import jax.numpy as jnp

from sparsebit_tpu.quantization.common import Granularity
from sparsebit_tpu.quantization.fake_quant import fake_quant, grad_scale
from sparsebit_tpu.quantization.quantizers import register_quantizer
from sparsebit_tpu.quantization.quantizers.base import Quantizer as BaseQuantizer


@register_quantizer
class Quantizer(BaseQuantizer):
    TYPE = "lsq"

    def __init__(self, config):
        super().__init__(config)
        self.init_params = False  # LSQ inits from calibration data

    def calc_qparams(self):
        if self.fake_fused:
            return self.scale, self.zero_point
        if not self.init_params:
            x_oc = self.observer.data_cache.get_data_for_calibration(
                Granularity.CHANNELWISE
            )
            if float(x_oc.min()) < 0 and not self.qdesc.is_symmetric:
                warnings.warn(
                    "Found data less than 0, reset quantizer scheme as symmetric"
                )
                self.qdesc.set_symmetric(True)
            if self.is_perchannel:
                scale = 2 * jnp.abs(x_oc).mean(axis=1) / math.sqrt(self.qdesc.qmax)
            else:
                scale = 2 * jnp.abs(x_oc).mean() / math.sqrt(self.qdesc.qmax)
            self.observer.data_cache.reset()
            self.scale = self._broadcast_qparams(scale)
            self.zero_point = jnp.zeros_like(self.scale)
            self.init_params = True
        return self.scale, self.zero_point

    def trainable_params(self):
        return {"scale": self.scale}

    def _qparams_preprocess(self, x, params):
        scale = params.get("scale", self.scale) if params else self.scale
        scale = jnp.abs(scale)
        zp = jnp.clip(self.zero_point, self.qdesc.qmin, self.qdesc.qmax)
        return scale, zp

    def _forward(self, x, scale, zero_point, params=None):
        if self.is_perchannel:
            num_perchannel = x.size / x.shape[self.qdesc.ch_axis]
            gs_ratio = 1.0 / math.sqrt(num_perchannel * self.qdesc.qmax)
        else:
            gs_ratio = 1.0 / math.sqrt(x.size * self.qdesc.qmax)
        scale = grad_scale(scale, gs_ratio)
        return fake_quant(x, scale, zero_point, self.qdesc.qmin, self.qdesc.qmax)
