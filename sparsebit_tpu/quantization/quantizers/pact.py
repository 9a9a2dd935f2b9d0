"""PACT quantizer (learnable clip alpha, feature-only, per-tensor).

Reference: sparsebit/quantization/quantizers/pact.py:12-46.
"""

import jax
import jax.numpy as jnp

from sparsebit_tpu.quantization.common import QuantTarget
from sparsebit_tpu.quantization.fake_quant import fake_quant
from sparsebit_tpu.quantization.quantizers import register_quantizer
from sparsebit_tpu.quantization.quantizers.base import Quantizer as BaseQuantizer


@register_quantizer
class Quantizer(BaseQuantizer):
    TYPE = "pact"

    def __init__(self, config):
        super().__init__(config)
        assert (
            self.qdesc.target == QuantTarget.FEATURE
        ), "PACT only support feature quantization"
        assert not self.qdesc.is_perchannel, "PACT not yet supports per-channel"
        self.init_alpha_value = config.QUANTIZER.PACT.ALPHA_VALUE
        self.alpha = jnp.asarray(float(self.init_alpha_value))

    def calc_qparams(self):
        if self.fake_fused:
            return self.scale, self.zero_point
        scale, zero_point = self.observer.calc_qparams()
        self.scale = self._broadcast_qparams(scale)
        self.zero_point = self._broadcast_qparams(zero_point)
        self.alpha = jnp.asarray(float(self.init_alpha_value))
        return self.scale, self.zero_point

    def trainable_params(self):
        return {"alpha": self.alpha}

    def _qparams_preprocess(self, x, params):
        alpha = params.get("alpha", self.alpha) if params else self.alpha
        lower = -alpha if self.qdesc.qmin < 0 else jnp.zeros_like(alpha)
        # scale from the current clip range (alpha detached, pact.py:40-42)
        a = jax.lax.stop_gradient(alpha)
        lo = jax.lax.stop_gradient(lower)
        qmin, qmax = self.qdesc.qrange
        lo_neg = jnp.minimum(lo, 0.0)
        hi_pos = jnp.maximum(a, 0.0)
        if self.is_symmetric:
            hi_pos = jnp.maximum(-lo_neg, hi_pos)
            scale = jnp.maximum(hi_pos * 2.0 / (qmax - qmin), 1e-6)
            zp = jnp.zeros_like(scale)
        else:
            scale = jnp.maximum((hi_pos - lo_neg) / (qmax - qmin), 1e-6)
            zp = jnp.round(-lo_neg / scale)
        self._clip = (lower, alpha)
        return scale, zp

    def _forward(self, x, scale, zero_point, params=None):
        lower, alpha = self._clip
        # clip keeps gradients flowing to alpha for x > alpha (PACT's defining
        # gradient); fake_quant's STE handles the in-range rounding part.
        x_clamp = jnp.clip(x, lower, alpha)
        return fake_quant(x_clamp, scale, zero_point, self.qdesc.qmin, self.qdesc.qmax)
