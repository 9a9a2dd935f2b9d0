"""DoReFa quantizer: tanh-normalize then STE fake-quant.

Reference: sparsebit/quantization/quantizers/dorefa.py:8-27 (observer sees the
normalized tensor, matching update_observer override).
"""

import jax
import jax.numpy as jnp

from sparsebit_tpu.quantization.fake_quant import fake_quant
from sparsebit_tpu.quantization.quantizers import register_quantizer
from sparsebit_tpu.quantization.quantizers.base import Quantizer as BaseQuantizer


@register_quantizer
class Quantizer(BaseQuantizer):
    TYPE = "dorefa"

    def _forward(self, x, scale, zero_point, params=None):
        x_tanhed = jnp.tanh(x)
        x_normed = x_tanhed / jax.lax.stop_gradient(jnp.abs(x_tanhed).max())
        return fake_quant(
            x_normed, self.scale, self.zero_point, self.qdesc.qmin, self.qdesc.qmax
        )

    def update_observer(self, x):
        self.dims = jnp.ndim(x)
        x = jax.lax.stop_gradient(x)
        x_tanhed = jnp.tanh(x)
        x_normed = x_tanhed / jnp.abs(x_tanhed).max()
        self.observer.update(x_normed)
