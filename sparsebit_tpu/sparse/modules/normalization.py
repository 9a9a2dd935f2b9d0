"""Sparse BatchNorm: receives the channel mask of its producer conv/linear
(reference: sparsebit/sparse/modules/normalization.py:8-28)."""

import jax.numpy as jnp

from sparsebit_tpu.nn import modules as nn
from sparsebit_tpu.sparse.modules import register_smodule
from sparsebit_tpu.sparse.modules.base import SparseOpr


@register_smodule(sources=[nn.BatchNorm2d, nn.BatchNorm1d])
class SBatchNorm2d(SparseOpr):
    HAS_WEIGHT = False

    def __init__(self, org_module, config=None):
        super().__init__(org_module, config)
        self.buffer("ch_mask", jnp.ones(org_module.num_features))

    def set_channel_mask(self, ch_mask):
        self._buffers["ch_mask"] = jnp.asarray(ch_mask, jnp.float32)

    def state_dict(self):
        out = dict(self.module.state_dict())
        out["ch_mask"] = self._buffers["ch_mask"]
        return out

    def load_state_dict(self, sd):
        sd = dict(sd)
        if "ch_mask" in sd:
            self._buffers["ch_mask"] = jnp.asarray(sd.pop("ch_mask"))
        if sd:
            self.module.load_state_dict(sd)

    def execute(self, x, *args, params=None, training=False, **kwargs):
        params = dict(params or {})
        ch_mask = params.pop("ch_mask", self._buffers["ch_mask"])
        out = self.module.execute(
            x, *args, params=params or None, training=training, **kwargs
        )
        return out * ch_mask
