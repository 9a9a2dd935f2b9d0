"""SparseOpr base: wraps a float module with pruning-mask buffers.

Reference: sparsebit/sparse/modules/conv.py:8-44 (w_mask/b_mask buffers,
masked forward). Masks are plain jnp arrays threaded through the params
pytree, so the masked forward stays pure and jit-friendly; XLA fuses the
mask multiply into the conv/matmul producer.
"""

import jax.numpy as jnp

from sparsebit_tpu.nn.modules import Module
from sparsebit_tpu.sparse.sparsers import build_sparser


class SparseOpr(Module):
    HAS_WEIGHT = False
    W_CH_AXIS = 0  # out-channel axis of the wrapped module's weight layout

    def __init__(self, org_module, config=None):
        super().__init__()
        self.module = org_module
        self.sparser = None
        self._sparse_config = config
        if self.HAS_WEIGHT:
            w = org_module._params.get("weight")
            self.buffer("w_mask", jnp.ones_like(w))
            b = org_module._params.get("bias")
            self.buffer("b_mask", jnp.ones_like(b) if b is not None else None)

    def build_sparser(self, config):
        if self.HAS_WEIGHT:
            self.sparser = build_sparser(config)

    def set_ratio(self, ratio):
        if self.sparser is not None:
            self.sparser.ratio = float(ratio)

    def calc_mask(self):
        """Compute and store masks; returns the channel mask (structured) or
        None (unstructured)."""
        if self.sparser is None:
            return None
        w = self.module._params["weight"]
        w_mask, ch_mask = self.sparser.calc_mask(w, self.W_CH_AXIS)
        self._buffers["w_mask"] = w_mask
        if ch_mask is not None and self._buffers.get("b_mask") is not None:
            self._buffers["b_mask"] = ch_mask
        return ch_mask

    # ---- state -------------------------------------------------------------
    def state_dict(self):
        out = dict(self.module.state_dict())
        for k in ("w_mask", "b_mask"):
            v = self._buffers.get(k)
            if v is not None:
                out[k] = v
        return out

    def load_state_dict(self, sd):
        masks = {k: v for k, v in sd.items() if k in ("w_mask", "b_mask")}
        rest = {k: v for k, v in sd.items() if k not in masks}
        if rest:
            self.module.load_state_dict(rest)
        for k, v in masks.items():
            self._buffers[k] = jnp.asarray(v)

    def _masked_params(self, params):
        params = dict(params or {})
        w_mask = params.pop("w_mask", self._buffers.get("w_mask"))
        b_mask = params.pop("b_mask", self._buffers.get("b_mask"))
        w = self.module.get(params if params else None, "weight")
        params["weight"] = w * w_mask
        if b_mask is not None and self.module._params.get("bias") is not None:
            b = self.module.get(params if params else None, "bias")
            params["bias"] = b * b_mask
        return params

    def execute(self, x, *args, params=None, training=False, **kwargs):
        if self.HAS_WEIGHT:
            params = self._masked_params(params)
        return self.module.execute(
            x, *args, params=params, training=training, **kwargs
        )

    def __repr__(self):
        return "<S{}>".format(type(self.module).__name__)
