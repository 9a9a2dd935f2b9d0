"""QuantOpr base classes.

Reference: sparsebit/quantization/modules/base.py:9-109. A QuantOpr wraps a
float op-module, owning an ``input_quantizer`` (from the A config) and, when
the op has a weight, a ``weight_quantizer`` (from the W config). The wrapped
module's parameters remain the source of truth; at execute time the weight is
fake-quantized and passed down as a parameter override, keeping the whole
path pure and jittable.

``params`` at execute time is a flat dict that may contain:
  - the wrapped module's params ("weight", "bias", ...)
  - quantizer learnables, prefixed: "input_quantizer.scale",
    "weight_quantizer.v", ... (QAT path)
"""

import jax.numpy as jnp

from sparsebit_tpu.nn.modules import Module
from sparsebit_tpu.quantization.common import QuantTarget
from sparsebit_tpu.quantization.quantizers import build_quantizer


def _split_params(params):
    if not params:
        return None, None, None
    mparams, iqp, wqp = {}, {}, {}
    for k, v in params.items():
        if k.startswith("input_quantizer."):
            iqp[k[len("input_quantizer.") :]] = v
        elif k.startswith("weight_quantizer."):
            wqp[k[len("weight_quantizer.") :]] = v
        else:
            mparams[k] = v
    return mparams or None, iqp or None, wqp or None


class QuantOpr(Module):
    """Single-input quantized op wrapper."""

    WEIGHT_QUANT = False  # subclass sets True when the op has a weight
    W_CH_AXIS = 0  # out-channel axis of the wrapped module's weight layout
    INPUT_QUANT = True

    def __init__(self, org_module, config=None):
        super().__init__()
        self.module = org_module
        self.input_quantizer = None
        self.weight_quantizer = None
        self._quant_config = config

    # ---- quantizer construction (reference base.py:36-54) ------------------
    def build_quantizer(self, config):
        if self.INPUT_QUANT:
            acfg = config.A.clone()
            acfg.defrost()
            acfg.TARGET = [QuantTarget.FEATURE]
            acfg.freeze()
            self.input_quantizer = build_quantizer(acfg)
        if self.WEIGHT_QUANT:
            wcfg = config.W.clone()
            wcfg.defrost()
            wcfg.TARGET = [QuantTarget.WEIGHT]
            wcfg.freeze()
            self.weight_quantizer = build_quantizer(wcfg)
            self.weight_quantizer.set_ch_axis(self.W_CH_AXIS)

    def set_quant(self, w_quant=False, a_quant=False):
        if self.weight_quantizer is not None:
            (self.weight_quantizer.enable_quant() if w_quant
             else self.weight_quantizer.disable_quant())
        if self.input_quantizer is not None:
            (self.input_quantizer.enable_quant() if a_quant
             else self.input_quantizer.disable_quant())

    def train(self, mode=True):
        super().train(mode)
        for q in (self.input_quantizer, self.weight_quantizer):
            if q is not None:
                q.train(mode)
        return self

    # ---- state ------------------------------------------------------------
    def state_dict(self):
        out = dict(self.module.state_dict())
        for prefix, q in (
            ("input_quantizer", self.input_quantizer),
            ("weight_quantizer", self.weight_quantizer),
        ):
            if q is not None and q.is_enable:
                out["{}.scale".format(prefix)] = q.scale
                out["{}.zero_point".format(prefix)] = q.zero_point
                for k, v in q.trainable_params().items():
                    if k not in ("scale", "zero_point") and v is not None:
                        out["{}.{}".format(prefix, k)] = v
        return out

    def load_state_dict(self, sd):
        mparams, iqp, wqp = _split_params(sd)
        if mparams:
            self.module.load_state_dict(mparams)
        for q, p in ((self.input_quantizer, iqp), (self.weight_quantizer, wqp)):
            if q is not None and p:
                for k, v in p.items():
                    setattr(q, k, jnp.asarray(v))

    def trainable_params(self):
        """QAT learnables: wrapped weights + quantizer learnables."""
        out = dict(self.module.state_dict())
        for prefix, q in (
            ("input_quantizer", self.input_quantizer),
            ("weight_quantizer", self.weight_quantizer),
        ):
            if q is not None and q.is_enable:
                for k, v in q.trainable_params().items():
                    out["{}.{}".format(prefix, k)] = v
        return out

    def get_weight(self):
        return self.module._params.get("weight")

    # ---- execution ---------------------------------------------------------
    def execute(self, x, *args, params=None, training=False, **kwargs):
        mparams, iqp, wqp = _split_params(params)
        if self.input_quantizer is not None:
            x = self.input_quantizer(x, iqp)
        if (
            self.weight_quantizer is not None
            and self.weight_quantizer.is_enable
        ):
            w = self.module.get(mparams, "weight")
            wq = self.weight_quantizer(w, wqp)
            mparams = dict(mparams or {})
            mparams["weight"] = wq
        return self.module.execute(
            x, *args, params=mparams, training=training, **kwargs
        )

    def __repr__(self):
        parts = [type(self).__name__]
        if self.input_quantizer is not None and self.input_quantizer.is_enable:
            parts.append("a{}bit".format(self.input_quantizer.bit))
        if self.weight_quantizer is not None and self.weight_quantizer.is_enable:
            parts.append("w{}bit".format(self.weight_quantizer.bit))
        return "<{}>".format(" ".join(parts))


class MultipleInputsQuantOpr(QuantOpr):
    """Multi-input op (Add/Concat/MatMul...): no own input quantizer; the
    QuantModel inserts a QIdentity on each input edge instead
    (reference base.py:76-109 + quant_model.py:126-137)."""

    INPUT_QUANT = False

    def build_quantizer(self, config):
        pass  # inputs get their own QIdentity nodes

    def execute(self, *args, params=None, training=False, **kwargs):
        mparams, _, _ = _split_params(params)
        return self.module.execute(
            *args, params=mparams, training=training, **kwargs
        )
