"""Quantizer base class.

TPU-native counterpart of sparsebit/quantization/quantizers/base.py:10-143.
State (scale/zero_point and any QAT learnables) is held as jnp arrays; for
jitted/QAT execution the learnables are exported as a params dict and passed
back through ``__call__(x, params=...)`` so gradients flow functionally.
"""

import jax
import jax.numpy as jnp

from sparsebit_tpu.quantization.common import Backend, QuantTarget
from sparsebit_tpu.quantization.fake_quant import fake_quant
from sparsebit_tpu.quantization.observers import build_observer
from sparsebit_tpu.quantization.quant_descriptor import QuantDescriptor


class Quantizer:
    TYPE = "base"

    def __init__(self, config):
        self.cfg = config
        self.qdesc = QuantDescriptor(config)
        self.observer = build_observer(config, self.qdesc)
        self.backend = Backend.VIRTUAL
        self.is_enable = False
        self.fake_fused = False  # permanently disabled (base.py:74-80)
        self.training = False
        self.dims = None  # rank of the observed tensor, for qparam broadcast
        self.scale = jnp.ones(())
        self.zero_point = jnp.zeros(())

    # ---- calibration ------------------------------------------------------
    def update_observer(self, x):
        self.dims = jnp.ndim(x)
        self.observer.update(jax.lax.stop_gradient(x))

    def calc_qparams(self):
        if self.fake_fused:
            return self.scale, self.zero_point
        scale, zero_point = self.observer.calc_qparams()
        self.scale = self._broadcast_qparams(scale)
        self.zero_point = self._broadcast_qparams(zero_point)
        return self.scale, self.zero_point

    def _broadcast_qparams(self, params):
        """Reshape per-channel qparams to rank of data with C on ch_axis
        (reference base.py:97-109)."""
        params = jnp.asarray(params, jnp.float32)
        if not self.qdesc.is_perchannel or params.ndim == 0:
            return params.reshape(())
        assert self.dims is not None, "call update_observer before calc_qparams"
        shape = [1] * self.dims
        ch_axis = self.qdesc.ch_axis
        if ch_axis >= self.dims:
            ch_axis = self.dims - 1  # channels-last on lower-rank data
        shape[ch_axis] = -1
        return params.reshape(shape)

    # ---- state toggles ----------------------------------------------------
    def set_fake_fused(self):
        self.fake_fused = True
        self.is_enable = False

    def enable_quant(self):
        if not self.fake_fused:
            self.is_enable = True

    def disable_quant(self):
        self.is_enable = False

    def set_bit(self, bit):
        self.qdesc.set_bit(bit)

    def set_backend(self, backend):
        self.backend = backend

    def set_ch_axis(self, axis):
        """Override the weight out-channel axis for this op's weight layout
        (HWIO conv -> 3, (in,out) linear -> 1); descriptor default is 0."""
        self.qdesc._ch_axis = axis

    def train(self, mode=True):
        self.training = mode

    # ---- QAT functional params --------------------------------------------
    def trainable_params(self):
        """dict of learnable arrays (empty for PTQ quantizers)."""
        return {}

    def load_trainable_params(self, params):
        for k, v in params.items():
            setattr(self, k, jnp.asarray(v))

    # ---- forward ----------------------------------------------------------
    def _qparams_preprocess(self, x, params):
        scale = params.get("scale", self.scale) if params else self.scale
        zp = params.get("zero_point", self.zero_point) if params else self.zero_point
        return scale, zp

    def _forward(self, x, scale, zero_point, params=None):
        return fake_quant(x, scale, zero_point, self.qdesc.qmin, self.qdesc.qmax)

    def __call__(self, x, params=None):
        if self.is_enable and not self.fake_fused:
            scale, zero_point = self._qparams_preprocess(x, params)
            return self._forward(x, scale, zero_point, params=params)
        return x

    @property
    def is_perchannel(self):
        return self.qdesc.is_perchannel

    @property
    def is_symmetric(self):
        return self.qdesc.is_symmetric

    @property
    def bit(self):
        return self.qdesc.bit

    def __repr__(self):
        return "{}(bit={}, enable={}, qdesc={})".format(
            type(self).__name__, self.bit, self.is_enable, self.qdesc
        )
