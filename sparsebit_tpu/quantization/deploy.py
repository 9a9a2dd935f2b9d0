"""INT8 deploy pass: fake-quant graph -> real integer compute.

Replaces the reference's ONNX/TensorRT handoff (quant_model.py:222-324
export_onnx + external runtime) with a native TPU backend: after
calibration, QConv2d/QLinear nodes are swapped for Int8Conv2d/Int8Linear
ops that hold pre-quantized int8 weights and run

    quantize(x) -> int8 MXU conv/matmul (int32 acc) -> rescale epilogue

Mathematically identical to the fake-quant forward (both compute
s_in*s_w * ((xq-zp) . wq)), so the deploy pass is validated by exact
comparison against the calibrated fake-quant model — the reference can
only do this oracle through onnxruntime.

Zero-point handling for conv: the input is padded with zp (so padding
represents real zero), making the correction term constant per output
channel: zp * sum(wq).

Requires: weight per-channel/tensor SYMMETRIC (verified for BACKEND=tpu,
quant_config.py), activations 8-bit affine or symmetric per-tensor.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sparsebit_tpu.nn.modules import Module
from sparsebit_tpu.quantization.modules.conv import QConv2d
from sparsebit_tpu.quantization.modules.linear import QLinear


def _weight_int8(op):
    """Quantize the wrapped module's weight with its weight_quantizer
    params -> (wq int8, w_scale broadcastable to output)."""
    wq_q = op.weight_quantizer
    w = op.module._params["weight"]
    s = wq_q.scale
    q = jnp.clip(jnp.round(w / s), wq_q.qdesc.qmin, wq_q.qdesc.qmax)
    return q.astype(jnp.int8), s


def _input_qparams(op):
    """Activation qparams in SIGNED int8 representation: unsigned schemes
    (qmin=0, qmax=255) are shifted by -128 with the shift folded into the
    zero-point, so the MXU sees s8 x s8 (no u8 operand support)."""
    iq = op.input_quantizer
    shift = 128 if iq.qdesc.qmin >= 0 else 0
    s = jnp.reshape(iq.scale, ())
    zp = jnp.reshape(jnp.round(iq.zero_point), ()).astype(jnp.int32) - shift
    return s, zp, iq.qdesc.qmin - shift, iq.qdesc.qmax - shift


class Int8Linear(Module):
    def __init__(self, qopr):
        super().__init__()
        assert qopr.weight_quantizer.is_symmetric, "deploy needs symmetric W"
        wq, w_scale = _weight_int8(qopr)
        self.buffer("wq", wq)  # (K, N) int8
        self.buffer("w_scale", jnp.reshape(w_scale, (1, -1)))
        b = qopr.module._params.get("bias")
        self.buffer("bias", b)
        self.in_scale, self.in_zp, self.qmin_a, self.qmax_a = _input_qparams(qopr)
        self.buffer("corr", jnp.sum(wq.astype(jnp.int32), axis=0))  # (N,)

    def execute(self, x, params=None, training=False):
        wq = self.get(params, "wq")
        xq = jnp.clip(
            jnp.round(x / self.in_scale) + self.in_zp, self.qmin_a, self.qmax_a
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc - self.in_zp * self.get(params, "corr")
        out = acc.astype(jnp.float32) * (self.in_scale * self.get(params, "w_scale"))
        b = self.get(params, "bias") if self._buffers.get("bias") is not None else None
        if b is not None:
            out = out + b
        return out


class Int8Conv2d(Module):
    def __init__(self, qopr):
        super().__init__()
        assert qopr.weight_quantizer.is_symmetric, "deploy needs symmetric W"
        m = qopr.module
        wq, w_scale = _weight_int8(qopr)
        self.buffer("wq", wq)  # (kh, kw, ic/g, oc) int8
        self.buffer("w_scale", jnp.reshape(w_scale, (1, 1, 1, -1)))
        self.buffer("bias", m._params.get("bias"))
        self.stride = m.stride
        self.padding = m.padding
        self.dilation = m.dilation
        self.groups = m.groups
        self.in_scale, self.in_zp, self.qmin_a, self.qmax_a = _input_qparams(qopr)
        self.buffer("corr", jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2)))  # (oc,)

    def execute(self, x, params=None, training=False):
        wq = self.get(params, "wq")
        xq = jnp.clip(
            jnp.round(x / self.in_scale) + self.in_zp, self.qmin_a, self.qmax_a
        ).astype(jnp.int8)
        ph, pw = self.padding
        # pad with zp so padding represents real zero; the correction term
        # is then the constant zp * sum(wq) per out-channel
        if ph or pw:
            xq = jnp.pad(
                xq,
                ((0, 0), (ph, ph), (pw, pw), (0, 0)),
                constant_values=self.in_zp.astype(jnp.int8),
            )
        acc = jax.lax.conv_general_dilated(
            xq,
            wq,
            window_strides=self.stride,
            padding=((0, 0), (0, 0)),
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        acc = acc - self.in_zp * self.get(params, "corr")
        out = acc.astype(jnp.float32) * (self.in_scale * self.get(params, "w_scale"))
        b = self.get(params, "bias") if self._buffers.get("bias") is not None else None
        if b is not None:
            out = out + b
        return out


_DEPLOY_MAP = {QConv2d: Int8Conv2d, QLinear: Int8Linear}


class DeployedModel:
    """Jit-callable integer-compute model produced by ``deploy()``."""

    def __init__(self, graph):
        self.graph = graph
        self._jit = None

    def params(self):
        return self.graph.collect_params()

    def apply(self, params, *inputs):
        return self.graph.run(params, *inputs, training=False)

    def __call__(self, *inputs):
        if self._jit is None:
            self._jit = jax.jit(lambda p, *xs: self.graph.run(p, *xs))
        return self._jit(self.params(), *inputs)

    def export(self, path, *example_inputs):
        """Serialize the integer-compute graph as StableHLO (the deployable
        serving artifact; replaces the reference's ONNX->TensorRT handoff)."""
        from sparsebit_tpu.export.stablehlo import export_graph

        return export_graph(self.graph, path, example_inputs)


def deploy(qmodel):
    """Lower a calibrated QuantModel to integer compute. The QuantModel is
    left untouched (the graph is cloned; only eligible node ops are
    swapped)."""
    g = qmodel.graph.clone()
    n_swapped = 0
    for node in g.op_nodes:
        cls = _DEPLOY_MAP.get(type(node.op))
        if cls is None:
            continue
        op = node.op
        if (
            op.input_quantizer is None
            or op.weight_quantizer is None
            or op.input_quantizer.fake_fused
            or not op.weight_quantizer.is_symmetric
            or op.input_quantizer.is_perchannel
        ):
            continue
        node.op = cls(op)
        n_swapped += 1
    assert n_swapped > 0, "no quantized conv/linear nodes eligible for deploy"
    return DeployedModel(g)
