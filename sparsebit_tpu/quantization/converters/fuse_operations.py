"""Fuse passes (reference: sparsebit/quantization/converters/fuse_operations/).

- fuse_bn: fold BatchNorm into the preceding QConv2d/QLinear, including the
  quantized variant that also rescales weight_quantizer.scale
  (fuse_bn.py:36-124). Gated by SCHEDULE.FUSE_BN.
- disable_unnecessary_quant: for producer->activation chains the follower's
  quantizers are permanently disabled, since quantizing both the producer
  output and the activation input is redundant
  (disable_unnecessary_quant.py:116-147). Gated by
  SCHEDULE.DISABLE_UNNECESSARY_QUANT.
"""

import jax.numpy as jnp

from sparsebit_tpu.quantization.converters.matcher import (
    MatchingNode,
    ReplacePatternBase,
)
from sparsebit_tpu.quantization.modules.conv import QConv2d
from sparsebit_tpu.quantization.modules.linear import QLinear
from sparsebit_tpu.quantization.modules.normalization import QBatchNorm2d
from sparsebit_tpu.quantization.modules.math import QAdd
from sparsebit_tpu.quantization.modules.activations import (
    QHardsigmoid,
    QLeakyReLU,
    QMish,
    QGELU,
    QReLU,
    QReLU6,
    QSiLU,
    QSigmoid,
)


class FuseBN(ReplacePatternBase):
    def make_nodes(self):
        return [
            MatchingNode("cnn_layer", inputs=[None], op_types=[QConv2d, QLinear]),
            MatchingNode("bn", inputs=["cnn_layer"], op_types=[QBatchNorm2d]),
        ]

    def replace(self, graph, match):
        cnn_opr = match["cnn_layer"].op
        bn = match["bn"].op.module
        cnn = cnn_opr.module

        rstd = 1.0 / jnp.sqrt(bn.running_var + bn.eps)
        ratio = bn.weight * rstd  # per out-channel
        w = cnn.weight
        if isinstance(cnn_opr, QConv2d):
            ratio_shape = [1] * w.ndim
            ratio_shape[3] = -1  # HWIO out axis
        else:
            ratio_shape = [1] * w.ndim
            ratio_shape[1] = -1  # (in, out)
        cnn.weight = w * ratio.reshape(ratio_shape)
        bias = cnn._params.get("bias")
        if bias is None:
            bias = jnp.zeros_like(bn.running_mean)
        cnn._params["bias"] = (bias - bn.running_mean) * ratio + bn.bias

        wq = cnn_opr.weight_quantizer
        if wq is not None and wq.is_enable:
            # rescale the quant grid so fused weights reuse calibration
            # (fuse_bn.py:94: scale *= ratio; abs() keeps asym zp valid)
            wq.scale = wq.scale * jnp.abs(ratio.reshape(ratio_shape))

        graph.replace_all_uses(match["bn"], match["cnn_layer"].symbolic())
        return True


def _not_already_fused(node):
    op = node.op
    wq = getattr(op, "weight_quantizer", None)
    iq = getattr(op, "input_quantizer", None)
    return (wq is not None and not wq.fake_fused) or (
        iq is not None and not iq.fake_fused
    )


class DisableQuantChain(ReplacePatternBase):
    STRICT_INTERNAL = False

    def __init__(self, producer_types, follower_types):
        self.producer_types = producer_types
        self.follower_types = follower_types

    def make_nodes(self):
        return [
            MatchingNode("producer", inputs=[None], op_types=self.producer_types),
            MatchingNode(
                "follower",
                inputs=["producer"],
                op_types=self.follower_types,
                checker=_not_already_fused,
            ),
        ]

    def replace(self, graph, match):
        op = match["follower"].op
        if op.weight_quantizer is not None:
            op.weight_quantizer.set_fake_fused()
        if op.input_quantizer is not None:
            op.input_quantizer.set_fake_fused()
        return True


_ACTS_AFTER_CONV = (QReLU, QReLU6, QSigmoid, QLeakyReLU, QMish, QSiLU, QHardsigmoid)
_ACTS_AFTER_LINEAR = _ACTS_AFTER_CONV + (QGELU,)
_ACTS_AFTER_BN = _ACTS_AFTER_CONV
_ACTS_AFTER_ADD = (QReLU, QReLU6)


def fuse_operations(graph, schedule_cfg):
    """Run the fuse pipeline per SCHEDULE config (fuse_operations/lists.py)."""
    if schedule_cfg.FUSE_BN:
        FuseBN().apply(graph)
    if schedule_cfg.DISABLE_UNNECESSARY_QUANT:
        chains = [
            ((QConv2d,), (QBatchNorm2d,) + _ACTS_AFTER_CONV),
            ((QLinear,), (QBatchNorm2d,) + _ACTS_AFTER_LINEAR),
            ((QBatchNorm2d,), _ACTS_AFTER_BN),
            ((QAdd,), _ACTS_AFTER_ADD),
        ]
        for producers, followers in chains:
            DisableQuantChain(producers, followers).apply(graph)
    return graph
