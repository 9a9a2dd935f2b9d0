"""Per-layer quantization-error profiler.

Reference: sparsebit/quantization/tools/errors_profiler.py:11-201.
- async mode: error of each layer with ONLY that layer quantized (float
  inputs everywhere).
- sync mode: quantized activations propagate, so each layer's error includes
  all preceding layers' quantization.
Returns {node_name: error} using ``checker`` (default MSE).
"""

import jax.numpy as jnp

from sparsebit_tpu.nn.graph import Output, Placeholder, SymbolicTensor
from sparsebit_tpu.quantization.modules.base import QuantOpr
from sparsebit_tpu.quantization.tools.graph_wrapper import SharedData


def mse_checker(a, b):
    return float(jnp.mean((a - b) ** 2))


def cosine_checker(a, b):
    """1 - cosine similarity (common quant-error diagnostic)."""
    af, bf = a.reshape(-1), b.reshape(-1)
    denom = jnp.linalg.norm(af) * jnp.linalg.norm(bf) + 1e-12
    return float(1.0 - jnp.dot(af, bf) / denom)


def snr_checker(a, b):
    """Negative SNR in dB of the quantized signal vs float (lower=better
    error => more negative)."""
    noise = jnp.sum((a - b) ** 2) + 1e-12
    signal = jnp.sum(b**2) + 1e-12
    return float(-10.0 * jnp.log10(signal / noise))


class QuantizationErrorProfiler:
    def __init__(self, graph):
        self.graph = graph

    def apply(self, *inputs, checker=mse_checker, is_async=True):
        return (
            self._async_errors(inputs, checker)
            if is_async
            else self._sync_errors(inputs, checker)
        )

    def _quant_state(self, op):
        return (
            op.weight_quantizer.is_enable if op.weight_quantizer else None,
            op.input_quantizer.is_enable if op.input_quantizer else None,
        )

    def _walk(self, inputs, on_node):
        graph = self.graph
        storage = SharedData(graph)
        qstorage = SharedData(graph)
        for ph, x in zip(graph.placeholders, inputs):
            storage.set_value(ph.name, x)
            qstorage.set_value(ph.name, x)

        def resolve(store, a):
            if isinstance(a, SymbolicTensor):
                v = store.get_value(a.node.name)
                return v[a.index] if a.index is not None else v
            return a

        errors = {}
        for node in graph.nodes:
            if isinstance(node.op, Placeholder):
                continue
            if isinstance(node.op, Output):
                break
            fargs = [resolve(storage, a) for a in node.args]
            qargs = [resolve(qstorage, a) for a in node.args]
            # float reference must be computed with quantizers OFF no matter
            # what state the caller left them in (e.g. after set_quant(True))
            if isinstance(node.op, QuantOpr):
                state = self._quant_state(node.op)
                node.op.set_quant(False, False)
                fout = node.op.execute(*fargs, **node.kwargs)
                node.op.set_quant(bool(state[0]), bool(state[1]))
            else:
                fout = node.op.execute(*fargs, **node.kwargs)
            qout, err = on_node(node, fargs, qargs, fout)
            storage.set_value(node.name, fout)
            qstorage.set_value(node.name, qout)
            if err is not None:
                errors[node.name] = err
            storage.consume_inputs(node)
            qstorage.consume_inputs(node)
        return errors

    def _async_errors(self, inputs, checker):
        def on_node(node, fargs, qargs, fout):
            op = node.op
            if isinstance(op, QuantOpr) and (
                (op.weight_quantizer and not op.weight_quantizer.fake_fused)
                or (op.input_quantizer and not op.input_quantizer.fake_fused)
            ):
                state = self._quant_state(op)
                op.set_quant(w_quant=True, a_quant=True)
                qout = op.execute(*fargs, **node.kwargs)
                op.set_quant(bool(state[0]), bool(state[1]))
                return fout, checker(qout, fout)  # qstorage keeps float (async)
            return fout, None

        return self._walk(inputs, on_node)

    def _sync_errors(self, inputs, checker):
        def on_node(node, fargs, qargs, fout):
            op = node.op
            if isinstance(op, QuantOpr) and (
                (op.weight_quantizer and not op.weight_quantizer.fake_fused)
                or (op.input_quantizer and not op.input_quantizer.fake_fused)
            ):
                state = self._quant_state(op)
                op.set_quant(w_quant=True, a_quant=True)
                qout = op.execute(*qargs, **node.kwargs)
                op.set_quant(bool(state[0]), bool(state[1]))
                return qout, checker(qout, fout)
            qout = op.execute(*qargs, **node.kwargs)
            return qout, None

        return self._walk(inputs, on_node)
