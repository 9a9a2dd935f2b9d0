"""Layerwise (memory-bounded) calibration runner.

Reference: sparsebit/quantization/tools/calibration.py:11-160. Per node, in
topological order: run feature calibration (observer update -> calc_qparams),
float-forward the cached batches to produce the next activations, then weight
calibration (with optional AdaRound layer reconstruction). ``asym`` keeps a
second storage of *quantized* activations so later layers calibrate against
quantized predecessors (calibration.py:77-97).

TPU-native notes: the reference shuttles every activation CPU<->GPU per batch
(calibration.py:154-157); here activations stay device-resident jnp arrays and
the SharedData refcount frees them as consumers finish.
"""

import jax

from sparsebit_tpu.nn.graph import Output, Placeholder, SymbolicTensor
from sparsebit_tpu.quantization.modules.base import (
    MultipleInputsQuantOpr,
    QuantOpr,
)
from sparsebit_tpu.quantization.tools.graph_wrapper import SharedData


class CalibrationRunner:
    def __init__(self, graph):
        self.graph = graph
        self.batches = []  # list of input tuples
        self.adaround_max_steps = 20000  # reference default (adaround.py:66)

    # -- phase 1: capture model inputs (reference hooks the placeholder-
    # adjacent modules; storing the model inputs is equivalent) --------------
    def capture(self, *inputs):
        self.batches.append(tuple(jax.lax.stop_gradient(x) for x in inputs))

    # -- phase 2: per-layer walk --------------------------------------------
    def layerwise_calibration(self, asym=False, w_quant=False, a_quant=False):
        assert self.batches, "no calibration batches captured"
        graph = self.graph
        storage = SharedData(graph)
        qstorage = SharedData(graph) if asym else None

        for ph_idx, ph in enumerate(graph.placeholders):
            vals = [b[ph_idx] for b in self.batches]
            storage.set_value(ph.name, vals)
            if asym:
                qstorage.set_value(ph.name, vals)

        def resolve(store, a):
            if isinstance(a, SymbolicTensor):
                vals = store.get_value(a.node.name)
                if a.index is not None:
                    return [v[a.index] for v in vals]
                return vals
            return None  # constant

        for node in graph.nodes:
            if isinstance(node.op, Placeholder):
                continue
            if isinstance(node.op, Output):
                break
            op = node.op

            in_lists = [resolve(storage, a) for a in node.args]
            n_batches = len(self.batches)

            def batch_args(i, lists=in_lists, args=node.args):
                return [
                    lists[k][i] if lists[k] is not None else args[k]
                    for k in range(len(args))
                ]

            # ---- feature calibration (calibration.py:102-115) -------------
            if isinstance(op, QuantOpr) and not isinstance(
                op, MultipleInputsQuantOpr
            ):
                iq = op.input_quantizer
                if iq is not None and not iq.fake_fused:
                    calib_lists = (
                        [resolve(qstorage, a) for a in node.args]
                        if asym
                        else in_lists
                    )
                    for i in range(n_batches):
                        x = (
                            calib_lists[0][i]
                            if calib_lists[0] is not None
                            else node.args[0]
                        )
                        iq.update_observer(x)
                    iq.calc_qparams()

            # ---- float forward (calibration.py:137-160) -------------------
            outs = []
            for i in range(n_batches):
                outs.append(op.execute(*batch_args(i), **node.kwargs))
            storage.set_value(node.name, outs)

            # ---- weight calibration (+ AdaRound) (calibration.py:117-135) -
            if isinstance(op, QuantOpr) and op.weight_quantizer is not None:
                wq = op.weight_quantizer
                if not wq.fake_fused:
                    wq.update_observer(op.get_weight())
                    wq.calc_qparams()
                    if wq.TYPE == "adaround":
                        self._reconstruct_adaround(op, node, in_lists, outs)

            # ---- asym: propagate quantized activations --------------------
            if asym:
                q_in_lists = [resolve(qstorage, a) for a in node.args]
                was_w = (
                    op.weight_quantizer.is_enable
                    if isinstance(op, QuantOpr) and op.weight_quantizer
                    else None
                )
                was_a = (
                    op.input_quantizer.is_enable
                    if isinstance(op, QuantOpr) and op.input_quantizer
                    else None
                )
                if isinstance(op, QuantOpr):
                    op.set_quant(w_quant, a_quant)
                qouts = []
                for i in range(n_batches):
                    args_i = [
                        q_in_lists[k][i] if q_in_lists[k] is not None else node.args[k]
                        for k in range(len(node.args))
                    ]
                    qouts.append(op.execute(*args_i, **node.kwargs))
                if isinstance(op, QuantOpr):
                    op.set_quant(bool(was_w), bool(was_a))
                qstorage.set_value(node.name, qouts)
                qstorage.consume_inputs(node)

            storage.consume_inputs(node)

    def _reconstruct_adaround(self, op, node, in_lists, outs):
        import jax.numpy as jnp

        from sparsebit_tpu.quantization.quantizers.adaround import (
            reconstruct_qlayer,
        )

        if in_lists[0] is None:
            return
        inputs = jnp.concatenate([jnp.atleast_1d(x) for x in in_lists[0]], axis=0)
        outputs = jnp.concatenate([jnp.atleast_1d(o) for o in outs], axis=0)
        reconstruct_qlayer(op, inputs, outputs, max_steps=self.adaround_max_steps)
