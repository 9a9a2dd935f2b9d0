"""QuantModel: the PTQ/QAT orchestrator.

TPU-native counterpart of sparsebit/quantization/quant_model.py:29-364.
Pipeline: trace -> simplify -> convert-to-qmodules -> build quantizers
(per-node SPECIFIC overrides) -> fuse passes. Provides calibration driving,
QAT init, quant toggles, error profiling, mermaid dump and export.

Execution is jitted: ``qmodel(x)`` runs the graph interpreter under jax.jit
with the parameter pytree (weights + quantizer scales) as the traced argument,
so recalibration does NOT retrigger compilation; only structural edits or
quant on/off toggles do.
"""

from contextlib import contextmanager
from fnmatch import fnmatch

import jax

from sparsebit_tpu.nn.graph import SymbolicTensor, Tracer
from sparsebit_tpu.quantization.common import get_backend
from sparsebit_tpu.quantization.converters import fuse_operations, simplify
from sparsebit_tpu.quantization.modules import QMODULE_MAP
from sparsebit_tpu.quantization.modules.base import (
    MultipleInputsQuantOpr,
    QuantOpr,
)
from sparsebit_tpu.quantization.modules.unary import QIdentity
from sparsebit_tpu.quantization.tools.calibration import CalibrationRunner
from sparsebit_tpu.utils.yaml_utils import update_config


class QuantModel:
    def __init__(self, model, config, example_inputs):
        self.cfg = config
        self.backend = get_backend(config.BACKEND)
        self.graph = Tracer(config.SKIP_TRACE_MODULES).trace(
            model, example_inputs
        )
        simplify(self.graph)
        self._convert2quantmodule()
        self._build_quantizer()
        self._run_fuse_operations()
        self._jit_cache = {}

    # ---- build phases (quant_model.py:40-158) ------------------------------
    def _convert2quantmodule(self):
        skip = self.cfg.SKIP_TRACE_MODULES
        for node in self.graph.op_nodes:
            if any(fnmatch(node.name, p) for p in skip):
                continue
            qcls = QMODULE_MAP.get(type(node.op))
            if qcls is not None:
                node.op = qcls(node.op, self.cfg)

    def _sub_build(self, src, module_name):
        """Per-module W/A config with SPECIFIC fnmatch overrides
        (quant_model.py:97-113)."""
        sub_cfg = src.clone()
        sub_cfg.defrost()
        if src.SPECIFIC:
            for pattern, overrides in src.SPECIFIC[0].items():
                if fnmatch(module_name, pattern):
                    sub_cfg.merge_from_list(list(overrides))
                    break
        sub_cfg.SPECIFIC = []
        sub_cfg.freeze()
        return sub_cfg

    def _node_config(self, node_name):
        cfg = self.cfg.clone()
        cfg.defrost()
        cfg["W"] = self._sub_build(self.cfg.W, node_name)
        cfg["A"] = self._sub_build(self.cfg.A, node_name)
        cfg.freeze()
        return cfg

    def _build_quantizer(self):
        for node in list(self.graph.op_nodes):
            op = node.op
            if isinstance(op, MultipleInputsQuantOpr):
                if len(node.input_nodes) > 1 and self._multi_input_quant_enabled(op):
                    self._insert_input_identities(node)
            elif isinstance(op, QuantOpr):
                op.build_quantizer(self._node_config(node.name))
        self.graph.toposort()

    def _multi_input_quant_enabled(self, op):
        gate = getattr(type(op), "input_quant_enabled", None)
        if gate is not None:
            return gate(self.cfg)
        return True

    def _insert_input_identities(self, node):
        """Insert a QIdentity (with input quantizer) on each input edge of a
        multi-input op (quant_model.py:126-137)."""
        cfg = self._node_config(node.name)
        new_args = []
        for a in node.args:
            if isinstance(a, SymbolicTensor):
                ident = QIdentity(config=self.cfg)
                ident.build_quantizer(cfg)
                ident_node = self.graph.create_node(
                    ident,
                    [a],
                    name="{}_identity".format(node.name),
                    out_aval=a.aval,
                )
                new_args.append(ident_node.symbolic())
            else:
                new_args.append(a)
        node.args = new_args

    def _run_fuse_operations(self):
        schedule = self.cfg.SCHEDULE
        if schedule.BN_TUNING:
            update_config(self.cfg.SCHEDULE, ["FUSE_BN", False])
        fuse_operations(self.graph, self.cfg.SCHEDULE)

    # ---- calibration (quant_model.py:181-199) ------------------------------
    def prepare_calibration(self):
        self.eval()
        self.calibration_runner = CalibrationRunner(self.graph)
        self._capture_mode = True

    def calc_qparams(self, asym=False, w_quant=False, a_quant=False):
        assert hasattr(
            self, "calibration_runner"
        ), "run self.prepare_calibration first"
        self._capture_mode = False
        self.calibration_runner.layerwise_calibration(asym, w_quant, a_quant)
        del self.calibration_runner

    def init_QAT(self):
        self.calc_qparams()
        self.set_quant(w_quant=True, a_quant=True)
        self.enable_qat = True

    @contextmanager
    def batchnorm_tuning(self):
        """Re-estimate BN stats under quantization (arXiv 2006.10518;
        reference quant_model.py:160-179). Forward batches inside the context;
        they run EAGERLY in train mode so BN running stats update (jit would
        trace the stat writes and leak tracers)."""
        self.train()
        self.set_quant(w_quant=True, a_quant=True)
        self._force_eager = True
        yield
        self._force_eager = False
        self.eval()
        update_config(self.cfg.SCHEDULE, ["FUSE_BN", True])
        fuse_operations(self.graph, self.cfg.SCHEDULE)
        self.set_quant(w_quant=False, a_quant=False)

    # ---- state toggles ------------------------------------------------------
    def set_quant(self, w_quant=False, a_quant=False):
        for node in self.graph.op_nodes:
            if isinstance(node.op, QuantOpr):
                node.op.set_quant(w_quant, a_quant)
        self._jit_cache.clear()

    def train(self, mode=True):
        for node in self.graph.op_nodes:
            node.op.train(mode)
        self._training = mode
        return self

    def eval(self):
        return self.train(False)

    def qmodules(self):
        """(name, QuantOpr) pairs, for per-layer overrides like the QAT
        examples' 8-bit head/tail (QAT main.py:236-250)."""
        for node in self.graph.op_nodes:
            if isinstance(node.op, QuantOpr):
                yield node.name, node.op

    def get_qmodule(self, name):
        for n, m in self.qmodules():
            if n == name:
                return m
        raise KeyError(name)

    # ---- execution ----------------------------------------------------------
    def params(self):
        return self.graph.collect_params()

    def load_params(self, params):
        self.graph.load_params(params)

    def trainable_params(self):
        """QAT learnables: weights + enabled quantizer learnables, as a
        {node: {name: array}} pytree."""
        out = {}
        for name, op in self.qmodules():
            p = op.trainable_params()
            if p:
                out[name] = p
        return out

    def _signature(self):
        sig = [self.graph.version, getattr(self, "_training", False)]
        for node in self.graph.op_nodes:
            op = node.op
            if isinstance(op, QuantOpr):
                for q in (op.input_quantizer, op.weight_quantizer):
                    sig.append(
                        None
                        if q is None
                        else (q.is_enable, q.fake_fused, q.bit, q.training)
                    )
        return tuple(sig)

    def apply(self, params, *inputs, training=False):
        """Pure forward: graph.run with explicit params (jit-friendly)."""
        return self.graph.run(params, *inputs, training=training)

    def __call__(self, *inputs):
        if getattr(self, "_capture_mode", False):
            self.calibration_runner.capture(*inputs)
            return None
        if getattr(self, "_force_eager", False):
            return self.graph.run(
                self.params(), *inputs, training=getattr(self, "_training", False)
            )
        sig = self._signature()
        if sig not in self._jit_cache:
            training = getattr(self, "_training", False)
            self._jit_cache[sig] = jax.jit(
                lambda p, *xs: self.graph.run(p, *xs, training=training)
            )
        return self._jit_cache[sig](self.params(), *inputs)

    # ---- introspection ------------------------------------------------------
    def get_quantization_error(self, *inputs, checker=None, is_async=True):
        from sparsebit_tpu.quantization.tools.errors_profiler import (
            QuantizationErrorProfiler,
            mse_checker,
        )

        return QuantizationErrorProfiler(self.graph).apply(
            *inputs, checker=checker or mse_checker, is_async=is_async
        )

    def dump_mermaid(self):
        return self.graph.to_mermaid()

    def print_tabular(self):
        return self.graph.print_tabular()

    # ---- export -------------------------------------------------------------
    def export(self, path, *example_inputs, extra_info=False):
        """StableHLO + quant-metadata export (replaces export_onnx;
        reference quant_model.py:222-324). See sparsebit_tpu.export."""
        from sparsebit_tpu.export.stablehlo import export_quant_model

        return export_quant_model(
            self, path, example_inputs, extra_info=extra_info
        )
