"""SparseModel: the pruning orchestrator.

TPU-native counterpart of sparsebit/sparse/sparse_model.py:23-146.
Pipeline: trace -> simplify -> convert-to-smodules -> build sparsers.
``calc_params`` walks the graph computing masks and threading structured
channel masks into following BatchNorms; ``disable_sparse_before_add``
zeroes the ratio of residual producers so structured pruning never breaks
an Add (reference sparse_model.py:86-105).
"""

from fnmatch import fnmatch

import jax

from sparsebit_tpu.nn import functional as F
from sparsebit_tpu.nn.graph import Tracer
from sparsebit_tpu.quantization.converters import simplify
from sparsebit_tpu.sparse.modules import SMODULE_MAP, SparseOpr
from sparsebit_tpu.sparse.modules.normalization import SBatchNorm2d
from sparsebit_tpu.sparse.sparsers.slimming import SlimmingSparser


class SparseModel:
    def __init__(self, model, config, example_inputs):
        self.cfg = config
        self.graph = Tracer(config.SKIP_TRACE_MODULES).trace(
            model, example_inputs
        )
        simplify(self.graph)
        self._convert2sparsemodule()
        self._build_sparser()
        if config.SPARSER.STRATEGY == "structure":
            self._disable_sparse_before_add()
        self._jit_cache = {}

    # ---- build -------------------------------------------------------------
    def _convert2sparsemodule(self):
        skip = self.cfg.SKIP_TRACE_MODULES
        for node in self.graph.op_nodes:
            if any(fnmatch(node.name, p) for p in skip):
                continue
            scls = SMODULE_MAP.get(type(node.op))
            if scls is not None:
                node.op = scls(node.op, self.cfg)

    def _node_config(self, node_name):
        """Per-node SPARSER config with SPECIFIC fnmatch overrides."""
        cfg = self.cfg.clone()
        cfg.defrost()
        if self.cfg.SPARSER.SPECIFIC:
            for pattern, overrides in self.cfg.SPARSER.SPECIFIC[0].items():
                if fnmatch(node_name, pattern):
                    cfg.SPARSER.merge_from_list(list(overrides))
                    break
        cfg.SPARSER.SPECIFIC = []
        cfg.freeze()
        return cfg

    def _build_sparser(self):
        for node in self.graph.op_nodes:
            if isinstance(node.op, SparseOpr):
                node.op.build_sparser(self._node_config(node.name))

    def _disable_sparse_before_add(self):
        """Residual producers must keep all channels (sparse_model.py:86-105)."""
        for node in self.graph.op_nodes:
            if not isinstance(node.op, F.Add):
                continue
            stack = list(node.input_nodes)
            seen = set()
            while stack:
                p = stack.pop()
                if p.name in seen:
                    continue
                seen.add(p.name)
                op = p.op
                if isinstance(op, SparseOpr) and op.HAS_WEIGHT:
                    op.set_ratio(0.0)
                elif not isinstance(p.op, F.Add):
                    # walk through passthrough ops (bn, relu, pool...) to the
                    # nearest weighted producers
                    stack.extend(p.input_nodes)

    # ---- mask computation (sparse_model.py:107-113) -------------------------
    def calc_params(self):
        structured = self.cfg.SPARSER.STRATEGY == "structure"
        for node in self.graph.op_nodes:
            op = node.op
            if not (isinstance(op, SparseOpr) and op.HAS_WEIGHT):
                continue
            if isinstance(op.sparser, SlimmingSparser):
                bn = self._following_bn(node)
                if bn is not None:
                    op.sparser.set_bn_weight(bn.op.module._params["weight"])
            ch_mask = op.calc_mask()
            if structured and ch_mask is not None:
                bn = self._following_bn(node)
                if bn is not None:
                    bn.op.set_channel_mask(ch_mask)
        self._jit_cache.clear()

    def _following_bn(self, node):
        for s in self.graph.successors(node):
            if isinstance(s.op, SBatchNorm2d):
                return s
        return None

    # ---- introspection ------------------------------------------------------
    def smodules(self):
        for node in self.graph.op_nodes:
            if isinstance(node.op, SparseOpr):
                yield node.name, node.op

    def sparsity(self):
        """Global fraction of zeroed weight elements."""
        import jax.numpy as jnp

        total, zeros = 0, 0.0
        for _, op in self.smodules():
            if op.HAS_WEIGHT:
                m = op._buffers["w_mask"]
                total += m.size
                zeros += float(jnp.sum(m == 0))
        return zeros / max(total, 1)

    def print_tabular(self):
        return self.graph.print_tabular()

    # ---- execution ----------------------------------------------------------
    def params(self):
        return self.graph.collect_params()

    def load_params(self, params):
        """Write a trained params pytree back into the stateful modules
        (the sparse-finetune loops thread params functionally, then commit
        here before re-running calc_params / eval)."""
        self.graph.load_params(params)
        self._jit_cache.clear()

    def train(self, mode=True):
        for node in self.graph.op_nodes:
            node.op.train(mode)
        self._training = mode
        return self

    def eval(self):
        return self.train(False)

    def apply(self, params, *inputs, training=False):
        return self.graph.run(params, *inputs, training=training)

    def __call__(self, *inputs):
        key = (self.graph.version, getattr(self, "_training", False))
        if key not in self._jit_cache:
            training = getattr(self, "_training", False)
            self._jit_cache[key] = jax.jit(
                lambda p, *xs: self.graph.run(p, *xs, training=training)
            )
        return self._jit_cache[key](self.params(), *inputs)

    # ---- export (sparse_model.py:124) ---------------------------------------
    def export(self, path, *example_inputs):
        from sparsebit_tpu.export.stablehlo import export_graph

        return export_graph(self.graph, path, example_inputs)
