"""Graph IR, tracer and jittable interpreter.

TPU-native replacement for the reference's torch.fx machinery
(sparsebit/quantization/quant_tracer.py:7-23 and the fx GraphModule it
produces). Instead of bytecode tracing, models built from
``sparsebit_tpu.nn.Module`` record a DAG when called with symbolic tensors:

- ``Node``: one op; its ``op`` is always a Module instance (functional calls
  like ``x + y`` are recorded as singleton op-modules), so graph rewrites and
  quant-module conversion are uniform.
- ``Graph``: topologically-ordered node list with placeholder inputs/outputs,
  plus edit utilities for the simplify/fuse passes.
- ``Graph.run(params, *inputs)``: pure interpreter; jit it with the params
  pytree as the only traced argument. Inside ``jax.jit`` the Python dispatch
  unrolls at trace time, so XLA sees one fused program.

Shapes are propagated with ``jax.eval_shape`` as nodes are created, mirroring
fx's ShapeProp but without a separate pass.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp


class SymbolicTensor:
    """Traced value flowing through the graph during capture."""

    def __init__(self, node, aval, index=None):
        self.node = node
        self.aval = aval  # jax.ShapeDtypeStruct (or tuple of them)
        self.index = index  # set when this is one element of a multi-output op

    @property
    def shape(self):
        return self.aval.shape

    @property
    def dtype(self):
        return self.aval.dtype

    @property
    def ndim(self):
        return len(self.aval.shape)

    def __repr__(self):
        return "SymbolicTensor({}, {})".format(self.node.name, self.aval)

    # Operator overloads are installed by sparsebit_tpu.nn.functional to avoid
    # an import cycle.


class Node:
    def __init__(self, name, op, args, kwargs=None, out_aval=None):
        self.name = name
        self.op = op  # a Module instance
        self.args = list(args)  # SymbolicTensor | python constants
        self.kwargs = dict(kwargs or {})
        self.out_aval = out_aval
        self.graph = None

    @property
    def input_nodes(self):
        seen, out = set(), []
        for a in self.args:
            if isinstance(a, SymbolicTensor) and a.node.name not in seen:
                seen.add(a.node.name)
                out.append(a.node)
        return out

    @property
    def op_type(self):
        return type(self.op)

    def replace_input(self, old_node, new_value):
        """Rewire args that reference ``old_node`` to ``new_value`` (a
        SymbolicTensor or constant)."""
        new_args = []
        for a in self.args:
            if isinstance(a, SymbolicTensor) and a.node is old_node:
                new_args.append(new_value)
            else:
                new_args.append(a)
        self.args = new_args

    def symbolic(self, index=None):
        aval = self.out_aval if index is None else self.out_aval[index]
        return SymbolicTensor(self, aval, index=index)

    def __repr__(self):
        return "Node({}: {})".format(self.name, type(self.op).__name__)


class Placeholder:
    """Marker op for graph inputs."""

    def __repr__(self):
        return "Placeholder()"


class Output:
    """Marker op for graph outputs; args are the returned values."""

    def __repr__(self):
        return "Output()"


class Graph:
    def __init__(self):
        self.nodes = []  # topological order, includes placeholders + output
        self._name_counter = itertools.count()
        self._names = set()
        self.version = 0  # bumped on every edit; used to invalidate jit caches

    # ---- construction -----------------------------------------------------
    def unique_name(self, base):
        name = base
        while name in self._names:
            name = "{}_{}".format(base, next(self._name_counter))
        self._names.add(name)
        return name

    def add_placeholder(self, name):
        node = Node(self.unique_name(name), Placeholder(), [])
        node.graph = self
        self.nodes.append(node)
        return node

    def create_node(self, op, args, kwargs=None, name=None, out_aval=None):
        base = name or _default_name(op)
        node = Node(self.unique_name(base), op, args, kwargs, out_aval)
        node.graph = self
        self.nodes.append(node)
        self.version += 1
        return node

    def set_output(self, values):
        """values: list of SymbolicTensor (the model's return values)."""
        node = Node(self.unique_name("output"), Output(), list(values))
        node.graph = self
        self.nodes.append(node)
        return node

    # ---- queries ----------------------------------------------------------
    @property
    def placeholders(self):
        return [n for n in self.nodes if isinstance(n.op, Placeholder)]

    @property
    def output_node(self):
        for n in reversed(self.nodes):
            if isinstance(n.op, Output):
                return n
        raise RuntimeError("graph has no output node")

    @property
    def op_nodes(self):
        return [
            n
            for n in self.nodes
            if not isinstance(n.op, (Placeholder, Output))
        ]

    def find_node(self, name):
        for n in self.nodes:
            if n.name == name:
                return n
        raise KeyError(name)

    def successors(self, node):
        out = []
        for n in self.nodes:
            if node in n.input_nodes:
                out.append(n)
        return out

    def out_degree(self, node):
        return len(self.successors(node))

    # ---- edits ------------------------------------------------------------
    def replace_all_uses(self, old_node, new_value):
        for n in self.nodes:
            if n is old_node:
                continue
            n.replace_input(old_node, new_value)
        self.version += 1

    def erase_node(self, node):
        assert self.out_degree(node) == 0, "cannot erase node with users: {}".format(
            node.name
        )
        self.nodes.remove(node)
        self._names.discard(node.name)
        self.version += 1

    def insert_after(self, anchor, node):
        """Move ``node`` (already created) right after ``anchor`` in order."""
        self.nodes.remove(node)
        idx = self.nodes.index(anchor)
        self.nodes.insert(idx + 1, node)
        self.version += 1

    def toposort(self):
        """Re-establish topological order after edits."""
        order = {n.name: i for i, n in enumerate(self.nodes)}
        visited, result = set(), []

        def visit(n):
            if n.name in visited:
                return
            visited.add(n.name)
            for p in n.input_nodes:
                visit(p)
            result.append(n)

        for n in sorted(self.nodes, key=lambda n: order[n.name]):
            visit(n)
        self.nodes = result
        self.version += 1

    def prune(self):
        """Dead-node elimination (reference: converters/prune.py:11-43)."""
        live = set()
        stack = [self.output_node]
        while stack:
            n = stack.pop()
            if n.name in live:
                continue
            live.add(n.name)
            stack.extend(n.input_nodes)
        removed = [n for n in self.nodes if n.name not in live]
        self.nodes = [n for n in self.nodes if n.name in live]
        for n in removed:
            self._names.discard(n.name)
        if removed:
            self.version += 1
        return removed

    # ---- execution --------------------------------------------------------
    def run(self, params, *inputs, training=False):
        """Pure interpreter. ``params``: {node_name: {param_name: array}}."""
        env = {}
        phs = self.placeholders
        assert len(inputs) == len(phs), "expected {} inputs, got {}".format(
            len(phs), len(inputs)
        )
        for ph, x in zip(phs, inputs):
            env[ph.name] = x

        def resolve(a):
            if isinstance(a, SymbolicTensor):
                v = env[a.node.name]
                if a.index is not None:
                    v = v[a.index]
                return v
            return a

        outputs = None
        for node in self.nodes:
            if isinstance(node.op, Placeholder):
                continue
            args = [resolve(a) for a in node.args]
            if isinstance(node.op, Output):
                outputs = args
                break
            env[node.name] = node.op.execute(
                *args,
                params=params.get(node.name) if params else None,
                training=training,
                **node.kwargs,
            )
        if outputs is None:
            raise RuntimeError("graph has no output node")
        return outputs[0] if len(outputs) == 1 else tuple(outputs)

    def collect_params(self):
        """Gather {node: {param: array}} from op-module state."""
        params = {}
        for n in self.op_nodes:
            p = n.op.state_dict()
            if p:
                params[n.name] = p
        return params

    def load_params(self, params):
        for n in self.op_nodes:
            if n.name in params:
                n.op.load_state_dict(params[n.name])

    def clone(self):
        """Structural copy: new Node/SymbolicTensor objects, SHARED op
        modules (callers swap ops on the clone, e.g. the int8 deploy pass)."""
        g2 = Graph()
        mapping = {}
        for n in self.nodes:
            new_args = []
            for a in n.args:
                if isinstance(a, SymbolicTensor):
                    new_args.append(mapping[a.node.name].symbolic(a.index))
                else:
                    new_args.append(a)
            n2 = Node(n.name, n.op, new_args, dict(n.kwargs), n.out_aval)
            n2.graph = g2
            g2.nodes.append(n2)
            g2._names.add(n.name)
            mapping[n.name] = n2
        return g2

    # ---- introspection ----------------------------------------------------
    def print_tabular(self):
        rows = []
        for n in self.nodes:
            ins = ", ".join(p.name for p in n.input_nodes)
            rows.append(
                "{:<28} {:<24} [{}]".format(n.name, type(n.op).__name__, ins)
            )
        return "\n".join(rows)

    def to_mermaid(self):
        """Graph visualization (reference: quant_model.py:326-364)."""
        lines = ["graph TD"]
        for n in self.nodes:
            for p in n.input_nodes:
                lines.append("    {} --> {}".format(p.name, n.name))
        return "\n".join(lines)


def _default_name(op):
    return type(op).__name__.lower()


# ---- tracing ----------------------------------------------------------------

_TRACE_STACK = []


class Tracer:
    """Captures a Graph by calling the model with SymbolicTensors.

    ``skipped_modules`` (fnmatch patterns on module path) mirrors the
    reference's SKIP_TRACE_MODULES (quant_tracer.py:7-22): a matching module
    is recorded as a single opaque leaf node instead of being traced through.
    """

    def __init__(self, skipped_modules=None):
        self.skipped_patterns = list(skipped_modules or [])
        self.graph = None

    def is_skipped(self, module_path):
        import fnmatch

        return any(
            fnmatch.fnmatch(module_path, pat) for pat in self.skipped_patterns
        )

    def trace(self, model, example_inputs):
        # Assign tree paths so node names match module paths (used by
        # W/A.SPECIFIC fnmatch overrides, mirroring quant_model.py:97-113).
        for path, m in model.named_modules():
            m._path = path or type(m).__name__.lower()
        self.graph = Graph()
        _TRACE_STACK.append(self)
        try:
            sym_inputs = []
            for i, x in enumerate(example_inputs):
                ph = self.graph.add_placeholder("input_{}".format(i))
                aval = jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype)
                ph.out_aval = aval
                sym_inputs.append(ph.symbolic())
            out = model(*sym_inputs)
            if not isinstance(out, (tuple, list)):
                out = [out]
            assert all(
                isinstance(o, SymbolicTensor) for o in out
            ), "model output must be traced tensors"
            self.graph.set_output(list(out))
        finally:
            _TRACE_STACK.pop()
        return self.graph


def current_tracer():
    return _TRACE_STACK[-1] if _TRACE_STACK else None


def is_tracing():
    return bool(_TRACE_STACK)


def record_node(op, args, kwargs=None, name=None):
    """Create a node in the active trace for op-module ``op``.

    Output avals are computed with jax.eval_shape over ``op.execute``.
    """
    tracer = current_tracer()
    assert tracer is not None, "record_node called outside of a trace"
    graph = tracer.graph

    def to_aval(a):
        if isinstance(a, SymbolicTensor):
            aval = a.aval if a.index is None else a.aval
            return aval
        return a

    arg_avals = [to_aval(a) for a in args]

    def fn(*xs):
        return op.execute(*xs, **(kwargs or {}))

    out_aval = jax.eval_shape(fn, *arg_avals)
    node = graph.create_node(op, args, kwargs, name=name, out_aval=out_aval)
    if isinstance(out_aval, (tuple, list)):
        node.out_aval = tuple(out_aval)
        return tuple(node.symbolic(i) for i in range(len(out_aval)))
    return node.symbolic()
