"""Ref-counted activation storage for layerwise calibration.

Reference: sparsebit/quantization/tools/graph_wrapper.py:12-114 (GraphVisitor
+ SharedData): node outputs are stored per-batch and freed as soon as every
consumer has used them, bounding calibration memory to the live frontier.
"""


class SharedData:
    def __init__(self, graph):
        self.graph = graph
        self._storage = {}  # node_name -> list of per-batch arrays
        self._remaining = {}  # node_name -> number of unconsumed users
        out_node = graph.output_node
        for node in graph.nodes:
            users = graph.successors(node)
            self._remaining[node.name] = len(users)

    def set_value(self, name, value):
        self._storage[name] = value

    def get_value(self, name):
        return self._storage[name]

    def has(self, name):
        return name in self._storage

    def finish_node(self, name):
        """Mark one consumption of ``name``; free when out-degree hits 0
        (graph_wrapper.py:35-43)."""
        if name not in self._remaining:
            return
        self._remaining[name] -= 1
        if self._remaining[name] <= 0:
            self._storage.pop(name, None)

    def consume_inputs(self, node):
        for p in node.input_nodes:
            self.finish_node(p.name)
