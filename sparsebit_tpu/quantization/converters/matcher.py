"""Subgraph pattern matcher + replace-pattern base.

Compact TPU-native counterpart of sparsebit/quantization/converters/utils/
(subgraph_matching_node.py:23, subgraph_matching.py:43,
subgraph_matching_replace_pattern.py:15). The reference builds a
Lengauer-Tarjan dominator tree and Hungarian bipartite matching to order a
backtracking DFS; our graphs are small layer DAGs and every shipped pattern is
a chain or near-chain, so a plain backtracking matcher over topological order
suffices and keeps the pass framework ~10x smaller. Patterns with SUBSET input
semantics are not needed by any shipped pass and are unsupported.
"""


class MatchingNode:
    """One node of a pattern.

    inputs: list of pattern-node names (positional) or None for wildcard.
    op_types: tuple of acceptable op classes (isinstance check on node.op).
    checker: optional fn(graph_node) -> bool.
    """

    def __init__(self, name, inputs, op_types, checker=None):
        self.name = name
        self.inputs = list(inputs)
        self.op_types = tuple(op_types)
        self.checker = checker


class SubgraphMatcher:
    def __init__(self, pattern_nodes, strict_internal=True):
        self.pattern = {n.name: n for n in pattern_nodes}
        self.order = [n.name for n in pattern_nodes]
        used_as_input = {
            i for n in pattern_nodes for i in n.inputs if i is not None
        }
        anchors = [n.name for n in pattern_nodes if n.name not in used_as_input]
        assert len(anchors) == 1, "pattern must have exactly one anchor (output)"
        self.anchor = anchors[0]
        self.strict_internal = strict_internal

    def _node_ok(self, pnode, gnode):
        if not isinstance(gnode.op, pnode.op_types):
            return False
        if pnode.checker is not None and not pnode.checker(gnode):
            return False
        return True

    def _try_match(self, graph, pname, gnode, assign):
        if pname in assign:
            return assign[pname] is gnode
        pnode = self.pattern[pname]
        if not self._node_ok(pnode, gnode):
            return False
        # arity: only check when the pattern constrains inputs
        g_inputs = [
            a.node if hasattr(a, "node") else None for a in gnode.args
        ]
        if len(pnode.inputs) > len(g_inputs):
            return False
        assign[pname] = gnode
        for i, in_name in enumerate(pnode.inputs):
            if in_name is None:
                continue
            if i >= len(g_inputs) or g_inputs[i] is None:
                del assign[pname]
                return False
            if not self._try_match(graph, in_name, g_inputs[i], assign):
                del assign[pname]
                return False
        return True

    def match_all(self, graph):
        """Yield {pattern_name: graph Node} dicts for each match found."""
        matches = []
        for gnode in graph.op_nodes:
            assign = {}
            if self._try_match(graph, self.anchor, gnode, assign):
                if self.strict_internal and not self._internal_ok(graph, assign):
                    continue
                matches.append(dict(assign))
        return matches

    def _internal_ok(self, graph, assign):
        """Non-anchor matched nodes must have all users inside the match
        (so structural rewrites preserve semantics)."""
        matched = set(id(n) for n in assign.values())
        for pname, gnode in assign.items():
            if pname == self.anchor:
                continue
            for user in graph.successors(gnode):
                if id(user) not in matched:
                    return False
        return True


class ReplacePatternBase:
    """Apply ``apply_once`` until fixpoint (reference
    subgraph_matching_replace_pattern.py:72-112, ReplaceStrategy.APPLY_REPEAT)."""

    STRICT_INTERNAL = True

    def make_nodes(self):
        raise NotImplementedError

    def replace(self, graph, match):
        """Perform the rewrite; return True if the graph changed."""
        raise NotImplementedError

    def apply(self, graph, max_iters=1000):
        matcher = SubgraphMatcher(
            self.make_nodes(), strict_internal=self.STRICT_INTERNAL
        )
        changed_any = False
        for _ in range(max_iters):
            changed = False
            for match in matcher.match_all(graph):
                if self.replace(graph, match):
                    changed = True
                    break  # graph edited; re-match
            if not changed:
                break
            graph.prune()
            changed_any = True
        return changed_any
