"""Graph simplify passes (reference: sparsebit/quantization/converters/simplifiers/).

Pipeline (simplifiers/lists.py): remove_identity, getattr_to_shape,
unbind_getitem_to_subtensor. The latter two exist because torch.fx traces
dynamic shape access and unbind; in this framework shapes are static and
split returns tuples directly, so only remove_identity (plus dead-node
pruning) is required.
"""

from sparsebit_tpu.nn import modules as nn
from sparsebit_tpu.quantization.converters.matcher import (
    MatchingNode,
    ReplacePatternBase,
)


class RemoveIdentity(ReplacePatternBase):
    """Drop nn.Identity nodes (simplifiers/remove_identity.py)."""

    STRICT_INTERNAL = False

    def make_nodes(self):
        return [
            MatchingNode(
                "identity",
                inputs=[None],
                op_types=[nn.Identity],
                checker=lambda n: getattr(n.op, "remove", True),
            )
        ]

    def replace(self, graph, match):
        node = match["identity"]
        graph.replace_all_uses(node, node.args[0])
        return True


def simplify(graph):
    for pattern in [RemoveIdentity()]:
        pattern.apply(graph)
    graph.prune()
    return graph
