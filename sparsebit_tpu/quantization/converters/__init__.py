from sparsebit_tpu.quantization.converters.simplifiers import simplify
from sparsebit_tpu.quantization.converters.fuse_operations import fuse_operations
from sparsebit_tpu.quantization.converters.matcher import (
    MatchingNode,
    SubgraphMatcher,
    ReplacePatternBase,
)
