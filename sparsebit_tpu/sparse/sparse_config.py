"""Sparse (pruning) config tree.

Reference: sparsebit/sparse/sparse_config.py:6-17. Schema:
SPARSER.{TYPE, STRATEGY, RATIO} plus SKIP_TRACE_MODULES and per-layer
SPECIFIC overrides (a TPU-build extension mirroring the quant config's
W/A.SPECIFIC fnmatch semantics).
"""

from sparsebit_tpu.utils.config import CfgNode as CN
from sparsebit_tpu.utils.yaml_utils import _parse_config

_C = CN()
_C.SKIP_TRACE_MODULES = []

_C.SPARSER = CN()
_C.SPARSER.TYPE = "l1norm"
_C.SPARSER.STRATEGY = "unstructure"  # unstructure / structure
_C.SPARSER.RATIO = 0.0
_C.SPARSER.SPECIFIC = []


def parse_sconfig(cfg_file):
    sconfig = _parse_config(cfg_file, default_cfg=_C)
    assert sconfig.SPARSER.STRATEGY in ("structure", "unstructure"), (
        "unknown sparse strategy: {}".format(sconfig.SPARSER.STRATEGY)
    )
    assert 0.0 <= sconfig.SPARSER.RATIO < 1.0, "RATIO must be in [0, 1)"
    return sconfig
