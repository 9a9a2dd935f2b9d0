"""A minimal yacs-style config-tree.

The reference uses ``yacs.config.CfgNode`` (sparsebit/quantization/quant_config.py:6).
yacs is not part of this environment, so we provide a small, compatible subset:
attribute access, ``merge_from_other_cfg`` / ``merge_from_list`` /
``merge_from_file``, ``clone``, ``freeze`` and yaml dump.
"""

from __future__ import annotations

import copy
import yaml


class CfgNode(dict):
    """dict with attribute access and recursive merge, yacs-compatible subset."""

    IMMUTABLE = "__immutable__"

    def __init__(self, init_dict=None):
        super().__init__()
        object.__setattr__(self, CfgNode.IMMUTABLE, False)
        init_dict = init_dict or {}
        for k, v in init_dict.items():
            self[k] = CfgNode(v) if isinstance(v, dict) else v

    # ---- attribute access -------------------------------------------------
    def __getattr__(self, name):
        if name in self:
            return self[name]
        raise AttributeError(
            "Non-existent config key: {}".format(name)
        )

    def __setattr__(self, name, value):
        if object.__getattribute__(self, CfgNode.IMMUTABLE):
            raise AttributeError(
                "Attempted to set {} to {}, but CfgNode is immutable".format(
                    name, value
                )
            )
        self[name] = value

    # ---- mutability -------------------------------------------------------
    def freeze(self):
        self._set_immutable(True)

    def defrost(self):
        self._set_immutable(False)

    def is_frozen(self):
        return object.__getattribute__(self, CfgNode.IMMUTABLE)

    def _set_immutable(self, value):
        object.__setattr__(self, CfgNode.IMMUTABLE, value)
        for v in self.values():
            if isinstance(v, CfgNode):
                v._set_immutable(value)

    # ---- merging ----------------------------------------------------------
    def clone(self):
        return copy.deepcopy(self)

    def merge_from_other_cfg(self, other):
        _merge_a_into_b(other, self)

    def merge_from_dict(self, d):
        _merge_a_into_b(CfgNode(d), self)

    def merge_from_file(self, filename):
        with open(filename, "r") as f:
            loaded = yaml.safe_load(f) or {}
        _merge_a_into_b(CfgNode(loaded), self)

    def merge_from_list(self, cfg_list):
        assert len(cfg_list) % 2 == 0, "override list must have even length"
        for key, value in zip(cfg_list[0::2], cfg_list[1::2]):
            parts = key.split(".")
            node = self
            for p in parts[:-1]:
                if p not in node:
                    node[p] = CfgNode()
                node = node[p]
            leaf = parts[-1]
            old = node.get(leaf, None)
            node[leaf] = _decode_value(value, old)

    # ---- io ---------------------------------------------------------------
    def to_dict(self):
        return {
            k: (v.to_dict() if isinstance(v, CfgNode) else v)
            for k, v in self.items()
        }

    def dump(self):
        return yaml.safe_dump(self.to_dict())

    def __deepcopy__(self, memo):
        new = CfgNode()
        memo[id(self)] = new
        for k, v in self.items():
            new[k] = copy.deepcopy(v, memo)
        return new

    def __repr__(self):
        return "CfgNode({})".format(dict.__repr__(self))


def _decode_value(value, old=None):
    """Coerce a string override to the type of the existing value if possible."""
    if not isinstance(value, str):
        return value
    try:
        parsed = yaml.safe_load(value)
    except yaml.YAMLError:
        return value
    if isinstance(old, str) and not isinstance(parsed, str):
        return value
    return parsed


def _merge_a_into_b(a, b):
    for k, v in a.items():
        if isinstance(v, CfgNode) and isinstance(b.get(k, None), CfgNode):
            _merge_a_into_b(v, b[k])
        else:
            b[k] = copy.deepcopy(v)
