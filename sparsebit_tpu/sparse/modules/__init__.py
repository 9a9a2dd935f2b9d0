"""SModule registry (reference: sparsebit/sparse/modules/__init__.py)."""

SMODULE_MAP = {}


def register_smodule(sources):
    def wrapper(cls):
        for src in sources:
            SMODULE_MAP[src] = cls
        return cls

    return wrapper


from sparsebit_tpu.sparse.modules.base import SparseOpr  # noqa: E402,F401
from sparsebit_tpu.sparse.modules import (  # noqa: E402,F401
    conv,
    linear,
    normalization,
)
