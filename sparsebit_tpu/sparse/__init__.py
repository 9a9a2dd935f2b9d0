try:
    from sparsebit_tpu.sparse.sparse_model import SparseModel
    from sparsebit_tpu.sparse.sparse_config import parse_sconfig
except ImportError:  # partial builds during bootstrap
    SparseModel = None
    parse_sconfig = None
