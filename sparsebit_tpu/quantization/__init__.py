# QuantModel / parse_qconfig are populated as the package is built out.
try:
    from sparsebit_tpu.quantization.quant_model import QuantModel
    from sparsebit_tpu.quantization.quant_config import parse_qconfig
except ImportError:  # partial builds during bootstrap
    QuantModel = None
    parse_qconfig = None
