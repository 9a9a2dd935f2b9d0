from sparsebit_tpu.quantization.tools.graph_wrapper import SharedData
from sparsebit_tpu.quantization.tools.calibration import CalibrationRunner
from sparsebit_tpu.quantization.tools.errors_profiler import QuantizationErrorProfiler
from sparsebit_tpu.quantization.tools.qat import (
    cross_entropy,
    commit_qat_params,
    init_qat_state,
    make_qat_step,
)
