"""TPU kernel layer (Pallas + XLA).

Replaces the reference's native CUDA layer (SURVEY.md §2.3):
- fake-quant fwd/bwd (N1) -> jax.custom_vjp in quantization/fake_quant.py
  (pure elementwise; XLA fuses it — no kernel needed).
- packed dequant-matvec 2/3/4-bit (N2) -> ops.quant_matmul (Pallas groupwise
  dequant+matmul over N-folded packed planes; XLA reference path for CPU).
- W4A8 int8 path (N3) -> ops.int8_matmul (per-token dynamic activation quant
  fused with an int8 MXU matmul, custom_vjp for the QLoRA backward).
"""

from sparsebit_tpu.ops.packing import (  # noqa: F401
    pack_columns,
    unpack_columns,
    packed_plane_count,
)
from sparsebit_tpu.ops.quant_matmul import quant_matmul, quant_matmul_a8  # noqa: F401
from sparsebit_tpu.ops.int8_matmul import (  # noqa: F401
    int8_matmul_dynamic,
    tokenwise_quant,
)
