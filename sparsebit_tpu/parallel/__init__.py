"""Parallelism: device mesh + DP/TP sharding over ICI.

Replaces the reference's torch.distributed stack (DDP data parallelism in
the QAT examples, GPipe pipeline for QLoRA — SURVEY.md §2.6) with the
TPU-native equivalents:

- DP: batch axis sharded over the "dp" mesh axis (jit + NamedSharding).
- TP: packed quantized weights are sharded **at pack time** (each device
  packs its own contiguous column/row block, parallel/tp.py) and the layer
  runs under shard_map, so the Pallas dequant-matmul stays a per-device
  local kernel and XLA inserts/schedules the psum on the row-parallel
  output — collectives ride ICI and overlap with the next layer's compute
  via the latency-hiding scheduler.
"""

from sparsebit_tpu.parallel.mesh import make_mesh, dp_shard_batch  # noqa: F401
from sparsebit_tpu.parallel.tp import (  # noqa: F401
    shard_llama_params_tp,
    tp_llama_forward,
    tp_llama_loss,
)
from sparsebit_tpu.parallel.sp import sp_llama_loss  # noqa: F401
