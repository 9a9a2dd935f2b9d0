"""Per-token dynamic int8 activation quant + int8 MXU matmul.

TPU-native replacement for the reference's QLoRA int8 path (SURVEY.md §2.3
N3): tokenwise_quant.cu (per-row dynamic quant), int8gemm.cu (CUTLASS int8
GEMM) and the W8A8 deploy path.

On TPU, `jnp.dot(int8, int8, preferred_element_type=int32)` lowers directly
to the int8 MXU; XLA fuses the rowmax/scale/round producer chain into the
operand load, so the whole (quant -> gemm -> rescale) pipeline is one fused
HLO program — the CUDA version needs three hand-written kernels for the
same dataflow. A Pallas variant is therefore only warranted for cases XLA
can't fuse (none observed yet; revisit with profiles).

Backward (QLoRA, reference qmatmul.py:45-69): dx = tokenwise-int8(g) @ Wt
where Wt is the weight requantized per input channel (the consumer passes
``bwd_w``/``bwd_scale`` computed once at train-prep, utils.py:230-255).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def zero_cotangent(x):
    """Cotangent for a non-differentiable operand; float0 for int dtypes
    (JAX's required tangent dtype for integer primals)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


def tokenwise_quant(x, eps=1e-8):
    """Per-token (last-axis) symmetric int8 quant.

    Returns (q int8 (..., K), scale f32 (..., 1)).
    Reference: tokenwise_quant.cu (block-reduce row max); here a fused XLA
    reduce+scale.
    """
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, eps) / 127.0
    q = jnp.clip(jnp.round(x / scale), -128, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_gemm(xq, wq):
    """int8 x int8 -> int32 on the MXU."""
    return jax.lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def int8_matmul_dynamic(x, wq, w_scale, bwd_wq, bwd_scale):
    """x (..., K) f32/bf16 @ int8 weights wq (K, N) -> (..., N) f32.

    w_scale: (1, N) or () — symmetric per-out-channel weight scale.
    bwd_wq: (N, K) int8 — weight requantized per input channel for the
      backward gemm; bwd_scale: (1, K). Pass zeros when no grad is needed.
    """
    xq, x_scale = tokenwise_quant(x)
    acc = int8_gemm(xq, wq).astype(jnp.float32)
    return acc * x_scale * w_scale


def _fwd(x, wq, w_scale, bwd_wq, bwd_scale):
    out = int8_matmul_dynamic(x, wq, w_scale, bwd_wq, bwd_scale)
    # residuals must be jax types: a zero-size array carries the primal dtype
    return out, (bwd_wq, bwd_scale, jnp.zeros((0,), x.dtype))


def _bwd(res, g):
    bwd_wq, bwd_scale, x_proto = res
    x_dtype = x_proto.dtype
    gq, g_scale = tokenwise_quant(g)
    dx = (int8_gemm(gq, bwd_wq).astype(jnp.float32) * g_scale * bwd_scale).astype(
        x_dtype
    )
    wq_shape = (bwd_wq.shape[1], bwd_wq.shape[0])
    return (
        dx,
        np.zeros(wq_shape, dtype=jax.dtypes.float0),
        jnp.zeros((1, bwd_wq.shape[0]), jnp.float32),
        zero_cotangent(bwd_wq),
        jnp.zeros_like(bwd_scale),
    )


int8_matmul_dynamic.defvjp(_fwd, _bwd)


def requantize_per_input_channel(wq, w_scale):
    """(K, N) int8 + (1, N) scale -> per-K int8 transposed weight for the
    backward gemm (reference utils.py:230-255 prepare_backward_scales)."""
    w = wq.astype(jnp.float32) * w_scale  # (K, N)
    wt = w.T  # (N, K)
    absmax = jnp.max(jnp.abs(wt), axis=0, keepdims=True)  # (1, K)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wt / scale), -128, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)
