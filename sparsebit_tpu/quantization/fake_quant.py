"""Fake-quantization with straight-through-estimator gradients.

TPU-native equivalent of the reference's native fake-quant layer
(sparsebit/quantization/torch_extensions/fake_quant_tensor.cu:50-314 and the
STE autograd Function in quantizers/quant_tensor.py:74-156).

Design notes (TPU-first):
- One ``jax.custom_vjp`` covers per-tensor, per-channel and group-wise quant:
  ``scale``/``zero_point`` may have any shape broadcastable against ``x``;
  their gradients are reduced back to that shape. This subsumes the reference's
  separate per-tensor/per-channel CUDA kernels (and their block-reduce +
  atomicAdd machinery) — on TPU the reduction is a fused XLA reduce.
- The op is pure elementwise math; XLA fuses it into neighbouring ops, so no
  Pallas kernel is needed for the fake-quant path itself (it is HBM-bandwidth
  bound either way). The *real*-quant deploy path lives in
  ``sparsebit_tpu.ops`` as fused Pallas quantize-matmul kernels.

Gradient semantics mirror fake_quant_tensor.cu:97-167:
  vq = round(x/s) + zp
  gx  = gy                          if qmin <= vq <= qmax else 0
  gs  = (round(x/s) - x/s) * gy     in-range
        (qmax - zp) * gy            if vq > qmax
        (qmin - zp) * gy            if vq < qmin
  gzp = 0 in-range else -s * gy
"""

from functools import partial

import jax
import jax.numpy as jnp


def _reduce_to_shape(grad, shape):
    """Sum ``grad`` over broadcasted dimensions so it has shape ``shape``."""
    if grad.shape == tuple(shape):
        return grad
    ndim_diff = grad.ndim - len(shape)
    axes = tuple(range(ndim_diff))
    axes += tuple(
        i + ndim_diff for i, s in enumerate(shape) if s == 1 and grad.shape[i + ndim_diff] != 1
    )
    return jnp.sum(grad, axis=axes).reshape(shape)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fake_quant(x, scale, zero_point, qmin, qmax):
    """quantize -> clamp -> dequantize with STE gradients.

    scale/zero_point broadcast against x (e.g. (1, C, 1, 1) for per-channel
    NCHW, (OC, 1) for per-out-channel weights, (OC, G, 1) for group-wise).
    """
    zp = jnp.round(zero_point)
    xq = jnp.clip(jnp.round(x / scale) + zp, qmin, qmax)
    return (xq - zp) * scale


def _fake_quant_fwd(x, scale, zero_point, qmin, qmax):
    return fake_quant(x, scale, zero_point, qmin, qmax), (x, scale, zero_point)


def _fake_quant_bwd(qmin, qmax, res, gy):
    x, scale, zero_point = res
    zp = jnp.round(zero_point)
    xs = x / scale
    rounded = jnp.round(xs)
    vq = rounded + zp
    in_range = (vq >= qmin) & (vq <= qmax)

    gx = jnp.where(in_range, gy, 0.0)

    gs_elem = jnp.where(
        in_range,
        (rounded - xs) * gy,
        jnp.where(vq > qmax, (qmax - zp) * gy, (qmin - zp) * gy),
    )
    gs = _reduce_to_shape(gs_elem, scale.shape)

    gzp_elem = jnp.where(in_range, 0.0, -scale * gy)
    gzp = _reduce_to_shape(gzp_elem, zero_point.shape)
    return gx, gs, gzp


fake_quant.defvjp(_fake_quant_fwd, _fake_quant_bwd)


def grad_scale(x, ratio):
    """Identity forward; gradient multiplied by ``ratio`` on the backward pass.

    Replaces the reference's ``gs_scaling`` autograd Function (lsq.py:13-21),
    used for LSQ/LSQ+ learnable-scale gradient scaling.
    """
    return x * ratio + jax.lax.stop_gradient(x * (1.0 - ratio))


def round_ste(x):
    """round() with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_ste(x):
    """floor() with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def quantize(x, scale, zero_point, qmin, qmax, dtype=jnp.int8):
    """Real quantization to integers (no dequant). Deploy-path helper."""
    zp = jnp.round(zero_point)
    q = jnp.clip(jnp.round(x / scale) + zp, qmin, qmax)
    return q.astype(dtype)


def dequantize(q, scale, zero_point):
    zp = jnp.round(zero_point)
    return (q.astype(scale.dtype) - zp) * scale
