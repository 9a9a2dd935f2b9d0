"""Decode-batch bf16 matmul (matvec) kernel: the lm_head path.

At decode, logits = x (B<=8, dim) @ W (dim, vocab) streams the whole bf16
head (LLaMA-7B: 262 MB) once per token — strictly HBM-bound. XLA's dot
ran at ~90% of the stream roofline in the round-2 profile (the padded
M=8 matvec loses ~10% to fusion/layout overheads around the dot); this
kernel is a plain tile streamer: grid over N tiles, whole-K blocks, one
bf16 MXU dot per tile into f32, no epilogue. Reference keeps the head in
fp16 and cuBLAS (llama quantization keeps lm_head unquantized);
this is the TPU equivalent tuned for the B=1 serving shape.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mv_kernel(x_ref, w_ref, o_ref, acc_ref, *, k_t):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == k_t - 1)
    def _():
        o_ref[...] = acc_ref[...]


def _pick_tiles(K, N, cell_budget=8_400_000):
    """Whole-K blocks when they fit (no k loop), else split; N tiles are
    the largest 128-multiple divisor within the budget."""
    KB = K
    while KB > 128 and KB * 128 > cell_budget:
        KB //= 2
    if K % KB:
        return None
    ncands = sorted(
        {d for d in range(128, N + 1, 128) if N % d == 0}, reverse=True
    )
    for NT in ncands:
        if KB * NT <= cell_budget:
            return KB, NT
    return None


def matvec_supported(B, K, N):
    return B <= 8 and K % 128 == 0 and N % 128 == 0 and \
        _pick_tiles(K, N) is not None


def bf16_matvec(x, w, interpret=False):
    """x (B, K) any float dtype; w (K, N) bf16 (or f32). Returns (B, N)
    f32. The dot runs in w's dtype (bf16 MXU, f32 accumulate) — exactly
    XLA's semantics for a bf16 dot with preferred_element_type=f32."""
    B, K = x.shape
    N = w.shape[1]
    KB, NT = _pick_tiles(K, N)
    k_t = K // KB
    B_pad = 8
    if B != B_pad:
        x = jnp.pad(x, ((0, B_pad - B), (0, 0)))
    x = x.astype(w.dtype)
    out = pl.pallas_call(
        functools.partial(_mv_kernel, k_t=k_t),
        grid=(N // NT, k_t),
        in_specs=[
            pl.BlockSpec((B_pad, KB), lambda n, k: (0, k)),
            pl.BlockSpec((KB, NT), lambda n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((B_pad, NT), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((B_pad, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((B_pad, NT), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_pad * K * N,
            bytes_accessed=K * N * w.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w)
    return out[:B]


@jax.custom_vjp
def matvec(x, w):
    """Differentiable bf16_matvec (out cast back to x.dtype so it is a
    drop-in for `x @ w`). Backward is the plain dense pair of dots — the
    kernel only exists for the forward decode stream."""
    return bf16_matvec(x, w).astype(x.dtype)


def _matvec_fwd(x, w):
    return matvec(x, w), (x, w)


def _matvec_bwd(res, g):
    x, w = res
    gf = g.astype(jnp.float32)
    dx = jnp.dot(gf, w.astype(jnp.float32).T).astype(x.dtype)
    dw = jnp.dot(x.astype(jnp.float32).T, gf).astype(w.dtype)
    return dx, dw


matvec.defvjp(_matvec_fwd, _matvec_bwd)


def use_matvec(x, w, bias):
    """True when the decode-shape Pallas streamer should take this call:
    2-D tiny-batch x, lane-aligned float w, running on real TPU (the
    kernel is not registered for the CPU interpreter)."""
    return (
        bias is None
        and x.ndim == 2
        and jnp.issubdtype(x.dtype, jnp.floating)
        and jnp.issubdtype(w.dtype, jnp.floating)
        and w.dtype.itemsize <= 4
        and jax.default_backend() == "tpu"
        and matvec_supported(x.shape[0], *w.shape)
    )
