"""GPTQ solver: Hessian-damped blockwise weight quantization.

Reference: large_language_models/llama/quantization/utils/gptq.py:17-174.
TPU-native re-design:

- Hessian accumulation is a streaming jitted GEMM (X^T X on the MXU),
  mirroring add_batch's sqrt(2/n) running rescale (gptq.py:32-61).
- fasterquant's column-sequential loop is expressed as
  lax.fori_loop(blocks) x lax.fori_loop(cols-in-block): the inner loop does
  rank-1 updates inside a 128-column panel held in registers/VMEM, the
  outer loop applies the panel's accumulated error to the trailing columns
  as one (N,128)@(128,K) MXU GEMM — the reference's exact blocking
  (gptq.py:101-136), but compiled instead of eager.
- Mixed precision (candidate bits, first under threshold — gptq.py:93,144)
  and bias correction (b += dW @ mean_x — gptq.py:151-159) included.

Everything is f32: bf16 Hessians lose the Cholesky (SURVEY.md §7 hard
parts); jnp.linalg on TPU computes f32 natively.
"""

from functools import partial

import jax
import jax.numpy as jnp


class HessianAccumulator:
    """Streaming H = 2/n * sum x x^T and mean(x) (reference gptq.py:32-61)."""

    def __init__(self, K):
        self.H = jnp.zeros((K, K), jnp.float32)
        self.mean_x = jnp.zeros((K,), jnp.float32)
        self.nsamples = 0

    def add_batch(self, x):
        """x: (..., K) activations feeding the linear."""
        x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
        b = x2.shape[0]
        n = self.nsamples
        self.H = self.H * (n / (n + b)) + (2.0 / (n + b)) * _xtx(x2)
        self.mean_x = self.mean_x * (n / (n + b)) + (b / (n + b)) * jnp.mean(
            x2, axis=0
        )
        self.nsamples = n + b


@jax.jit
def _xtx(x):
    return jnp.dot(x.T, x, preferred_element_type=jnp.float32)


def _hinv_cholesky(H, percdamp):
    """Damped inverse-Hessian upper Cholesky factor (gptq.py:85-91)."""
    K = H.shape[0]
    d = jnp.diag(H)
    dead = d == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    damp = percdamp * jnp.mean(jnp.diag(H))
    H = H + damp * jnp.eye(K, dtype=H.dtype)
    L = jnp.linalg.cholesky(H)
    Hinv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(K, dtype=H.dtype))
    # upper-triangular U with Hinv = U^T U — same factor as the reference's
    # torch.linalg.cholesky(Hinv, upper=True) (gptq.py:85-91)
    U = jnp.linalg.cholesky(Hinv).T
    return U, dead


@partial(jax.jit, static_argnames=("bits", "groupsize", "blocksize", "sym"))
def _gptq_core(W, U, dead, bits, groupsize, blocksize, sym):
    """W: (N, K) row-major outputs; U: (K, K) upper Cholesky of Hinv.

    Returns (codes uint8 (N, K), scales (N, G), zeros (N, G), Wq (N, K),
    total_sq_err). Group qparams are computed when the column loop enters
    each group, from the *current* (error-compensated) W — as the reference
    does via find_params inside the loop (gptq.py:115-119).
    """
    N, K = W.shape
    qmax = 2**bits - 1
    gs = groupsize if groupsize > 0 else K
    G = K // gs
    n_blocks = K // blocksize
    W = jnp.where(dead[None, :], 0.0, W.astype(jnp.float32))

    def find_params(Wg):
        """Wg (N, gs) -> scale/zero (N,)"""
        wmin = jnp.minimum(jnp.min(Wg, axis=1), 0.0)
        wmax = jnp.maximum(jnp.max(Wg, axis=1), 0.0)
        if sym:
            wmax = jnp.maximum(-wmin, wmax)
            wmin = -wmax
        degen = (wmin == 0) & (wmax == 0)
        wmin = jnp.where(degen, -1.0, wmin)
        wmax = jnp.where(degen, 1.0, wmax)
        scale = (wmax - wmin) / qmax
        zero = (
            jnp.full_like(scale, (qmax + 1) / 2.0)
            if sym
            else jnp.round(-wmin / scale)
        )
        return scale, zero

    def block_body(bi, carry):
        W, Q, codes, scales, zeros, err_total = carry
        i1 = bi * blocksize
        Wb = jax.lax.dynamic_slice(W, (0, i1), (N, blocksize))  # (N, BS)
        Ub = jax.lax.dynamic_slice(U, (i1, i1), (blocksize, blocksize))
        Errb = jnp.zeros((N, blocksize), jnp.float32)
        Qb = jnp.zeros((N, blocksize), jnp.float32)
        Cb = jnp.zeros((N, blocksize), jnp.uint8)

        def col_body(ci, inner):
            Wb, Qb, Cb, Errb, scales, zeros, err_total = inner
            col = i1 + ci
            w = jax.lax.dynamic_slice(Wb, (0, ci), (N, 1))[:, 0]
            g = col // gs

            # entering a new group: re-estimate qparams from the live
            # (error-compensated) columns. For gs <= blocksize the whole
            # group lies in the current panel Wb; otherwise (per-channel)
            # the group starts at a block boundary where W is current.
            def refresh(sz):
                if gs <= blocksize:
                    Wg = jax.lax.dynamic_slice(Wb, (0, ci), (N, gs))
                else:
                    Wg = jax.lax.dynamic_slice(W, (0, col), (N, gs))
                s, z = find_params(Wg)
                scales_, zeros_ = sz
                return (
                    jax.lax.dynamic_update_slice(scales_, s[:, None], (0, g)),
                    jax.lax.dynamic_update_slice(zeros_, z[:, None], (0, g)),
                )

            scales, zeros = jax.lax.cond(
                col % gs == 0, refresh, lambda sz: sz, (scales, zeros)
            )
            s = jax.lax.dynamic_slice(scales, (0, g), (N, 1))[:, 0]
            z = jax.lax.dynamic_slice(zeros, (0, g), (N, 1))[:, 0]

            c = jnp.clip(jnp.round(w / s) + z, 0, qmax)
            q = (c - z) * s
            dinv = Ub[ci, ci]
            e = (w - q) / dinv
            err_total = err_total + jnp.sum(((w - q) / dinv) ** 2)

            # propagate error to the remaining columns of this panel
            u_row = Ub[ci, :] / dinv  # (BS,)
            ci_mask = (jnp.arange(blocksize) > ci).astype(jnp.float32)
            Wb = Wb - e[:, None] * (u_row * ci_mask)[None, :]

            Qb = jax.lax.dynamic_update_slice(Qb, q[:, None], (0, ci))
            Cb = jax.lax.dynamic_update_slice(
                Cb, c.astype(jnp.uint8)[:, None], (0, ci)
            )
            Errb = jax.lax.dynamic_update_slice(Errb, e[:, None], (0, ci))
            return Wb, Qb, Cb, Errb, scales, zeros, err_total

        Wb, Qb, Cb, Errb, scales, zeros, err_total = jax.lax.fori_loop(
            0, blocksize, col_body, (Wb, Qb, Cb, Errb, scales, zeros, err_total)
        )

        Q = jax.lax.dynamic_update_slice(Q, Qb, (0, i1))
        codes = jax.lax.dynamic_update_slice(codes, Cb, (0, i1))
        # trailing update: W[:, i1+BS:] -= Errb @ U[i1:i1+BS, i1+BS:]
        U_rows = jax.lax.dynamic_slice(U, (i1, 0), (blocksize, K))
        diag = jnp.diagonal(Ub)
        U_norm = U_rows / diag[:, None]
        tail_mask = (jnp.arange(K) >= i1 + blocksize).astype(jnp.float32)
        W = W - jnp.dot(
            Errb, U_norm * tail_mask[None, :], preferred_element_type=jnp.float32
        )
        return W, Q, codes, scales, zeros, err_total

    init = (
        W,
        jnp.zeros((N, K), jnp.float32),
        jnp.zeros((N, K), jnp.uint8),
        jnp.zeros((N, G), jnp.float32),
        jnp.zeros((N, G), jnp.float32),
        jnp.asarray(0.0, jnp.float32),
    )
    W_res, Q, codes, scales, zeros, err_total = jax.lax.fori_loop(
        0, n_blocks, block_body, init
    )
    return codes, scales, zeros, Q, err_total


def gptq_quantize(
    w,
    H,
    bits=4,
    groupsize=-1,
    sym=False,
    percdamp=0.01,
    blocksize=128,
    mean_x=None,
    bias=None,
    act_order=False,
):
    """Quantize one (K, N) weight against Hessian H (K, K).

    Returns dict with codes (K, N) uint8, scales/zeros (G, N), fake-quant
    weight wq (K, N), per-weight mean loss, and bias-corrected bias
    (gptq.py:151-159) when ``bias``/``mean_x`` given.

    ``act_order`` (GPTQ --act-order / desc_act): quantize columns in
    decreasing diag(H) order — high-salience channels first see the least
    accumulated error. codes/scales stay in PERMUTED row order with
    contiguous groups (kernel-friendly); the returned "perm" must be
    applied to activations at matmul time (x[..., perm]).
    """
    K, N = w.shape
    perm = None
    if act_order:
        perm = jnp.argsort(-jnp.diag(H))
        H = H[perm][:, perm]
        w = w[perm, :]
    bs = min(blocksize, K)
    gs_eff = groupsize if groupsize > 0 else K
    assert K % bs == 0, "K={} must be divisible by blocksize {}".format(K, bs)
    assert K % gs_eff == 0, "K={} must be divisible by groupsize {}".format(K, gs_eff)
    assert gs_eff % bs == 0 or bs % gs_eff == 0, (
        "groupsize and blocksize must nest (got {}, {})".format(gs_eff, bs)
    )
    U, dead = _hinv_cholesky(H.astype(jnp.float32), percdamp)
    codes_t, scales_t, zeros_t, Q_t, err = _gptq_core(
        w.astype(jnp.float32).T, U, dead, bits, groupsize, bs, sym
    )
    out = {
        "codes": codes_t.T,  # (K, N) — permuted row order when act_order
        "scales": scales_t.T,  # (G, N)
        "zeros": zeros_t.T,
        "wq": Q_t.T,
        "loss": float(err) / (K * N),
        "bits": bits,
        "perm": perm,
    }
    if act_order:
        # report wq in the ORIGINAL row order for loss/oracle comparisons
        invperm = jnp.argsort(perm)
        out["wq"] = out["wq"][invperm, :]
    if bias is not None and mean_x is not None:
        dw = None
        if act_order:
            dw = w.astype(jnp.float32)[jnp.argsort(perm), :] - out["wq"]
        else:
            dw = w.astype(jnp.float32) - out["wq"]
        out["bias"] = bias + jnp.dot(mean_x.astype(jnp.float32), dw)
    return out


def gptq_quantize_mixed(
    w, H, candidate_bits=(4,), loss_threshold=1e-3, **kw
):
    """Mixed-precision candidate loop (gptq.py:93,144-146): try bits in
    order, keep the first whose mean loss < threshold (else the last)."""
    result = None
    for bits in candidate_bits:
        result = gptq_quantize(w, H, bits=bits, **kw)
        if result["loss"] < loss_threshold:
            return result
    return result
