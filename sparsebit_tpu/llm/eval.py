"""Perplexity evaluation (reference: convert.py:176-259 llama_eval).

Token stream -> non-overlapping seqlen windows -> mean NLL -> exp. Jitted
per-window so arbitrary stream lengths reuse one compile.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("cfg",))
def _window_nll(params, window, cfg):
    from sparsebit_tpu.llm.llama import llama_forward

    logits = llama_forward(params, window[:, :-1], cfg)
    targets = window[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def _window_nll_chunked(params, window, cfg, chunk=256):
    """7B-on-one-chip eval forward: the backbone runs with FLASH causal
    attention (no (S, S) score tensors — llama.llama_backbone routes
    mask=None to the Pallas flash kernel on TPU), and the lm_head +
    log-softmax run in `chunk`-token sequence slices via lax.map, so the
    peak logits footprint is (B, chunk, V) instead of (B, S, V) f32
    (32000-vocab x 2048 = 262 MB + softmax temporaries per window).
    Same numbers as _window_nll; the default for seqlen >= 512."""
    from sparsebit_tpu.llm.llama import llama_backbone

    x = llama_backbone(params, window[:, :-1], cfg)  # (B, S-1, D)
    targets = window[:, 1:]
    B, S, D = x.shape
    n_chunks = -(-S // chunk)
    pad = n_chunks * chunk - S
    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    targets = jnp.pad(targets, ((0, 0), (0, pad)))
    real = jnp.pad(jnp.ones((B, S), jnp.float32), ((0, 0), (0, pad)))
    # chunk axis leading for lax.map: (n_chunks, B, chunk, ...)
    xc = jnp.moveaxis(x.reshape(B, n_chunks, chunk, D), 1, 0)
    tc = jnp.moveaxis(targets.reshape(B, n_chunks, chunk), 1, 0)
    rc = jnp.moveaxis(real.reshape(B, n_chunks, chunk), 1, 0)

    def body(args):
        xs, ts, rs = args
        logits = params["lm_head"](xs).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, ts[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * rs)

    sums = jax.lax.map(body, (xc, tc, rc))
    return jnp.sum(sums), B * S


def perplexity(params, token_stream, cfg, seqlen=2048, batch=1, verbose=False,
               head_chunk=None):
    """token_stream: 1-D int array. Returns ppl over non-overlapping
    windows (the reference's evaluation protocol). head_chunk: sequence
    chunk for the lm_head/log-softmax (None = auto: chunked at
    seqlen >= 512, whole-window below)."""
    toks = np.asarray(token_stream).reshape(-1)
    n_win = len(toks) // seqlen
    assert n_win > 0, "stream shorter than one window"
    if head_chunk is None:
        head_chunk = 256 if seqlen >= 512 else 0
    total, count = 0.0, 0
    for i in range(0, n_win, batch):
        j = min(i + batch, n_win)
        win = np.stack(
            [toks[k * seqlen : (k + 1) * seqlen] for k in range(i, j)]
        ).astype(np.int32)
        if head_chunk:
            s, c = _window_nll_chunked(params, jnp.asarray(win), cfg,
                                       chunk=head_chunk)
        else:
            s, c = _window_nll(params, jnp.asarray(win), cfg)
        total += float(s)
        count += int(c)
        if verbose:
            print("ppl[{}/{}] = {:.4f}".format(j, n_win, np.exp(total / count)))
    return float(np.exp(total / count))
