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


def perplexity(params, token_stream, cfg, seqlen=2048, batch=1, verbose=False):
    """token_stream: 1-D int array. Returns ppl over non-overlapping
    windows (the reference's evaluation protocol)."""
    toks = np.asarray(token_stream).reshape(-1)
    n_win = len(toks) // seqlen
    assert n_win > 0, "stream shorter than one window"
    total, count = 0.0, 0
    for i in range(0, n_win, batch):
        j = min(i + batch, n_win)
        win = np.stack(
            [toks[k * seqlen : (k + 1) * seqlen] for k in range(i, j)]
        ).astype(np.int32)
        s, c = _window_nll(params, jnp.asarray(win), cfg)
        total += float(s)
        count += int(c)
        if verbose:
            print("ppl[{}/{}] = {:.4f}".format(j, n_win, np.exp(total / count)))
    return float(np.exp(total / count))
