"""Device-side KL (entropy) threshold search.

The reference parallelizes its per-channel scipy KL search over a
24-process CPU pool (kl_histogram.py:15-151); our numpy port vectorizes
across channels but still walks ~1000 candidate widths in a host Python
loop — fine for CNN feature maps, a crawl for per-channel transformer
tensors. This module is the SURVEY §7 formulation: the whole search runs
on device in ONE jitted fori_loop.

Key fixed-shape tricks (XLA needs static shapes; the textbook algorithm
slices a different-width window per candidate):

- window [zero-i, zero+i+1) becomes a mask |j - zero| <= i over the full
  (C, bins) histogram; the out-of-window mass folds into the edge bins
  via prefix sums (cumsum once, reused by every candidate);
- the merge into 2^bit-1 coarse bins is a segment sum with
  candidate-dependent segment ids  bin_of(j) = clip((j-lo)//nm, 0, dst-1);
  materialised as a (bins, dst) one-hot and applied as a matmul — the MXU
  eats it, and the transpose matmul performs the expand-back gather;
- KL(p||q) with the reference's 1e-4 smoothing, computed masked.

Histograms are also built on device: values are bucketed with a
searchsorted-free  floor((x + amax) / width)  and accumulated per channel
as a one-hot matmul (C-channel histogramming without any host transfer).
"""

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("bins",))
def device_histograms(data, abs_max, bins):
    """data (C, N) f32, abs_max (C,) -> (C, bins) histograms over
    [-amax, amax] per channel (numpy.histogram semantics: right-closed
    last bin)."""
    C = data.shape[0]
    width = 2.0 * abs_max / bins  # (C,)
    idx = jnp.floor((data + abs_max[:, None]) / width[:, None]).astype(jnp.int32)
    # x == amax lands in bins; clamp into the last bin (numpy's behaviour);
    # values outside the range cannot occur (amax = |data|.max) but clamp
    # anyway for fp safety
    idx = jnp.clip(idx, 0, bins - 1)
    # scatter-add per (channel, bin) — a (C, N, bins) one-hot would not fit
    return (
        jnp.zeros((C, bins), jnp.float32)
        .at[jnp.arange(C)[:, None], idx]
        .add(1.0)
    )


@functools.partial(jax.jit, static_argnames=("dst_bins", "bins"))
def _kl_search(hist, dst_bins, bins):
    """hist (C, bins) -> per-channel best candidate index i (half-width in
    source bins, i in [dst_bins//2, bins//2))."""
    C = hist.shape[0]
    zero = bins // 2
    half_dst = dst_bins // 2
    n_cand = zero - half_dst

    hist = hist.astype(jnp.float32)
    csum = jnp.cumsum(hist, axis=1)  # inclusive prefix
    total = csum[:, -1:]
    j = jnp.arange(bins)

    def one_candidate(ci, best):
        best_div, best_i = best
        i = ci + half_dst
        lo = zero - i
        hi = zero + i + 1  # exclusive
        n = hi - lo  # 2i+1
        nm = n // dst_bins  # >= 1 for every candidate in range

        in_win = (j >= lo) & (j < hi)  # (bins,)
        # p: windowed hist with tails absorbed into the edge bins
        left_tail = jnp.where(lo > 0, csum[:, lo - 1], 0.0)  # (C,)
        right_tail = (total[:, 0] - csum[:, hi - 1])  # (C,)
        p = jnp.where(in_win, hist, 0.0)
        p = p.at[:, lo].add(left_tail)
        p = p.at[:, hi - 1].add(right_tail)

        # coarse segment ids over the WINDOW, one-hot -> matmul segment sum
        seg = jnp.clip((j - lo) // nm, 0, dst_bins - 1)  # (bins,)
        onehot = (
            (seg[:, None] == jnp.arange(dst_bins)) & in_win[:, None]
        ).astype(jnp.float32)  # (bins, dst)
        sliced = jnp.where(in_win, hist, 0.0)  # (C, bins)
        quantized = sliced @ onehot  # (C, dst)
        nonzero = jnp.where(in_win, (p != 0).astype(jnp.float32), 0.0)
        norm = nonzero @ onehot  # (C, dst)

        # expand back: q[j] = quantized[seg(j)]/norm[seg(j)] where p[j]!=0
        ratio = jnp.where(norm > 0, quantized / jnp.maximum(norm, 1.0), 0.0)
        expanded = ratio @ onehot.T  # (C, bins)
        q = jnp.where(nonzero > 0, expanded, 0.0)

        # smoothed normalized KL(p || q), masked to the window
        p_s = jnp.where(in_win, jnp.where(p == 0, 1e-4, p), 0.0)
        q_s = jnp.where(in_win, jnp.where(q == 0, 1e-4, q), 0.0)
        p_s = p_s / jnp.sum(p_s, axis=1, keepdims=True)
        q_s = q_s / jnp.sum(q_s, axis=1, keepdims=True)
        div = jnp.sum(
            jnp.where(in_win, p_s * jnp.log(p_s / q_s), 0.0), axis=1
        )  # (C,)

        take = div < best_div
        return (jnp.where(take, div, best_div), jnp.where(take, i, best_i))

    init = (jnp.full((C,), jnp.inf), jnp.full((C,), half_dst, jnp.int32))
    _, best_i = jax.lax.fori_loop(0, n_cand, one_candidate, init)
    return best_i


def kl_thresholds_device(data, bit, bins=2048):
    """Device-resident analogue of kl_thresholds: data (C, N) ->
    per-channel |threshold| f32 (C,). Matches the numpy implementation's
    indexing (threshold = (best + 0.5) * bin_width)."""
    data = jnp.asarray(data, jnp.float32)
    abs_max = jnp.maximum(jnp.max(jnp.abs(data), axis=1), 1e-8)
    dst_bins = 2**bit - 1
    hist = device_histograms(data, abs_max, bins)
    best = _kl_search(hist, dst_bins, bins)
    bin_width = 2.0 * abs_max / bins
    return (best.astype(jnp.float32) + 0.5) * bin_width
