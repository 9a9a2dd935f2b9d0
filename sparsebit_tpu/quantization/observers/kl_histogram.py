"""KL-histogram (entropy) observer — TensorRT-style calibration.

Reference: sparsebit/quantization/observers/kl_histogram.py:15-151. The
reference runs one scipy KL search per channel on a 24-process CPU pool; here
the search is vectorized across channels with numpy (histograms computed
on-device, candidate-threshold loop vectorized over all channels at once), so
no multiprocessing is needed.

Note: we implement the standard TensorRT entropy-calibration indexing
(divergence indexed by candidate half-width; threshold = (i + 0.5) * bin_width)
rather than reproducing the reference's wrapped negative indexing at
kl_histogram.py:92 — behaviour-level parity, not bug-level.
"""

import numpy as np

from sparsebit_tpu.quantization.common import Granularity
from sparsebit_tpu.quantization.observers import register_observer
from sparsebit_tpu.quantization.observers.base import Observer as BaseObserver


def _kl_divergences(hist, dst_bins):
    """hist: (C, src_bins) histograms centered on 0.

    Returns (C, n_candidates) KL divergence for candidate half-widths
    i in [dst_bins//2, src_bins//2); candidate i keeps bins
    [zero - i, zero + i + 1).
    """
    c, src_bins = hist.shape
    zero = src_bins // 2
    half_dst = dst_bins // 2
    candidates = range(half_dst, zero)
    divergences = np.full((c, len(candidates)), np.inf, dtype=np.float64)

    for ci, i in enumerate(candidates):
        lo, hi = zero - i, zero + i + 1
        n = hi - lo
        p = hist[:, lo:hi].astype(np.float64).copy()
        # outliers are absorbed into the edge bins
        p[:, 0] += hist[:, :lo].sum(axis=1)
        p[:, -1] += hist[:, hi:].sum(axis=1)

        sliced = hist[:, lo:hi].astype(np.float64)
        nm = n // dst_bins
        if nm == 0:
            continue
        # merge into dst_bins coarse bins (remainder folds into the last)
        edges = np.arange(dst_bins) * nm
        quantized = np.add.reduceat(sliced, edges, axis=1)

        nonzero = (p != 0).astype(np.float64)
        norm = np.add.reduceat(nonzero, edges, axis=1)

        bin_of = np.minimum(np.arange(n) // nm, dst_bins - 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            expanded = np.where(
                norm[:, bin_of] > 0, quantized[:, bin_of] / norm[:, bin_of], 0.0
            )
        q = np.where(nonzero > 0, expanded, 0.0)

        # smoothed, normalized KL(p || q) (scipy.stats.entropy semantics)
        p_s = np.where(p == 0, 1e-4, p)
        q_s = np.where(q == 0, 1e-4, q)
        p_s = p_s / p_s.sum(axis=1, keepdims=True)
        q_s = q_s / q_s.sum(axis=1, keepdims=True)
        divergences[:, ci] = np.sum(p_s * np.log(p_s / q_s), axis=1)
    return divergences


def kl_thresholds(data, bit, bins=2048):
    """data: (C, N) numpy. Returns per-channel |threshold| via KL search."""
    data = np.asarray(data, dtype=np.float32)
    c = data.shape[0]
    abs_max = np.abs(data).max(axis=1)
    abs_max = np.maximum(abs_max, 1e-8)
    dst_bins = 2**bit - 1

    hist = np.empty((c, bins), dtype=np.float64)
    for ch in range(c):
        hist[ch] = np.histogram(
            data[ch], bins=bins, range=(-abs_max[ch], abs_max[ch])
        )[0]

    divs = _kl_divergences(hist, dst_bins)
    best = np.argmin(divs, axis=1) + dst_bins // 2
    bin_width = 2 * abs_max / bins
    return (best + 0.5) * bin_width


@register_observer
class Observer(BaseObserver):
    TYPE = "kl_histogram"

    def __init__(self, config, qdesc):
        super().__init__(config, qdesc)
        self.bins = 2048

    def calc_minmax(self):
        import jax.numpy as jnp

        from sparsebit_tpu.quantization.observers.kl_device import (
            kl_thresholds_device,
        )

        if self.is_perchannel:
            data = jnp.asarray(
                self.data_cache.get_data_for_calibration(Granularity.CHANNELWISE)
            )
        else:
            data = jnp.asarray(
                self.data_cache.get_data_for_calibration(Granularity.LAYERWISE)
            ).reshape(1, -1)
        self.data_cache.reset()

        # whole search on device (jit fori_loop over candidate widths);
        # kl_thresholds (numpy) stays as the unit-test oracle
        th = kl_thresholds_device(data, self.qdesc.bit, self.bins)
        data_min = jnp.min(data, axis=1)
        max_val = th
        min_val = jnp.where(data_min < 0, -th, 0.0)
        if not self.is_perchannel:
            max_val, min_val = max_val[0], min_val[0]

        self.min_val = min_val
        self.max_val = max_val
        return self.min_val, self.max_val
